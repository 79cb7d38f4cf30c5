"""Pallas TPU kernels for the hot compute paths.

The reference outsources every hot op to TF's bundled CUDA kernels
(SURVEY.md §2.2); this framework owns them:

- ``flash_attention``: blockwise-softmax attention, O(seq) memory
  (covers the CvT stages at 65-1,024 tokens and the 384/512px stretch
  configs at 4k+ tokens).
- ``fused_mlp``: Dense -> exact GELU -> Dense fused into one kernel
  (one HBM round-trip instead of three).
- ``preprocess``: fused resize/grayscale/normalize for the on-device
  input pipeline.

Every kernel has an XLA reference implementation in ops/ it is tested
against at 1e-3 (tests/test_kernels.py).
"""

from .flash_attention import flash_attention  # noqa: F401
from .fused_layer import (attn_layer_infer, ln_mlp_infer,  # noqa: F401
                          vit_layer_infer)
from .fused_mlp import fused_mlp  # noqa: F401
