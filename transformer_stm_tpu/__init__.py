"""transformer-stm_tpu: a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
capabilities of POCHUN-CHEN/Transformer-STM.

The reference is a TensorFlow/Keras research repo that trains a CvT
(Convolutional vision Transformer) regression model on SLS melt-pool layer
images to predict magnetic properties (reference: models/CvT(Par).py).  This
package is a brand-new framework with the same capabilities, designed
TPU-first:

- ``ops/``      functional neural-net ops with reference-parity semantics
                (including the reference's quirks, documented per-op).
- ``kernels/``  Pallas TPU kernels for the hot paths (flash attention,
                fused GELU-MLP, fused image preprocessing).
- ``models/``   spec-driven model builders: CvT (image / image+params),
                params-only FFN, and plain ViT-T/S/B classifiers.
- ``data/``     label/parameter tables (stdlib xlsx IO), deterministic
                splits, and the image pipeline (host decode + on-device
                resize/gray/normalize).
- ``train/``    optimizers, LR schedules, jitted train loop, checkpointing,
                metrics/records writers.
- ``parallel/`` device mesh construction and DP/TP sharding rules.
- ``tools/``    Grad-CAM, plots, HBM monitor, data-prep utilities.

Parameters are plain pytrees (nested dicts of jnp arrays); every op exposes
``init(key, ...) -> params`` and ``apply(params, x, ...)``.  Everything in the
compute path is jit-compatible with static shapes.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
