"""Parallelism layer: device mesh + sharding rules + sharded train step.

The reference is single-process single-GPU with no distributed backend
(SURVEY.md §2.3-2.4).  The TPU-native replacement is annotation-driven SPMD:
pick a Mesh, annotate array shardings, and let XLA insert the collectives
over ICI — no hand-written NCCL/MPI.

- DP: batch sharded over the 'data' axis; gradient/batch-stat reductions
  become XLA allreduces automatically under jit (GSPMD).
- TP: attention heads and MLP hidden sharded over the 'model' axis by
  pytree-path rules — an annotation, not an algorithm.
- SP: sequence-sharded attention (all-gather and ring variants) in
  parallel/sequence.py for the 384/512px stretch configs.

Deliberately out of scope (SURVEY.md §2.3 accounting): pipeline
parallelism (no model here exceeds one chip's HBM — a <=3M-param CvT /
<=87M-param ViT-B needs no stage partitioning), expert parallelism (no
MoE anywhere in the capability set), and Ulysses-style all-to-all head
swaps (ring/all-gather SP already covers the longest configured
sequences).  Revisit only if the model family outgrows these bounds.

Tests run on a virtual 8-device CPU mesh (tests/conftest.py).
"""

from .mesh import build_mesh, local_device_count  # noqa: F401
from .sharding import (  # noqa: F401
    batch_sharding, cvt_param_sharding, replicate, shard_params,
)
from .trainer import make_sharded_train_step, ShardedTrainer  # noqa: F401
