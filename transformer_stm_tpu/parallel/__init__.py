"""Parallelism layer: device mesh + sharding rules + sharded train step.

The reference is single-process single-GPU with no distributed backend
(SURVEY.md §2.3-2.4).  The TPU-native replacement is annotation-driven SPMD:
pick a Mesh, annotate array shardings, and let XLA insert the collectives
over ICI — no hand-written NCCL/MPI.

- DP: batch sharded over the 'data' axis; gradient/batch-stat reductions
  become XLA allreduces automatically under jit (GSPMD).
- TP: attention heads and MLP hidden sharded over the 'model' axis by
  pytree-path rules — an annotation, not an algorithm.
Tests run on a virtual 8-device CPU mesh (tests/conftest.py).
"""

from .mesh import build_mesh, local_device_count  # noqa: F401
from .sharding import (  # noqa: F401
    batch_sharding, cvt_param_sharding, replicate, shard_params,
)
from .trainer import make_sharded_train_step, ShardedTrainer  # noqa: F401
