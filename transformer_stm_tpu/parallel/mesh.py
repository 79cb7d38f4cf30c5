"""Device mesh construction (SURVEY.md §2.4).

Axes: 'data' (DP batch sharding, gradient allreduce over ICI) and 'model'
(TP: heads / MLP hidden).  Multi-host initialisation goes through
jax.distributed.initialize before mesh construction; on a single host the
mesh spans jax.devices() (including the virtual CPU devices used in tests
via --xla_force_host_platform_device_count).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh

from ..config import MeshConfig


def local_device_count() -> int:
    return len(jax.devices())


def build_mesh(cfg: Optional[MeshConfig] = None,
               n_devices: Optional[int] = None) -> Mesh:
    """cfg.data == -1 means 'all remaining devices'."""
    cfg = cfg or MeshConfig()
    n = n_devices if n_devices is not None else len(jax.devices())
    model = max(1, cfg.model)
    data = cfg.data if cfg.data > 0 else n // model
    if data * model > n:
        raise ValueError(
            f"mesh {data}x{model} needs {data * model} devices, have {n}")
    # Auto axis types = classic GSPMD: XLA propagates shardings and inserts
    # collectives (JAX 0.9 defaults to Explicit, which demands manual
    # out_shardings on every ambiguous contraction).
    auto = jax.sharding.AxisType.Auto
    return jax.make_mesh((data, model), ("data", "model"),
                         devices=jax.devices()[: data * model],
                         axis_types=(auto, auto))


def maybe_distributed_init(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host entry (no-op on one host): wires up the JAX distributed
    runtime so jax.devices() spans the slice and collectives ride ICI/DCN."""
    if coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
