"""Params-only FFN baseline (reference: models/FFN(OnlyPar).py:55-67).

Dense(256, relu) -> Dense(256, relu) -> Dense(num_classes, linear) on the
5-dim process-parameter vector.  (The reference misnames its builder
``create_cvt_model``; it is a plain MLP.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import dense, init_dense


def init_ffn(key, proc_dim: int = 5, hidden: int = 256, num_classes: int = 1,
             dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "fc1": init_dense(k1, proc_dim, hidden, dtype=dtype),
        "fc2": init_dense(k2, hidden, hidden, dtype=dtype),
        "final": init_dense(k3, hidden, num_classes, dtype=dtype),
    }


def ffn_forward(params, proc):
    """proc: (B, proc_dim) -> (B, num_classes)."""
    x = jax.nn.relu(dense(params["fc1"], proc))
    x = jax.nn.relu(dense(params["fc2"], x))
    return dense(params["final"], x)
