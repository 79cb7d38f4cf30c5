"""Optimizer and LR schedule.

Adam with Keras-default hyperparameters (beta1 0.9, beta2 0.999, eps 1e-7 —
the reference compiles with keras.optimizers.Adam(1e-3),
models/CvT(Par).py:464) plus an AdamW variant for the ViT fine-tune config
(BASELINE.json config 3).  The schedule multiplies lr by 0.8 every 50 epochs
(reference lr_scheduler, models/CvT(Par).py:357-360).

Written as pure pytree transforms so the update jits and shards unchanged
under pjit: the optimizer state inherits the params' sharding.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    step: jnp.ndarray  # int32 scalar
    mu: Any  # first-moment pytree
    nu: Any  # second-moment pytree


def adam_init(params) -> AdamState:
    zeros = lambda p: jnp.zeros_like(p)
    return AdamState(step=jnp.zeros((), jnp.int32),
                     mu=jax.tree_util.tree_map(zeros, params),
                     nu=jax.tree_util.tree_map(zeros, params))


def adam_update(grads, opt_state: AdamState, params, lr,
                b1: float = 0.9, b2: float = 0.999, eps: float = 1e-7,
                weight_decay: float = 0.0):
    """Returns (new_params, new_opt_state).  weight_decay > 0 gives AdamW
    (decoupled decay, applied with the lr)."""
    step = opt_state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - jnp.power(b1, t)
    bc2 = 1.0 - jnp.power(b2, t)

    def upd(p, g, m, v):
        g = g.astype(jnp.float32)
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * jnp.square(g)
        update = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        if weight_decay > 0.0 and p.ndim >= 2:  # decay kernels, not biases
            update = update + weight_decay * p.astype(jnp.float32)
        return (p - lr * update).astype(p.dtype), m, v

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(opt_state.mu)
    flat_v = treedef.flatten_up_to(opt_state.nu)
    out = [upd(p, g, m, v) for p, g, m, v in
           zip(flat_p, flat_g, flat_m, flat_v)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, AdamState(step=step, mu=new_m, nu=new_v)


def lr_at_epoch(base_lr: float, epoch: int, decay: float = 0.8,
                every: int = 50) -> float:
    """Reference schedule: lr *= decay each time epoch hits a multiple of
    `every` (cumulative — models/CvT(Par).py:357-360).  Epochs are 0-based
    here; Keras calls the scheduler with 0-based epochs too."""
    return base_lr * (decay ** (epoch // every))
