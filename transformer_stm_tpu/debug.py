"""Debug / numerical-safety mode (SURVEY.md §5.2).

The reference has no sanitizers (no native code, no NaN handling).  The
TPU-native equivalents here:

- ``debug_mode()``: context manager enabling jax_debug_nans (traps the op
  producing the first NaN/Inf) + jax_disable_most_optimizations-free
  deterministic settings for reproducing numeric bugs.
- ``check_finite(tree, name)``: host-side assertion over a pytree.
- ``guard(fn)``: wraps a step function; on NaN loss raises with the
  offending step's metrics instead of silently diverging.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable

import jax


@contextlib.contextmanager
def debug_mode(nans: bool = True, infs: bool = True):
    old_nans = jax.config.jax_debug_nans
    old_infs = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
        jax.config.update("jax_debug_infs", old_infs)


def check_finite(tree: Any, name: str = "tree") -> None:
    """Host-side: raise if any leaf holds NaN/Inf."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            raise FloatingPointError(
                f"non-finite values in {name} at {jax.tree_util.keystr(path)}")


def guard(step_fn: Callable, loss_key: str = "loss") -> Callable:
    """Wrap step(...) -> (..., metrics): raise on non-finite loss."""
    import numpy as np

    def wrapped(*args, **kwargs):
        out = step_fn(*args, **kwargs)
        metrics = out[-1]
        loss = float(np.asarray(metrics[loss_key]))
        if not np.isfinite(loss):
            raise FloatingPointError(
                f"non-finite {loss_key}={loss}; metrics="
                f"{ {k: float(np.asarray(v)) for k, v in metrics.items()} }")
        return out

    return wrapped
