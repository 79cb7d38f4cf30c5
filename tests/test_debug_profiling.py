"""Debug mode (NaN guards) and profiling utilities."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_stm_tpu.debug import check_finite, debug_mode, guard
from transformer_stm_tpu.tools.profiling import StepTimer


def test_check_finite_passes_and_raises():
    check_finite({"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}})
    with pytest.raises(FloatingPointError, match="bad"):
        check_finite({"a": {"bad": jnp.asarray([1.0, np.nan])}})


def test_guard_raises_on_nan_loss():
    def bad_step(x):
        return x, {"loss": jnp.asarray(np.nan), "mae": jnp.asarray(1.0)}

    wrapped = guard(bad_step)
    with pytest.raises(FloatingPointError, match="loss"):
        wrapped(jnp.ones(2))

    def good_step(x):
        return x, {"loss": jnp.asarray(0.5)}

    out, m = guard(good_step)(jnp.ones(2))
    assert float(m["loss"]) == 0.5


def test_debug_mode_restores_flags():
    before = jax.config.jax_debug_nans
    with debug_mode():
        assert jax.config.jax_debug_nans
    assert jax.config.jax_debug_nans == before


def test_debug_mode_traps_nan():
    with debug_mode():
        with pytest.raises(Exception):  # jax raises FloatingPointError
            jax.jit(lambda x: x / 0.0 * 0.0)(jnp.asarray(1.0)).block_until_ready()


def test_step_timer_summary():
    t = StepTimer(warmup=1)
    import time

    for _ in range(4):
        with t:
            time.sleep(0.01)
    s = t.summary(items_per_step=100)
    assert s["steps"] == 3
    assert 0.005 < s["mean_s"] < 0.2
    assert s["items_per_sec"] > 0
