"""High-res stretch config (BASELINE.json config 5): spec wiring and the
seq-length kernel gate; the full-size forward runs on TPU only
(TSTM_ON_TPU=1)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_stm_tpu.config import cvt_highres_spec


def test_highres_spec_shapes():
    spec = cvt_highres_spec(384)
    assert spec.image_height == 384
    # stage grids: 384/4=96, /2=48, /2=24
    assert spec.stages[0].stride == 4
    spec512 = cvt_highres_spec(512)
    assert spec512.image_width == 512


def test_attention_auto_gate(monkeypatch):
    """'auto' routing on a TPU backend (measured table,
    Result/attention_sweep.json): whole-KV kernel above ~300k score
    entries, streaming flash beyond the VMEM-resident KV range, XLA for
    short sequences."""
    from transformer_stm_tpu.ops import attention as att

    calls = []

    def fake(name):
        def f(q, k, v):
            calls.append(name)
            return jnp.zeros_like(q)
        return f

    import importlib

    # NB `kernels.flash_attention` the attribute is shadowed by the
    # re-exported function; fetch the real module
    fa = importlib.import_module(
        "transformer_stm_tpu.kernels.flash_attention")
    real_flash, real_small = fa.flash_attention, fa.attention_small
    fa.flash_attention = fake("flash")
    fa.attention_small = fake("small")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    try:
        q = jnp.zeros((1, 2048, 1, 8))
        att._attention_core(q, q, q, impl="auto")   # 4M entries -> small
        assert calls == ["small"]
        q2 = jnp.zeros((1, 512, 1, 8))
        att._attention_core(q2, q2, q2, impl="auto")  # 262k -> xla
        assert calls == ["small"]
        q3 = jnp.zeros((1, 16384, 1, 8))
        att._attention_core(q3, q3, q3, impl="auto")  # KV > VMEM -> flash
        assert calls == ["small", "flash"]
    finally:
        fa.flash_attention = real_flash
        fa.attention_small = real_small


@pytest.mark.skipif(os.environ.get("TSTM_ON_TPU") != "1",
                    reason="full 384px forward needs the TPU")
def test_highres_forward_tpu():
    from transformer_stm_tpu.models import init_cvt, cvt_forward

    spec = cvt_highres_spec(384)
    params, state = init_cvt(jax.random.PRNGKey(0), spec)
    x = jnp.zeros((2, 384, 384, 1), jnp.bfloat16)
    p = jnp.zeros((2, 5), jnp.bfloat16)
    out, _ = cvt_forward(params, state, spec, x, p)
    assert out.shape == (2, 1)
    assert np.all(np.isfinite(np.asarray(out, np.float32)))
