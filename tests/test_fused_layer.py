"""Fused inference-layer kernels (kernels/fused_layer.py) vs the composable
XLA ViT path — Pallas interpret mode on CPU."""

import os

os.environ["TSTM_PALLAS_INTERPRET"] = "1"  # before the kernels import

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_stm_tpu.config import VIT_PRESETS
from transformer_stm_tpu.models import init_vit, vit_forward


def _small_spec(depth=2):
    return dataclasses.replace(VIT_PRESETS["ViT-S/16"], depth=depth,
                               image_size=64)


@pytest.mark.parametrize("impl", ["fused", "fused2"])
@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 1e-4),
                                        (jnp.bfloat16, 5e-2)])
def test_fused_matches_xla(dtype, atol, impl):
    spec = _small_spec()
    params = init_vit(jax.random.PRNGKey(0), spec)
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
    img = jax.random.uniform(jax.random.PRNGKey(1), (4, 64, 64, 3), dtype)
    ref = vit_forward(params, spec, img, train=False, impl="xla",
                      mlp_impl="xla").astype(jnp.float32)
    got = vit_forward(params, spec, img, train=False,
                      impl=impl).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=atol)


def test_fused_odd_batch_and_tokens():
    # B=3 exercises the bi=1 fallback; 64px/16 -> 17 tokens pads to 24
    spec = _small_spec(depth=1)
    params = init_vit(jax.random.PRNGKey(2), spec)
    img = jax.random.uniform(jax.random.PRNGKey(3), (3, 64, 64, 3),
                             jnp.float32)
    ref = vit_forward(params, spec, img, train=False, impl="xla",
                      mlp_impl="xla")
    got = vit_forward(params, spec, img, train=False, impl="fused")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_fused_vit_ti_width():
    # E=192 (not a 128-multiple): blocks take the lane-dim == array-dim
    # Mosaic path
    spec = dataclasses.replace(VIT_PRESETS["ViT-Ti/16"], depth=1,
                               image_size=64)
    params = init_vit(jax.random.PRNGKey(4), spec)
    img = jax.random.uniform(jax.random.PRNGKey(5), (4, 64, 64, 3),
                             jnp.float32)
    ref = vit_forward(params, spec, img, train=False, impl="xla",
                      mlp_impl="xla")
    got = vit_forward(params, spec, img, train=False, impl="fused")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_fused_int8_close_to_float():
    """impl='fused2_int8' (all six projections on the MXU int8 path,
    per-channel weight + per-token dynamic activation scales) tracks the
    float XLA path to ~2% of the logit scale and stays rank-correlated —
    the opt-in serving mode's numeric contract."""
    spec = _small_spec()
    params = init_vit(jax.random.PRNGKey(0), spec)
    img = jax.random.uniform(jax.random.PRNGKey(1), (4, 64, 64, 3),
                             jnp.float32)
    ref = np.asarray(vit_forward(params, spec, img, train=False,
                                 impl="xla", mlp_impl="xla"))
    got = np.asarray(vit_forward(params, spec, img, train=False,
                                 impl="fused2_int8"))
    scale = max(np.max(np.abs(ref)), 1e-9)
    assert np.max(np.abs(got - ref)) / scale < 0.03
    assert np.corrcoef(ref.ravel(), got.ravel())[0, 1] > 0.999


def test_fused_int8_padded_rows_and_odd_batch():
    """bi=1 fallback (B=3) + padded token rows (17 -> 24): the dynamic
    row quantization must stay finite on all-zero padded rows."""
    spec = _small_spec(depth=1)
    params = init_vit(jax.random.PRNGKey(2), spec)
    img = jax.random.uniform(jax.random.PRNGKey(3), (3, 64, 64, 3),
                             jnp.float32)
    ref = np.asarray(vit_forward(params, spec, img, train=False,
                                 impl="xla", mlp_impl="xla"))
    got = np.asarray(vit_forward(params, spec, img, train=False,
                                 impl="fused2_int8"))
    assert np.all(np.isfinite(got))
    scale = max(np.max(np.abs(ref)), 1e-9)
    assert np.max(np.abs(got - ref)) / scale < 0.03


def test_fused_rejects_train():
    spec = _small_spec(depth=1)
    params = init_vit(jax.random.PRNGKey(0), spec)
    img = jnp.zeros((1, 64, 64, 3))
    with pytest.raises(ValueError):
        vit_forward(params, spec, img, train=True, impl="fused",
                    rng=jax.random.PRNGKey(0))


def test_fused_layer_vmem_guard():
    """The bi/bn choosers refuse (FusedLayerVMEMError) instead of handing
    Mosaic a kernel that overflows scoped VMEM even at the minimum block,
    and fused_layer_fits() lets vit_forward's auto routing fall back to
    the composable path for such configs (advisor r3)."""
    from transformer_stm_tpu.kernels.fused_layer import (
        FusedLayerVMEMError, attn_layer_infer, fused_layer_fits,
        ln_mlp_infer)

    # ViT-S @224 (t_pad=200, E=384, 6 heads) fits — the headline config
    assert fused_layer_fits(200, 384, 6, 64, 1536, 2)
    assert fused_layer_fits(200, 384, 6, 64, 1536, 2, merged=True)
    # 512px ViT-S (t_pad 1032): the two-kernel attn estimate is marginal
    # (17.6M < 19M admit) but the merged kernel's extra MLP residents
    # overflow — merged must NOT route there
    assert not fused_layer_fits(1032, 384, 6, 64, 1536, 2, merged=True)
    # and very long token counts overflow both paths on the score buffers
    assert not fused_layer_fits(2048, 384, 6, 64, 1536, 2)
    assert not fused_layer_fits(2048, 384, 6, 64, 1536, 2, merged=True)

    # attn kernel refuses at an oversized token count
    e, h, dh = 384, 6, 64
    t_pad = 2048
    x = jnp.zeros((1 * t_pad, e), jnp.bfloat16)
    norm1 = {"gamma": jnp.ones((e,)), "beta": jnp.zeros((e,))}
    attn = {
        "query": {"kernel": jnp.zeros((e, h, dh)),
                  "bias": jnp.zeros((h, dh))},
        "key": {"kernel": jnp.zeros((e, h, dh)),
                "bias": jnp.zeros((h, dh))},
        "value": {"kernel": jnp.zeros((e, h, dh)),
                  "bias": jnp.zeros((h, dh))},
        "out": {"kernel": jnp.zeros((h, dh, e)), "bias": jnp.zeros((e,))},
    }
    with pytest.raises(FusedLayerVMEMError):
        attn_layer_infer(x, norm1, attn, t_pad=t_pad, t_real=t_pad)

    # MLP kernel refuses when the resident weights alone overflow
    big = 65536
    mlp_p = {"fc1": {"kernel": jnp.zeros((e, big), jnp.bfloat16),
                     "bias": jnp.zeros((big,))},
             "fc2": {"kernel": jnp.zeros((big, e), jnp.bfloat16),
                     "bias": jnp.zeros((e,))}}
    with pytest.raises(FusedLayerVMEMError):
        ln_mlp_infer(jnp.zeros((64, e), jnp.bfloat16),
                     norm1, mlp_p)


def test_vit_auto_falls_back_for_large_tokens(monkeypatch):
    """auto routing consults fused_layer_fits and picks the composable
    path for configs the fused kernels cannot compile (no crash)."""
    from transformer_stm_tpu.models import vit as vit_mod

    calls = []
    real_fits = vit_mod.vit_forward.__globals__  # noqa: F841

    import transformer_stm_tpu.kernels.fused_layer as fl
    monkeypatch.setattr(fl, "fused_layer_fits",
                        lambda *a, **k: (calls.append(a), False)[1])
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    spec = _small_spec(depth=1)
    params = init_vit(jax.random.PRNGKey(0), spec)
    img = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    # with fits->False the fused path must not be entered: patch the fused
    # forward to raise if called
    monkeypatch.setattr(vit_mod, "_vit_forward_fused",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("fused path taken")))
    out = vit_forward(params, spec, img, train=False, impl="auto")
    assert out.shape[0] == 1
    assert calls, "fused_layer_fits was not consulted"
