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


def test_fused_rejects_train():
    spec = _small_spec(depth=1)
    params = init_vit(jax.random.PRNGKey(0), spec)
    img = jnp.zeros((1, 64, 64, 3))
    with pytest.raises(ValueError):
        vit_forward(params, spec, img, train=True, impl="fused",
                    rng=jax.random.PRNGKey(0))
