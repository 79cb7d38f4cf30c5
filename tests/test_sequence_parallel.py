"""Sequence-parallel attention (all-gather and ring variants) vs the
single-device reference on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_stm_tpu.config import MeshConfig
from transformer_stm_tpu.parallel.mesh import build_mesh
from transformer_stm_tpu.parallel.sequence import ring_attention, sp_attention

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 (virtual) devices")


def _reference(q, k, v):
    dh = q.shape[-1]
    s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32), k
                   .astype(jnp.float32)) / np.sqrt(dh)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


@needs_8
@pytest.mark.parametrize("fn", [sp_attention, ring_attention])
def test_sp_matches_reference(fn):
    mesh = build_mesh(MeshConfig(data=8, model=1))
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    # T = 128 tokens sharded 16 per device
    q = jax.random.normal(kq, (2, 128, 2, 16), jnp.float32)
    k = jax.random.normal(kk, (2, 128, 2, 16), jnp.float32)
    v = jax.random.normal(kv, (2, 128, 2, 16), jnp.float32)
    ref = _reference(q, k, v)
    got = jax.jit(lambda q, k, v: fn(q, k, v, mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@needs_8
def test_ring_grad_flows():
    mesh = build_mesh(MeshConfig(data=8, model=1))
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(kq, (1, 64, 1, 8), jnp.float32)
    k = jax.random.normal(kk, (1, 64, 1, 8), jnp.float32)
    v = jax.random.normal(kv, (1, 64, 1, 8), jnp.float32)

    def loss_sp(q, k, v):
        return jnp.sum(jnp.square(sp_attention(q, k, v, mesh)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(_reference(q, k, v)))

    g1 = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
