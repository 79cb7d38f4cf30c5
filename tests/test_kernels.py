"""Pallas kernels vs their XLA reference implementations.

On CPU the kernels run through the Pallas interpreter
(TSTM_PALLAS_INTERPRET=1, set below before the kernels import); on TPU the
same tests exercise the Mosaic-compiled path.  Parity bound: 1e-3 gate, and
much tighter in practice.
"""

import os

os.environ["TSTM_PALLAS_INTERPRET"] = (
    "0" if os.environ.get("TSTM_ON_TPU") == "1" else "1")

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_stm_tpu.kernels.flash_attention import (
    flash_attention, _reference_attention)
from transformer_stm_tpu.kernels.fused_mlp import fused_mlp
from transformer_stm_tpu.ops.blocks import init_mlp, mlp
from transformer_stm_tpu.ops.common import dense, gelu


# CvT stage shapes (65 / 256 / 1024 tokens, 1-4 heads, head_dim 64) plus a
# ragged case and a 4k-token stretch shape.
SHAPES = [
    (2, 65, 4, 64),    # stage 3 + cls
    (2, 256, 2, 64),   # stage 2
    (1, 1024, 1, 64),  # stage 1
    (2, 100, 3, 32),   # ragged, non-aligned
    (1, 197, 6, 64),   # ViT-S @224
]


@pytest.mark.parametrize("shape", SHAPES)
def test_flash_attention_matches_xla(shape):
    b, t, h, dh = shape
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(t), 3)
    q = jax.random.normal(k1, (b, t, h, dh), jnp.float32)
    k = jax.random.normal(k2, (b, t, h, dh), jnp.float32)
    v = jax.random.normal(k3, (b, t, h, dh), jnp.float32)
    _, ref = _reference_attention(q, k, v)
    got = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_flash_attention_cross_attention_lengths():
    """T != S (conv QKV projection with stride would shrink KV)."""
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (2, 64, 2, 32), jnp.float32)
    k = jax.random.normal(kk, (2, 16, 2, 32), jnp.float32)
    v = jax.random.normal(kv, (2, 16, 2, 32), jnp.float32)
    _, ref = _reference_attention(q, k, v)
    got = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_flash_attention_grad_matches_xla():
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(kq, (1, 40, 2, 16), jnp.float32)
    k = jax.random.normal(kk, (1, 40, 2, 16), jnp.float32)
    v = jax.random.normal(kv, (1, 40, 2, 16), jnp.float32)

    def f_flash(q, k, v):
        return jnp.sum(jnp.square(flash_attention(q, k, v)))

    def f_ref(q, k, v):
        return jnp.sum(jnp.square(_reference_attention(q, k, v)[1]))

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_flash_attention_bf16():
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(kq, (2, 128, 2, 64), jnp.bfloat16)
    k = jax.random.normal(kk, (2, 128, 2, 64), jnp.bfloat16)
    v = jax.random.normal(kv, (2, 128, 2, 64), jnp.bfloat16)
    _, ref = _reference_attention(q, k, v)
    got = flash_attention(q, k, v)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("n,d,hd", [(65, 64, 256), (256, 128, 512),
                                    (100, 48, 96), (1024, 256, 1024)])
def test_fused_mlp_matches_xla(n, d, hd):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(n), 3)
    x = jax.random.normal(k1, (2, n, d), jnp.float32)
    w1 = jax.random.normal(k2, (d, hd), jnp.float32) * 0.05
    b1 = jax.random.normal(k3, (hd,), jnp.float32) * 0.05
    w2 = jax.random.normal(k2, (hd, d), jnp.float32) * 0.05
    b2 = jax.random.normal(k3, (d,), jnp.float32) * 0.05
    ref = dense({"kernel": w2, "bias": b2},
                gelu(dense({"kernel": w1, "bias": b1}, x)))
    got = fused_mlp(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_mlp_op_pallas_impl_consistent():
    """ops.blocks.mlp(impl='pallas') == impl='xla' in inference."""
    params = init_mlp(jax.random.PRNGKey(0), 32, 128)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 20, 32), jnp.float32)
    ref = mlp(params, x, train=False, impl="xla")
    got = mlp(params, x, train=False, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_bwd_pallas_matches_xla_scan():
    """The fully-blocked Pallas backward (dq + dkv kernel pair) must match
    the einsum-scan backward it replaced, at production-ish shapes
    (CvT stage 1: 1,024 tokens; stage 3: 65 tokens + cls)."""
    from transformer_stm_tpu.kernels.flash_attention import (
        _bwd_pallas, _bwd_xla, _flash_fwd_impl)

    for (b, t, h, dh) in [(2, 256, 1, 64), (1, 65, 4, 64)]:
        kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(t), 4)
        q = jax.random.normal(kq, (b, t, h, dh), jnp.float32)
        k = jax.random.normal(kk, (b, t, h, dh), jnp.float32)
        v = jax.random.normal(kv, (b, t, h, dh), jnp.float32)
        g = jax.random.normal(kg, (b, t, h, dh), jnp.float32)
        o, lse = _flash_fwd_impl(q, k, v, with_lse=True)
        res = (q, k, v, o, lse)
        for a, b_ in zip(_bwd_pallas(res, g), _bwd_xla(res, g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-4, rtol=2e-4)


def test_flash_attention_grad_under_vmap():
    """The multi-target trainer takes grads through a vmapped flash
    attention (per-target params stacked); the batching rule must keep
    per-slot numerics identical to the unbatched call."""
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(kq, (3, 2, 40, 2, 16), jnp.float32)
    k = jax.random.normal(kk, (3, 2, 40, 2, 16), jnp.float32)
    v = jax.random.normal(kv, (3, 2, 40, 2, 16), jnp.float32)

    def f(q, k, v):
        return jnp.sum(jnp.square(flash_attention(q, k, v)))

    gv = jax.vmap(jax.grad(f, argnums=(0, 1, 2)))(q, k, v)
    for i in range(3):
        gs = jax.grad(f, argnums=(0, 1, 2))(q[i], k[i], v[i])
        for a, b in zip(gv, gs):
            np.testing.assert_allclose(np.asarray(a[i]), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)


def test_fused_mlp_train_grads_no_dropout():
    """rate=0: the fused train kernel's custom_vjp must match jax.grad of
    the plain Dense->GELU->Dense to float tolerance."""
    from transformer_stm_tpu.kernels.fused_mlp import (
        _gelu_exact, make_fused_mlp_train)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 40, 32)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((32, 128)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((128,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((128, 32)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((32,)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((2, 40, 32)), jnp.float32)
    seed = jnp.zeros((2,), jnp.int32)

    f = make_fused_mlp_train(0.0)

    def loss_fused(x, w1, b1, w2, b2):
        return jnp.sum(f(x, w1, b1, w2, b2, seed) * g)

    def loss_ref(x, w1, b1, w2, b2):
        h = _gelu_exact(x @ w1 + b1)
        return jnp.sum((h @ w2 + b2) * g)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)


def test_fused_mlp_train_grads_with_dropout_fallback():
    """rate>0 (CPU fallback path): the hand-derived backward must equal
    jax.grad of the identical masked forward — validates the gradient
    formulas the TPU kernel implements with in-kernel masks."""
    from transformer_stm_tpu.kernels.fused_mlp import (
        _fallback_masks, _gelu_exact, make_fused_mlp_train)

    rate = 0.3
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((30, 16)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((16, 64)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((64,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((64, 16)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((16,)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((30, 16)), jnp.float32)
    seed = jnp.asarray([7, 9], jnp.int32)

    f = make_fused_mlp_train(rate, interpret=True)

    def loss_fused(x, w1, b1, w2, b2):
        return jnp.sum(f(x, w1, b1, w2, b2, seed) * g)

    m1, m2 = _fallback_masks(seed, (30, 64), (30, 16), rate)

    def loss_ref(x, w1, b1, w2, b2):
        h = _gelu_exact(x @ w1 + b1) * m1
        return jnp.sum(((h @ w2 + b2) * m2) * g)

    # same masks -> same forward
    np.testing.assert_allclose(
        float(loss_fused(x, w1, b1, w2, b2)),
        float(loss_ref(x, w1, b1, w2, b2)), rtol=1e-5)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)


# ---------------------------------------------------------------------------
# attention_small (native-Dh, whole-KV-in-VMEM kernel for production shapes)
# ---------------------------------------------------------------------------

from transformer_stm_tpu.kernels.flash_attention import attention_small


@pytest.mark.parametrize("shape", SHAPES)
def test_attention_small_matches_xla(shape):
    b, t, h, dh = shape
    rng = np.random.default_rng(t)
    q, k, v = (jnp.asarray(rng.normal(size=(b, t, h, dh)), jnp.float32)
               for _ in range(3))
    _, ref = _reference_attention(q, k, v)
    out = attention_small(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_attention_small_cross_lengths():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 197, 4, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 50, 4, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 50, 4, 64)), jnp.float32)
    _, ref = _reference_attention(q, k, v)
    out = attention_small(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


@pytest.mark.parametrize("shape", [(1, 197, 6, 64), (2, 65, 4, 64),
                                   (1, 1024, 1, 64), (2, 100, 3, 32)])
def test_attention_small_grad_matches_xla(shape):
    b, t, h, dh = shape
    rng = np.random.default_rng(t + 7)
    q, k, v = (jnp.asarray(rng.normal(size=(b, t, h, dh)), jnp.float32)
               for _ in range(3))

    def loss_small(q, k, v):
        return jnp.sum(attention_small(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v)[1] ** 2)

    gs = jax.grad(loss_small, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-3, rtol=1e-2)


def test_attention_small_bf16():
    rng = np.random.default_rng(3)
    q, k, v = (jnp.asarray(rng.normal(size=(2, 197, 6, 64)), jnp.bfloat16)
               for _ in range(3))
    _, ref = _reference_attention(q, k, v)
    out = attention_small(q, k, v)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


def test_attention_small_grad_under_vmap():
    """The multi-target trainer vmaps the whole model over stacked params;
    the kernel must differentiate correctly under that transform."""
    rng = np.random.default_rng(9)
    q, k, v = (jnp.asarray(rng.normal(size=(3, 1, 64, 2, 64)), jnp.float32)
               for _ in range(3))

    def loss(q, k, v):
        return jnp.sum(attention_small(q, k, v) ** 2)

    gs = jax.vmap(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    for i in range(3):
        gr = jax.grad(lambda a, b, c: jnp.sum(
            _reference_attention(a, b, c)[1] ** 2), argnums=(0, 1, 2))(
                q[i], k[i], v[i])
        for a, b_ in zip((gs[0][i], gs[1][i], gs[2][i]), gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-3, rtol=1e-2)


def test_fused_mlp_train_grads_under_vmap():
    """The multi-target trainer stacks params on a vmapped axis; the fused
    train MLP must differentiate correctly under that transform (production
    mlp_impl='pallas').  N is chosen so each slot spans MULTIPLE 256-row
    token blocks: with per-block weight-grad slots the result must be exact
    regardless of vmap's prepended grid axis (the old accumulate-with-
    program_id(0)-init design was wrong for every slot in this regime —
    advisor r2 high finding)."""
    key = jax.random.PRNGKey(0)
    T, B, N, D = 3, 4, 200, 32   # B*N = 800 rows -> 4 blocks of 256
    params1 = init_mlp(key, D, 4 * D)
    stack = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * T), t)
    paramsT = stack(params1)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(T, B, N, D)),
                    jnp.float32)

    def f(p, xx):
        return jnp.sum(mlp(p, xx, dropout_rate=0.0, train=True,
                           rng=jax.random.PRNGKey(1), impl="pallas") ** 2)

    g = jax.vmap(jax.grad(f))(paramsT, x)
    for i in range(T):
        ref_i = jax.grad(lambda p, xx: jnp.sum(
            mlp(p, xx, dropout_rate=0.0, train=True,
                rng=jax.random.PRNGKey(1), impl="xla") ** 2))(params1, x[i])
        gi = jax.tree_util.tree_map(lambda l: l[i], g)
        for a, b in zip(jax.tree_util.tree_leaves(gi),
                        jax.tree_util.tree_leaves(ref_i)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-3, rtol=1e-2)


def test_fused_mlp_train_grads_multiblock():
    """Unbatched multi-block (n > 256) weight grads: every token block must
    contribute exactly once (per-block grad slots summed outside the
    kernel)."""
    from transformer_stm_tpu.kernels.fused_mlp import (
        _gelu_exact, make_fused_mlp_train)

    rng = np.random.default_rng(3)
    n, d, hd = 700, 48, 96       # 3 blocks of 256 (padded)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, hd)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((hd,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((hd, d)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    seed = jnp.zeros((2,), jnp.int32)
    f = make_fused_mlp_train(0.0)

    def loss_fused(x, w1, b1, w2, b2):
        return jnp.sum(f(x, w1, b1, w2, b2, seed) * g)

    def loss_ref(x, w1, b1, w2, b2):
        h = _gelu_exact(x @ w1 + b1)
        return jnp.sum((h @ w2 + b2) * g)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_mlp_train_dropout_requires_rng():
    """train=True + dropout>0 + rng=None must raise (not silently reuse a
    constant all-zero dropout seed) on both impls."""
    params = init_mlp(jax.random.PRNGKey(0), 16, 64)
    x = jnp.ones((2, 8, 16), jnp.float32)
    for impl in ("pallas", "xla"):
        with pytest.raises(ValueError):
            mlp(params, x, dropout_rate=0.1, train=True, rng=None,
                impl=impl)


def test_flash_bwd_dispatches_to_streaming_beyond_vmem_budget(monkeypatch):
    """At 16k+ tokens (the 512px streaming config) the whole-side-resident
    Pallas backward cannot fit its K/V / Q/G blocks in scoped VMEM; _bwd
    must dispatch to the fully-streaming Pallas pair there and keep the
    resident pair below the budget."""
    import importlib
    fa = importlib.import_module(
        "transformer_stm_tpu.kernels.flash_attention")

    calls = []
    monkeypatch.setattr(fa, "_bwd_pallas_streaming",
                        lambda res, g: calls.append("stream"))
    monkeypatch.setattr(fa, "_bwd_pallas",
                        lambda res, g: calls.append("pallas"))

    def res_for(t, s, dh=64):
        q = jnp.zeros((1, t, 1, dh), jnp.bfloat16)
        k = jnp.zeros((1, s, 1, dh), jnp.bfloat16)
        return (q, k, None, None, None)

    fa._bwd(res_for(16384, 16384), None)
    fa._bwd(res_for(1024, 1024), None)
    fa._bwd(res_for(1024, 16384), None)   # long-KV side alone must trip it
    assert calls == ["stream", "pallas", "stream"]


def test_flash_bwd_streaming_matches_xla_scan():
    """The fully-streaming backward (both sides blocked, grid-accumulated
    output tiles) must match the einsum-scan backward — including at a
    rectangular T != S shape and a non-128-multiple length, where the
    block masking/padding paths all fire."""
    from transformer_stm_tpu.kernels.flash_attention import (
        _bwd_pallas_streaming, _bwd_xla, _flash_fwd_impl)

    # (1, 1088, 640, 1, 64): bq=bk=512 -> grids (1,3,2)/(1,2,3) — real
    # multi-block accumulation plus kv-padding masking (640 -> 1024)
    for (b, t, s, h, dh) in [(2, 256, 256, 1, 64), (1, 65, 65, 4, 64),
                             (1, 1088, 640, 1, 64)]:
        kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(t + s), 4)
        q = jax.random.normal(kq, (b, t, h, dh), jnp.float32)
        k = jax.random.normal(kk, (b, s, h, dh), jnp.float32)
        v = jax.random.normal(kv, (b, s, h, dh), jnp.float32)
        g = jax.random.normal(kg, (b, t, h, dh), jnp.float32)
        o, lse = _flash_fwd_impl(q, k, v, with_lse=True)
        res = (q, k, v, o, lse)
        for a, b_ in zip(_bwd_pallas_streaming(res, g), _bwd_xla(res, g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-4, rtol=2e-4)


def test_train_dims_env_block_override(monkeypatch):
    """TSTM_MLP_TRAIN_BN forces the fused train-MLP token block (the
    multi-target trainer sets it for wide vmaps — scoped-vmem overflow
    at T>=6 otherwise, Result/multi_width_probe.json)."""
    import numpy as np

    from transformer_stm_tpu.kernels.fused_mlp import _train_dims

    x = np.zeros((4096, 256), np.float32)
    w1 = np.zeros((256, 1024), np.float32)
    w2 = np.zeros((1024, 256), np.float32)
    bn_default = _train_dims(x, w1, w2)[4]
    assert bn_default == 512   # the 8 MB-budget choice at these shapes
    monkeypatch.setenv("TSTM_MLP_TRAIN_BN", "256")
    assert _train_dims(x, w1, w2)[4] == 256
    monkeypatch.setenv("TSTM_MLP_TRAIN_BN", "100")   # rounds up to 8-mult
    assert _train_dims(x, w1, w2)[4] == 104
    # the explicit argument (threaded from MultiTargetTrainer) beats the
    # env knob — trainers no longer mutate process env (advisor r3)
    assert _train_dims(x, w1, w2, bn_override=128)[4] == 128
    monkeypatch.delenv("TSTM_MLP_TRAIN_BN")
    assert _train_dims(x, w1, w2, bn_override=256)[4] == 256


def test_multi_trainer_bn_scales_with_width():
    """The multi-target trainer scales the fused-MLP token block with the
    vmapped width (scoped-vmem overflow grows with T — 16.39/19.37/17.89
    MB at T=6/8/10 with bn=512, Result/multi_width_probe.json)."""
    from transformer_stm_tpu.train.multi import _mlp_train_bn_for_width

    assert _mlp_train_bn_for_width(1) is None
    assert _mlp_train_bn_for_width(5) is None
    assert _mlp_train_bn_for_width(6) == 256
    assert _mlp_train_bn_for_width(7) == 256
    assert _mlp_train_bn_for_width(8) == 128
    assert _mlp_train_bn_for_width(12) == 128


def test_multi_trainer_bn_env_override(monkeypatch):
    """TSTM_BENCH-style operator override: the env knob beats the width
    table at every T (for widths the table hasn't been probed at)."""
    from transformer_stm_tpu.train.multi import _mlp_train_bn_for_width

    monkeypatch.setenv("TSTM_MLP_TRAIN_BN", "128")
    assert _mlp_train_bn_for_width(1) == 128
    assert _mlp_train_bn_for_width(7) == 128
    assert _mlp_train_bn_for_width(12) == 128
