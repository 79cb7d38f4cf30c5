"""Pallas TPU flash attention (non-causal, bidirectional).

Blockwise-softmax attention with O(seq) memory: the (T, S) score matrix is
never materialised in HBM.  Replaces the reference's
keras.layers.MultiHeadAttention inner product (models/CvT(Par).py:185) on
the TPU compute path.

Layout: q (B, T, H, Dh), k/v (B, S, H, Dh) -> out (B, T, H, Dh).
The grid runs over (batch*heads, q-blocks); each program streams K/V for its
batch-head through VMEM in Bk-sized blocks with a running (max, denom)
rescale.  Head dims are zero-padded to the 128-lane boundary (zero feature
columns do not change q.k dot products); padded KV rows are masked to -inf.

Backward pass: custom_vjp with an einsum-based recompute (exact same math);
a fully-blocked Pallas backward is a planned optimisation — at the
reference's sequence lengths (<= 1,024 tokens, SURVEY.md §2.3) the recompute
already fits comfortably in HBM.
"""

from __future__ import annotations

import functools
import math

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# CPU tests exercise the kernels via the Pallas interpreter
# (TSTM_PALLAS_INTERPRET=1); on TPU they compile through Mosaic.
_INTERPRET = os.environ.get("TSTM_PALLAS_INTERPRET", "0") == "1"

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, s_real: int, bk: int,
                  scale: float):
    """One (batch-head, q-block) program.

    q_ref: (1, Bq, Dh), k_ref/v_ref: (1, S_pad, Dh), o_ref: (1, Bq, Dh)
    (leading 1 = the batch-head grid block).
    """
    q = q_ref[0].astype(jnp.float32) * scale
    bq, dh = q.shape
    s_pad = k_ref.shape[1]
    num_kv = s_pad // bk

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        # mask out padded KV rows
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + i * bk
        s = jnp.where(col < s_real, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v_blk,
                                    preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, dh), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_kv, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _flash_fwd_impl(q, k, v):
    b, t, h, dh = q.shape
    s = k.shape[1]
    scale = 1.0 / math.sqrt(dh)

    # fold heads into batch; pad sequence + feature dims to tile boundaries
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, t, dh)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, s, dh)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, s, dh)

    bq = 128 if t >= 128 else _round_up(t, 8)
    bk = 128 if s >= 128 else _round_up(s, 8)
    t_pad = _round_up(t, bq)
    s_pad = _round_up(s, bk)
    dh_pad = _round_up(dh, 128)

    qf = jnp.pad(qf, ((0, 0), (0, t_pad - t), (0, dh_pad - dh)))
    kf = jnp.pad(kf, ((0, 0), (0, s_pad - s), (0, dh_pad - dh)))
    vf = jnp.pad(vf, ((0, 0), (0, s_pad - s), (0, dh_pad - dh)))

    grid = (b * h, t_pad // bq)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, s_real=s, bk=bk, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dh_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, dh_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, dh_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dh_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, dh_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t * s * dh,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * t * s,
        ),
        interpret=_INTERPRET,
    )(
        qf.reshape(b * h, t_pad, dh_pad),
        kf.reshape(b * h, s_pad, dh_pad),
        vf.reshape(b * h, s_pad, dh_pad),
    )
    out = out[:, :t, :dh].reshape(b, h, t, dh).transpose(0, 2, 1, 3)
    return out


def _reference_attention(q, k, v):
    """XLA einsum attention — the exact math flash re-orders."""
    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))
    p = jax.nn.softmax(s, axis=-1)
    return p, jnp.einsum("bhts,bshd->bthd", p,
                         v.astype(jnp.float32)).astype(q.dtype)


@jax.custom_vjp
def flash_attention(q, k, v):
    """softmax(q k^T / sqrt(Dh)) v.  q: (B, T, H, Dh), k/v: (B, S, H, Dh)."""
    return _flash_fwd_impl(q, k, v)


def _fwd(q, k, v):
    return _flash_fwd_impl(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    p, _ = _reference_attention(q, k, v)  # (B, H, T, S) float32
    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dp = jnp.einsum("bthd,bshd->bhts", gf, vf)
    dv = jnp.einsum("bhts,bthd->bshd", p, gf)
    # softmax backward: ds = p * (dp - sum(dp * p))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhts,bshd->bthd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhts,bthd->bshd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(_fwd, _bwd)
