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

Backward pass: custom_vjp with a fully-blocked Pallas kernel pair (dq and
dk/dv), FlashAttention-2 style — probabilities are rebuilt per block from
the forward's saved logsumexp, so the backward's score blocks also live
only in VMEM.  Two Pallas variants: the whole-side-resident pair (fastest
while K/V resp. Q/G fit scoped VMEM) and a fully-streaming pair (both
sequence sides blocked, output tiles accumulated across the innermost
grid dim) that has no length ceiling and carries the 16k-token 512px
config.  An einsum-scan fallback (`TSTM_FLASH_BWD=xla`) is kept for A/B
comparison.
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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                  s_real: int, bk: int, num_kv: int, scale: float,
                  lse_channel: int = -1):
    """One (batch-head, q-block, kv-block) program.

    q_ref: (1, Bq, Dh), k_ref/v_ref: (1, Bk, Dh), o_ref: (1, Bq, Dh)
    (leading 1 = the batch-head grid block).  The kv-block dim is the
    innermost grid dim; the running (acc, max, denom) state lives in VMEM
    scratch, which persists across the sequential grid sweep — so only
    (block, Dh) tiles are ever resident and there is no whole-K/V VMEM
    floor (the previous whole-side-resident form measured 16.01M/16M
    scoped VMEM at 16k tokens).  With lse_channel >= 0 the per-row
    logsumexp is written into that output channel (used by the backward
    pass; the channel lives in Dh's zero padding).
    """
    kv_i = pl.program_id(2)

    @pl.when(kv_i == 0)
    def _init():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
        m_ref[...] = jnp.full(m_ref.shape, NEG_INF, m_ref.dtype)
        l_ref[...] = jnp.zeros(l_ref.shape, l_ref.dtype)

    q = q_ref[0].astype(jnp.float32) * scale
    bq, dh = q.shape
    k_blk = k_ref[0].astype(jnp.float32)
    v_blk = v_ref[0].astype(jnp.float32)
    s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
    # mask out padded KV rows
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + kv_i * bk
    s = jnp.where(col < s_real, s, NEG_INF)
    m_prev = m_ref[:, 0:1]
    l_prev = l_ref[:, 0:1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc_ref[...] * alpha + jnp.dot(p, v_blk,
                                         preferred_element_type=jnp.float32)
    acc_ref[...] = acc
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kv_i == num_kv - 1)
    def _finalize():
        out = acc_ref[...] / l_ref[:, 0:1]
        if lse_channel >= 0:
            lse = m_ref[:, 0:1] + jnp.log(l_ref[:, 0:1])  # (bq, 1)
            ch = jax.lax.broadcasted_iota(jnp.int32, (bq, dh), 1)
            out = jnp.where(ch == lse_channel, lse, out)
        o_ref[0] = out.astype(o_ref.dtype)


def _flash_fwd_impl(q, k, v, with_lse: bool = False):
    """Blocked fwd.  with_lse=True additionally returns the per-row
    logsumexp (B, H, T) float32, computed in the same kernel pass (stored
    in a zero-padding channel; output dtype promoted to f32 so the lse
    keeps full precision)."""
    b, t, h, dh = q.shape
    s = k.shape[1]
    scale = 1.0 / math.sqrt(dh)

    # fold heads into batch; pad sequence + feature dims to tile boundaries
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, t, dh)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, s, dh)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, s, dh)

    bq = 256 if t >= 256 else _round_up(t, 8)
    bk = 512 if s >= 512 else _round_up(s, 8)
    t_pad = _round_up(t, bq)
    s_pad = _round_up(s, bk)
    dh_pad = _round_up(dh + 1 if with_lse else dh, 128)
    out_dtype = jnp.float32 if with_lse else q.dtype

    qf = jnp.pad(qf, ((0, 0), (0, t_pad - t), (0, dh_pad - dh)))
    kf = jnp.pad(kf, ((0, 0), (0, s_pad - s), (0, dh_pad - dh)))
    vf = jnp.pad(vf, ((0, 0), (0, s_pad - s), (0, dh_pad - dh)))

    grid = (b * h, t_pad // bq, s_pad // bk)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, s_real=s, bk=bk,
                          num_kv=s_pad // bk, scale=scale,
                          lse_channel=dh if with_lse else -1),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dh_pad), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dh_pad), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dh_pad), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dh_pad), lambda i, j, kk: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, dh_pad), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, dh_pad), jnp.float32),   # running output acc
            pltpu.VMEM((bq, 128), jnp.float32),      # running row max
            pltpu.VMEM((bq, 128), jnp.float32),      # running denominator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t * s * dh,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * t * s,
        ),
        interpret=_INTERPRET,
    )(qf, kf, vf)
    o = out[:, :t, :dh].reshape(b, h, t, dh).transpose(0, 2, 1, 3)
    if not with_lse:
        return o
    lse = out[:, :t, dh].reshape(b, h, t)
    return o.astype(q.dtype), lse


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
    o, lse = _flash_fwd_impl(q, k, v, with_lse=True)
    return o, (q, k, v, o, lse)


def _flash_bwd_dq_kernel(q_ref, g_ref, aux_ref, k_ref, v_ref, dq_ref, *,
                         s_real: int, bk: int, scale: float, c_lse: int,
                         c_delta: int):
    """dq for one (batch-head, q-block): streams K/V blocks through VMEM,
    rebuilding p from the saved logsumexp — no (T, S) score HBM traffic.

        p   = exp(q k^T * scale - lse)
        ds  = p * (g v^T - delta),  delta = rowsum(g * o)
        dq += ds k * scale
    """
    q = q_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    aux = aux_ref[0]
    bq, dh = q.shape
    ch = jax.lax.broadcasted_iota(jnp.int32, (bq, dh), 1)
    lse = jnp.sum(jnp.where(ch == c_lse, aux, 0.0), axis=1, keepdims=True)
    delta = jnp.sum(jnp.where(ch == c_delta, aux, 0.0), axis=1,
                    keepdims=True)
    s_pad = k_ref.shape[1]

    def body(i, dq_acc):
        k_blk = k_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + i * bk
        p = jnp.where(col < s_real, jnp.exp(s - lse), 0.0)
        dp = jnp.dot(g, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq_acc + jnp.dot(ds, k_blk,
                                preferred_element_type=jnp.float32) * scale

    dq = jax.lax.fori_loop(0, s_pad // bk, body,
                           jnp.zeros((bq, dh), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, g_ref, aux_ref, k_ref, v_ref, dk_ref,
                          dv_ref, *, bq: int, scale: float, c_lse: int,
                          c_delta: int):
    """dk/dv for one (batch-head, kv-block): streams Q/G blocks.

        dv += p^T g ;  dk += ds^T q * scale
    Padded q rows need no masking: their q/g/aux rows are zero, so
    p = exp(0-0) = 1 multiplies zero g/delta contributions.
    """
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    bk, dh = k.shape
    t_pad = q_ref.shape[1]

    def body(i, carry):
        dk_acc, dv_acc = carry
        q_i = q_ref[0, pl.ds(i * bq, bq), :].astype(jnp.float32)
        g_i = g_ref[0, pl.ds(i * bq, bq), :].astype(jnp.float32)
        aux_i = aux_ref[0, pl.ds(i * bq, bq), :]
        ch = jax.lax.broadcasted_iota(jnp.int32, (bq, dh), 1)
        lse = jnp.sum(jnp.where(ch == c_lse, aux_i, 0.0), axis=1,
                      keepdims=True)
        delta = jnp.sum(jnp.where(ch == c_delta, aux_i, 0.0), axis=1,
                        keepdims=True)
        s = jnp.dot(q_i, k.T, preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse)
        dv_acc = dv_acc + jnp.dot(p.T, g_i,
                                  preferred_element_type=jnp.float32)
        dp = jnp.dot(g_i, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_acc = dk_acc + jnp.dot(
            ds.T, q_i, preferred_element_type=jnp.float32) * scale
        return dk_acc, dv_acc

    dk, dv = jax.lax.fori_loop(
        0, t_pad // bq, body,
        (jnp.zeros((bk, dh), jnp.float32), jnp.zeros((bk, dh),
                                                     jnp.float32)))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pack_bwd_operands(res, g, bq: int, bk: int):
    """Shared backward operand prep: fold heads into batch, pad sequence
    dims to the block sizes and the feature dim to 128 lanes + 2 aux
    channels, and pack the forward's logsumexp together with
    delta = rowsum(g * o) into those aux channels (c_lse, c_delta) so the
    kernels read one aligned (block, 128-lane) ref instead of awkward
    (T,) vectors."""
    q, k, v, o, lse = res
    b, t, h, dh = q.shape
    s = k.shape[1]
    t_pad = _round_up(t, bq)
    s_pad = _round_up(s, bk)
    dh_pad = _round_up(dh + 2, 128)
    c_lse, c_delta = dh, dh + 1

    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], dh)
    qf = jnp.pad(fold(q), ((0, 0), (0, t_pad - t), (0, dh_pad - dh)))
    kf = jnp.pad(fold(k), ((0, 0), (0, s_pad - s), (0, dh_pad - dh)))
    vf = jnp.pad(fold(v), ((0, 0), (0, s_pad - s), (0, dh_pad - dh)))
    gf = jnp.pad(fold(g), ((0, 0), (0, t_pad - t), (0, dh_pad - dh)))

    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)                                   # (B, T, H)
    delta = delta.transpose(0, 2, 1).reshape(b * h, t)         # (BH, T)
    lse_f = lse.reshape(b * h, t)
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, 1, dh_pad), 2)
    aux = jnp.where(ch == c_lse, jnp.pad(lse_f, ((0, 0), (0, t_pad - t)))
                    [..., None], 0.0) + \
        jnp.where(ch == c_delta, jnp.pad(delta, ((0, 0), (0, t_pad - t)))
                  [..., None], 0.0)
    return qf, gf, aux.astype(jnp.float32), kf, vf


def _bwd_pallas(res, g):
    """Fully-blocked Pallas backward (dq kernel + dkv kernel pair).

    The logsumexp (saved by the forward) and delta = rowsum(g * o) ride in
    two zero-padding channels of a single f32 aux array, so each kernel
    reads one aligned (block, 128-lane) ref instead of awkward (T,)
    vectors.  Score blocks live only in VMEM — HBM sees O(T) not O(T*S).
    """
    q, k, v, o, lse = res
    b, t, h, dh = q.shape
    s = k.shape[1]
    scale = 1.0 / math.sqrt(dh)

    bq = 128 if t >= 128 else _round_up(t, 8)
    bk = 128 if s >= 128 else _round_up(s, 8)
    t_pad = _round_up(t, bq)
    s_pad = _round_up(s, bk)
    dh_pad = _round_up(dh + 2, 128)
    c_lse, c_delta = dh, dh + 1

    qf, gf, aux, kf, vf = _pack_bwd_operands(res, g, bq, bk)

    common = dict(interpret=_INTERPRET)
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, s_real=s, bk=bk,
                          scale=scale, c_lse=c_lse, c_delta=c_delta),
        grid=(b * h, t_pad // bq),
        in_specs=[
            pl.BlockSpec((1, bq, dh_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, dh_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, dh_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, dh_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, dh_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dh_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, dh_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * t * s * dh,
            bytes_accessed=(qf.size + gf.size + aux.size + kf.size
                            + vf.size) * 2,
            transcendentals=b * h * t * s,
        ),
        **common,
    )(qf, gf, aux, kf, vf)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, bq=bq, scale=scale,
                          c_lse=c_lse, c_delta=c_delta),
        grid=(b * h, s_pad // bk),
        in_specs=[
            pl.BlockSpec((1, t_pad, dh_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dh_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dh_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dh_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dh_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, dh_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dh_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, s_pad, dh_pad), jnp.float32),
            jax.ShapeDtypeStruct((b * h, s_pad, dh_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * b * h * t * s * dh,
            bytes_accessed=(qf.size + gf.size + aux.size + kf.size
                            + vf.size) * 2,
            transcendentals=b * h * t * s,
        ),
        **common,
    )(qf, gf, aux, kf, vf)

    unfold = lambda x, n: x[:, :n, :dh].reshape(b, h, n, dh).transpose(
        0, 2, 1, 3)
    return (unfold(dq, t).astype(q.dtype), unfold(dk, s).astype(k.dtype),
            unfold(dv, s).astype(v.dtype))


def _stream_bwd_dq_kernel(q_ref, g_ref, aux_ref, k_ref, v_ref, dq_ref, *,
                          s_real: int, bk: int, scale: float, c_lse: int,
                          c_delta: int):
    """Streaming dq: grid (batch-head, q-block, kv-block) with the
    kv-block dim innermost.  The dq output block's index map ignores that
    dim, so Mosaic keeps the SAME output tile resident across the kv
    sweep and this kernel accumulates into it — only (bq, dh) + (bk, dh)
    tiles ever live in VMEM, so there is no whole-K/V residency and no
    sequence-length ceiling (unlike _bwd_pallas's kernels).

        p   = exp(q k^T * scale - lse)
        ds  = p * (g v^T - delta),  delta = rowsum(g * o)
        dq += ds k * scale
    """
    kv_i = pl.program_id(2)

    @pl.when(kv_i == 0)
    def _zero():
        dq_ref[...] = jnp.zeros(dq_ref.shape, dq_ref.dtype)

    q = q_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    aux = aux_ref[0]
    bq, dh = q.shape
    ch = jax.lax.broadcasted_iota(jnp.int32, (bq, dh), 1)
    lse = jnp.sum(jnp.where(ch == c_lse, aux, 0.0), axis=1, keepdims=True)
    delta = jnp.sum(jnp.where(ch == c_delta, aux, 0.0), axis=1,
                    keepdims=True)

    k_blk = k_ref[0].astype(jnp.float32)
    v_blk = v_ref[0].astype(jnp.float32)
    s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, k_blk.shape[0]), 1) \
        + kv_i * bk
    p = jnp.where(col < s_real, jnp.exp(s - lse), 0.0)
    dp = jnp.dot(g, v_blk.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dq_ref[0] += (jnp.dot(ds, k_blk, preferred_element_type=jnp.float32)
                  * scale).astype(dq_ref.dtype)


def _stream_bwd_dkv_kernel(q_ref, g_ref, aux_ref, k_ref, v_ref, dk_ref,
                           dv_ref, *, scale: float, c_lse: int,
                           c_delta: int):
    """Streaming dk/dv: grid (batch-head, kv-block, q-block), q-block
    innermost, dk/dv tiles revisited and accumulated across the q sweep.

        dv += p^T g ;  dk += ds^T q * scale
    Padded q rows need no masking (q/g/aux zero there -> ds = 0, and
    p = 1 multiplies zero g); padded kv rows only write dk/dv rows that
    the caller slices off.
    """
    q_i = pl.program_id(2)

    @pl.when(q_i == 0)
    def _zero():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    q = q_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    aux = aux_ref[0]
    bq, dh = q.shape
    ch = jax.lax.broadcasted_iota(jnp.int32, (bq, dh), 1)
    lse = jnp.sum(jnp.where(ch == c_lse, aux, 0.0), axis=1, keepdims=True)
    delta = jnp.sum(jnp.where(ch == c_delta, aux, 0.0), axis=1,
                    keepdims=True)

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)
    dv_ref[0] += jnp.dot(p.T, g,
                         preferred_element_type=jnp.float32).astype(
        dv_ref.dtype)
    dp = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dk_ref[0] += (jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
                  * scale).astype(dk_ref.dtype)


def _bwd_pallas_streaming(res, g):
    """Fully-streaming Pallas backward: BOTH sequence sides blocked, so
    per-program VMEM is a handful of (512, 128) tiles regardless of T/S.
    This is the backward for the long-context configs (512px = 16,384
    tokens) where _bwd_pallas's whole-side residency blows the ~16 MiB
    scoped-VMEM budget; it replaces the _bwd_xla einsum scan there with
    MXU-blocked kernels and zero (T, S) HBM traffic."""
    q, k, v, o, lse = res
    b, t, h, dh = q.shape
    s = k.shape[1]
    scale = 1.0 / math.sqrt(dh)

    bq = 512 if t >= 512 else _round_up(t, 8)
    bk = 512 if s >= 512 else _round_up(s, 8)
    t_pad = _round_up(t, bq)
    s_pad = _round_up(s, bk)
    dh_pad = _round_up(dh + 2, 128)
    c_lse, c_delta = dh, dh + 1

    qf, gf, aux, kf, vf = _pack_bwd_operands(res, g, bq, bk)
    bh = b * h

    q_spec = pl.BlockSpec((1, bq, dh_pad), lambda i, j, kk: (i, j, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, bk, dh_pad), lambda i, j, kk: (i, kk, 0),
                           memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_stream_bwd_dq_kernel, s_real=s, bk=bk,
                          scale=scale, c_lse=c_lse, c_delta=c_delta),
        grid=(bh, t_pad // bq, s_pad // bk),
        in_specs=[q_spec, q_spec, q_spec, kv_spec, kv_spec],
        out_specs=pl.BlockSpec((1, bq, dh_pad), lambda i, j, kk: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, dh_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * t * s * dh,
            bytes_accessed=(qf.size * 3 + kf.size * 2) * 4,
            transcendentals=bh * t * s,
        ),
        interpret=_INTERPRET,
    )(qf, gf, aux, kf, vf)

    # dkv: kv-block is the revisited output dim, q-block streams innermost
    qs_spec = pl.BlockSpec((1, bq, dh_pad), lambda i, j, kk: (i, kk, 0),
                           memory_space=pltpu.VMEM)
    kvs_spec = pl.BlockSpec((1, bk, dh_pad), lambda i, j, kk: (i, j, 0),
                            memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_stream_bwd_dkv_kernel, scale=scale, c_lse=c_lse,
                          c_delta=c_delta),
        grid=(bh, s_pad // bk, t_pad // bq),
        in_specs=[qs_spec, qs_spec, qs_spec, kvs_spec, kvs_spec],
        out_specs=[kvs_spec, kvs_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_pad, dh_pad), jnp.float32),
            jax.ShapeDtypeStruct((bh, s_pad, dh_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * t * s * dh,
            bytes_accessed=(qf.size * 3 + kf.size * 2) * 4,
            transcendentals=bh * t * s,
        ),
        interpret=_INTERPRET,
    )(qf, gf, aux, kf, vf)

    unfold = lambda x, n: x[:, :n, :dh].reshape(b, h, n, dh).transpose(
        0, 2, 1, 3)
    return (unfold(dq, t).astype(q.dtype), unfold(dk, s).astype(k.dtype),
            unfold(dv, s).astype(v.dtype))


def _bwd_xla(res, g):
    """Blockwise backward: O(T * block) score memory instead of O(T * S).

    Uses the saved logsumexp to reconstruct probabilities per KV block and
    scans over blocks accumulating dq while emitting dk/dv shards —
    the flash-attention backward recurrence expressed in XLA (big fused
    matmuls per block; no (T, S) materialisation):
        D    = rowsum(g * o)
        p_j  = exp(q k_j^T * scale - lse)
        dv_j = p_j^T g
        ds_j = p_j * (g v_j^T - D)
        dq  += ds_j k_j * scale ;  dk_j = ds_j^T q * scale
    """
    q, k, v, o, lse = res
    b, t, h, dh = q.shape
    s = k.shape[1]
    scale = 1.0 / math.sqrt(dh)
    bk = min(512, _round_up(s, 128))
    s_pad = _round_up(s, bk)
    n_blocks = s_pad // bk

    qf = q.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    kp = jnp.pad(k.astype(jnp.float32), ((0, 0), (0, s_pad - s), (0, 0),
                                         (0, 0)))
    vp = jnp.pad(v.astype(jnp.float32), ((0, 0), (0, s_pad - s), (0, 0),
                                         (0, 0)))
    kb = kp.reshape(b, n_blocks, bk, h, dh).transpose(1, 0, 2, 3, 4)
    vb = vp.reshape(b, n_blocks, bk, h, dh).transpose(1, 0, 2, 3, 4)

    d_rows = jnp.sum(gf * o.astype(jnp.float32), axis=-1)  # (B, T, H)
    d_rows = d_rows.transpose(0, 2, 1)[..., None]          # (B, H, T, 1)
    lse_e = lse[..., None]                                 # (B, H, T, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (n_blocks, bk), 1) \
        + jnp.arange(n_blocks)[:, None] * bk               # global kv index

    def step(dq_acc, inp):
        k_j, v_j, col_j = inp
        sj = jnp.einsum("bthd,bshd->bhts", qf, k_j,
                        precision=jax.lax.Precision.HIGHEST) * scale
        pj = jnp.exp(sj - lse_e)
        pj = jnp.where(col_j[None, None, None, :] < s, pj, 0.0)
        dv_j = jnp.einsum("bhts,bthd->bshd", pj, gf,
                          precision=jax.lax.Precision.HIGHEST)
        dp_j = jnp.einsum("bthd,bshd->bhts", gf, v_j,
                          precision=jax.lax.Precision.HIGHEST)
        ds_j = pj * (dp_j - d_rows)
        dq_acc = dq_acc + jnp.einsum(
            "bhts,bshd->bthd", ds_j, k_j,
            precision=jax.lax.Precision.HIGHEST) * scale
        dk_j = jnp.einsum("bhts,bthd->bshd", ds_j, qf,
                          precision=jax.lax.Precision.HIGHEST) * scale
        return dq_acc, (dk_j, dv_j)

    dq0 = jnp.zeros((b, t, h, dh), jnp.float32)
    dq, (dk_b, dv_b) = jax.lax.scan(step, dq0, (kb, vb, col))
    dk = dk_b.transpose(1, 0, 2, 3, 4).reshape(b, s_pad, h, dh)[:, :s]
    dv = dv_b.transpose(1, 0, 2, 3, 4).reshape(b, s_pad, h, dh)[:, :s]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _bwd(res, g):
    """Backward dispatch.  TSTM_FLASH_BWD forces a path: 'pallas' (the
    whole-side-resident kernel pair), 'stream' (the fully-streaming
    pair), or 'xla' (the einsum scan, kept for A/B numerics and perf
    comparison).  Default ('auto'): the resident pair while it fits —
    it reads each side once per pass where streaming re-reads K/V per
    q-block — and the streaming pair beyond the budget.

    The resident pair keeps whole padded K/V per dq program and whole
    Q/G + aux per dkv program — that in-VMEM slicing stops fitting the
    ~16 MiB scoped-VMEM budget near 12k tokens (advisor r2: at the
    16k-token 512px config the dkv kernel needs 4+4+8.4 MiB of resident
    blocks before outputs/double-buffering).  Beyond the budget the
    fully-streaming pair takes over: both sequence sides blocked, output
    tiles accumulated across the innermost grid dim, no length ceiling.
    """
    forced = os.environ.get("TSTM_FLASH_BWD", "auto")
    if forced == "xla":
        return _bwd_xla(res, g)
    if forced == "stream":
        return _bwd_pallas_streaming(res, g)
    if forced == "pallas":
        return _bwd_pallas(res, g)
    if forced == "auto":
        q, k, _, _, _ = res
        t, s, dh = q.shape[1], k.shape[1], q.shape[3]
        dh_pad = _round_up(dh + 2, 128)
        # resident f32 bytes of the larger kernel of the pair (K+V for
        # dq, Q+G+aux for dkv), excluding the small blocked refs
        resident = max(2 * _round_up(s, 128), 3 * _round_up(t, 128)) \
            * dh_pad * 4
        if resident > 12 * 1024 * 1024:
            return _bwd_pallas_streaming(res, g)
        return _bwd_pallas(res, g)
    raise ValueError(f"TSTM_FLASH_BWD={forced!r}: expected "
                     "auto|pallas|stream|xla")


flash_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Small/medium-sequence kernel (the production shapes: 197-8k tokens)
# ---------------------------------------------------------------------------
#
# The streaming kernel above zero-pads head_dim 64 -> 128 lanes (2x VMEM
# traffic + MXU work for every model in this repo) and pays running-softmax
# bookkeeping that only matters when K/V exceed VMEM.  At the shapes the
# CvT/ViT actually run (T <= 1024, Dh = 64), whole K/V fit in VMEM, so this
# pair instead:
#   - keeps Dh native (block minor dim == array dim - no lane padding);
#   - computes the exact one-pass softmax over the full row (no running
#     max/denom rescale);
#   - packs `hp` batch-heads per grid program to amortise Mosaic's
#     per-program overhead (the measured killer below ~1M score entries);
#   - backward recomputes probabilities from saved lse (dkv) or from
#     scratch (dq - it holds full rows anyway), with lse carried in an
#     (BH, T, 8)-lane aux array instead of hiding it in Dh padding.


def _pick_hp(bh: int, per_head_bytes: int, budget: int = 8 << 20) -> int:
    for hp in (16, 8, 4, 2, 1):
        if bh % hp == 0 and hp * per_head_bytes <= budget:
            return hp
    return 1


def _pick_bq(t: int, s_pad: int, n_score_bufs: int,
             budget: int = 8 << 20) -> int:
    """Largest q-block whose f32 score-shaped intermediates fit the VMEM
    budget (t_pad is padded up to a multiple of bq, so any choice works)."""
    if t <= 512:
        return _round_up(t, 8)
    for bq in (512, 256, 128, 64, 32, 16, 8):
        if bq * s_pad * 4 * n_score_bufs <= budget:
            return bq
    return 8


def _small_fwd_kernel(q_ref, k_ref, v_ref, o_ref, aux_ref=None, *,
                      s_real: int, scale: float, hp: int, with_lse: bool):
    for h in range(hp):
        q = q_ref[h]
        k = k_ref[h]
        v = v_ref[h]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        bq = q.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < s_real, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32) / l
        o_ref[h] = o.astype(o_ref.dtype)
        if with_lse:
            lse = m + jnp.log(l)  # (bq, 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (bq, 8), 1)
            aux_ref[h] = jnp.where(lane == 0, lse, 0.0)


def _small_fwd_impl(q, k, v, with_lse: bool = False):
    b, t, h, dh = q.shape
    s = k.shape[1]
    scale = 1.0 / math.sqrt(dh)
    bh = b * h

    qf = q.transpose(0, 2, 1, 3).reshape(bh, t, dh)
    kf = k.transpose(0, 2, 1, 3).reshape(bh, s, dh)
    vf = v.transpose(0, 2, 1, 3).reshape(bh, s, dh)

    s_pad = _round_up(s, 8)
    # 4 MB block budget: at the 16k-token routing cap the full K/V windows
    # already cost ~8.4 MB double-buffered, and the 512px train config
    # measured 16.03M/16M scoped vmem with an 8 MB budget
    bq = _pick_bq(t, s_pad, n_score_bufs=4, budget=4 << 20)
    t_pad = _round_up(t, bq)
    it = qf.dtype.itemsize
    per_head = (2 * s_pad * dh * it + 3 * bq * dh * 4
                + 2 * bq * s_pad * 4)
    hp = _pick_hp(bh, per_head)

    qf = jnp.pad(qf, ((0, 0), (0, t_pad - t), (0, 0)))
    kf = jnp.pad(kf, ((0, 0), (0, s_pad - s), (0, 0)))
    vf = jnp.pad(vf, ((0, 0), (0, s_pad - s), (0, 0)))

    grid = (bh // hp, t_pad // bq)
    outs = [jax.ShapeDtypeStruct((bh, t_pad, dh), q.dtype)]
    out_specs = [pl.BlockSpec((hp, bq, dh), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)]
    if with_lse:
        outs.append(jax.ShapeDtypeStruct((bh, t_pad, 8), jnp.float32))
        out_specs.append(pl.BlockSpec((hp, bq, 8), lambda i, j: (i, j, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        functools.partial(_small_fwd_kernel, s_real=s, scale=scale, hp=hp,
                          with_lse=with_lse),
        grid=grid,
        in_specs=[
            pl.BlockSpec((hp, bq, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, s_pad, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, s_pad, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if with_lse else out_specs[0],
        out_shape=outs if with_lse else outs[0],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t * s * dh,
            bytes_accessed=(qf.size * 2 + kf.size + vf.size) * it,
            transcendentals=bh * t * s,
        ),
        interpret=_INTERPRET,
    )(qf, kf, vf)
    out = res[0] if with_lse else res
    o = out[:, :t].reshape(b, h, t, dh).transpose(0, 2, 1, 3)
    if not with_lse:
        return o
    return o, res[1]  # aux (BH, t_pad, 8): lse in lane 0


def _small_bwd_dq_kernel(q_ref, g_ref, o_ref, k_ref, v_ref, dq_ref, *,
                         s_real: int, scale: float, hp: int):
    """dq: holds full K/V rows, so softmax is recomputed exactly in one
    pass — no aux needed.  delta = rowsum(g * o) in-register."""
    for h in range(hp):
        q = q_ref[h]
        g = g_ref[h]
        o = o_ref[h]
        k = k_ref[h]
        v = v_ref[h]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < s_real, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)
        dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dq = jnp.dot(ds.astype(k.dtype), k,
                     preferred_element_type=jnp.float32) * scale
        dq_ref[h] = dq.astype(dq_ref.dtype)


def _small_bwd_dkv_kernel(k_ref, v_ref, q_ref, g_ref, aux_ref, dk_ref,
                          dv_ref, *, scale: float, hp: int):
    """dk/dv, computed in transposed score space (bk, t_pad): the saved
    lse/delta live in aux SUBLANES (aux (hp, 8, t_pad); an (t_pad, 8)
    lane layout would be tiled to 128 lanes in VMEM — a measured 16x
    blow-up that overflowed the 16 MB scoped-vmem budget at 9k tokens),
    and as (1, t_pad) rows they broadcast over the score block's
    sublanes with no in-kernel transpose anywhere.  Padded q rows are
    harmless: q=g=aux=0 there, so p = exp(0 - 0) = 1 multiplies zero
    g/delta contributions."""
    for h in range(hp):
        k = k_ref[h]
        v = v_ref[h]
        q = q_ref[h]
        g = g_ref[h]
        aux = aux_ref[h]                      # (8, t_pad) f32
        lse = aux[0:1, :]                     # (1, t_pad) row
        delta = aux[1:2, :]
        s_t = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)             * scale                           # (bk, t_pad)
        p_t = jnp.exp(s_t - lse)
        dv = jax.lax.dot_general(p_t.astype(g.dtype), g,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp_t = jax.lax.dot_general(v, g, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        ds_t = p_t * (dp_t - delta)
        dk = jax.lax.dot_general(ds_t.astype(q.dtype), q,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        dk_ref[h] = dk.astype(dk_ref.dtype)
        dv_ref[h] = dv.astype(dv_ref.dtype)


def _small_bwd_impl(res, grad):
    q, k, v, o, aux = res
    b, t, h, dh = q.shape
    s = k.shape[1]
    scale = 1.0 / math.sqrt(dh)
    bh = b * h

    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(bh, x.shape[1], dh)
    t_pad = aux.shape[1]
    s_pad = _round_up(s, 8)
    # tighter budget than the fwd: the bwd kernels also hold full-side
    # rows (q/g[/o]) double-buffered plus 3-4 live f32 score-shaped
    # buffers, and Mosaic's scoped-vmem stack accounting (16 MB) charges
    # all of it (measured: 8 MB budget -> 18.06M scoped at 9,216 tokens)
    bq = _pick_bq(t, s_pad, n_score_bufs=4, budget=3 << 20)
    while t_pad % bq:
        bq //= 2   # aux fixed t_pad (fwd's choice) must stay divisible
    # dkv kernel: score blocks are (t_pad, bk) with ~4 f32 live buffers
    bk = _pick_bq(s, t_pad, n_score_bufs=4, budget=3 << 20)
    skv_pad = _round_up(s, bk)

    qf = jnp.pad(fold(q), ((0, 0), (0, t_pad - t), (0, 0)))
    gf = jnp.pad(fold(grad), ((0, 0), (0, t_pad - t), (0, 0)))
    of = jnp.pad(fold(o), ((0, 0), (0, t_pad - t), (0, 0)))
    kf = jnp.pad(fold(k), ((0, 0), (0, s_pad - s), (0, 0)))
    vf = jnp.pad(fold(v), ((0, 0), (0, s_pad - s), (0, 0)))

    # delta = rowsum(g * o) joins the saved lse in aux lane 1 (cheap fused
    # elementwise+reduce in XLA; everything heavy stays in the kernels)
    delta = jnp.sum(gf.astype(jnp.float32) * of.astype(jnp.float32),
                    axis=-1, keepdims=True)                 # (BH, t_pad, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8), 2)
    aux = aux + jnp.where(lane == 1, delta, 0.0)
    # sublane-major for the dkv kernel: (BH, 8, t_pad) costs 8 real
    # sublanes in VMEM where (t_pad, 8) would tile to 128 lanes (16x)
    aux_t = aux.transpose(0, 2, 1)

    it = qf.dtype.itemsize
    hp_q = _pick_hp(bh, 2 * s_pad * dh * it + 4 * bq * dh * 4
                    + 3 * bq * s_pad * 4)
    dq = pl.pallas_call(
        functools.partial(_small_bwd_dq_kernel, s_real=s, scale=scale,
                          hp=hp_q),
        grid=(bh // hp_q, t_pad // bq),
        in_specs=[
            pl.BlockSpec((hp_q, bq, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp_q, bq, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp_q, bq, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp_q, s_pad, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp_q, s_pad, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hp_q, bq, dh), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, dh), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * t * s * dh,
            bytes_accessed=(3 * qf.size + 2 * kf.size) * it,
            transcendentals=bh * t * s,
        ),
        interpret=_INTERPRET,
    )(qf, gf, of, kf, vf)

    kq = jnp.pad(fold(k), ((0, 0), (0, skv_pad - s), (0, 0)))
    vq = jnp.pad(fold(v), ((0, 0), (0, skv_pad - s), (0, 0)))
    hp_k = _pick_hp(bh, 2 * bk * dh * it + 2 * t_pad * dh * it
                    + t_pad * 8 * 4 + 3 * t_pad * bk * 4)
    dk, dv = pl.pallas_call(
        functools.partial(_small_bwd_dkv_kernel, scale=scale, hp=hp_k),
        grid=(bh // hp_k, skv_pad // bk),
        in_specs=[
            pl.BlockSpec((hp_k, bk, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp_k, bk, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp_k, t_pad, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp_k, t_pad, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp_k, 8, t_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((hp_k, bk, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp_k, bk, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, skv_pad, dh), jnp.float32),
            jax.ShapeDtypeStruct((bh, skv_pad, dh), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * t * s * dh,
            bytes_accessed=(2 * qf.size + 4 * kq.size) * it,
            transcendentals=bh * t * s,
        ),
        interpret=_INTERPRET,
    )(kq, vq, qf, gf, aux_t)

    unfold = lambda x, n: x[:, :n].reshape(b, h, n, dh).transpose(0, 2, 1, 3)
    return (unfold(dq, t).astype(q.dtype), unfold(dk, s).astype(k.dtype),
            unfold(dv, s).astype(v.dtype))


@jax.custom_vjp
def attention_small(q, k, v):
    """Exact softmax(q k^T / sqrt(Dh)) v for short/medium sequences
    (whole K/V per program; native head_dim; batch-head packing).
    q: (B, T, H, Dh), k/v: (B, S, H, Dh)."""
    return _small_fwd_impl(q, k, v)


def _small_fwd(q, k, v):
    o, aux = _small_fwd_impl(q, k, v, with_lse=True)
    return o, (q, k, v, o, aux)


attention_small.defvjp(_small_fwd, _small_bwd_impl)
