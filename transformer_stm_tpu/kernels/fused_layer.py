"""Fused transformer-layer inference kernels (ViT family).

Round-2 measurement: ViT-S/16 @224 batched inference is HBM-bound end to
end — per layer the XLA path moves ~900 MB (LN round-trips, the (B, H, T,
T) f32 score tensor, QKV/out projections, MLP residuals) against a ~150 MB
fused floor, on a chip with ~370 GB/s effective HBM.  These two kernels
fuse each transformer layer into two pallas_calls:

  attn_layer_infer:  y = x + MHA(LN1(x))          (per-head QKV in VMEM)
  ln_mlp_infer:      y = x + MLP(LN2(x))          (4x hidden in VMEM)

so per layer HBM sees exactly: read x, write y, twice (~157 MB at ViT-S
B=256) — everything else (normalised activations, q/k/v, scores, softmax,
per-head outputs, the 4x MLP hidden) stays in VMEM.

Token layout: the caller folds (B, T, E) -> (B * t_pad, E) once, with T
zero-padded to the 8-sublane boundary, and keeps that layout across all
layers (no per-layer reshapes).  Padded rows carry junk (LN of a zero row
is beta), but they are harmless: as attention keys/values they are masked
(col >= t_real -> -inf), as queries/MLP rows they only produce junk in
padded output rows, which the caller slices off after the last layer.

The attention grid runs over blocks of `bi` images; each program holds the
whole (t_pad, t_pad) score matrix per image in VMEM — these kernels are
for the short-sequence regime (T <= ~1k; ViT @224 = 197 tokens) where
whole-row softmax fits comfortably.  Head projections use per-head
(E, Dh) matmul stacks (native Dh = 64 lanes, the attention_small layout
proven on this hardware).

Inference only (no vjp): the training path keeps the existing composable
kernels.  Replaces keras MultiHeadAttention + the Dense MLP at inference
(reference models/CvT(Par).py:185,253-258) for the plain-ViT benchmark
configs (BASELINE.json configs 1-3).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _gelu_exact, _round_up

_INTERPRET = os.environ.get("TSTM_PALLAS_INTERPRET", "0") == "1"

NEG_INF = -1e30


def _layer_norm_rows(x, gamma, beta, eps: float):
    """Row-wise LN of a (R, E) f32 block; gamma/beta are (1, E)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * gamma + beta


def _attn_layer_kernel(x_ref, g1_ref, be1_ref, wq_ref, bq_ref, wk_ref,
                       bk_ref, wv_ref, bv_ref, wo_ref, bo_ref, o_ref,
                       q_scr, k_scr, v_scr, oh_scr, *, bi: int,
                       t_pad: int, t_real: int, heads: int, dh: int,
                       eps: float):
    """One block of `bi` images: y = x + out_proj(attention(LN1(x))).

    All four projections run as single full-width matmuls ((R, E) @
    (E, H*Dh) / (H*Dh, E) — full 128-lane MXU tiles); the attention core
    runs per head on a static Python loop with the `bi` images batched
    through one dot_general (batch dim = image), so there is no
    per-image scalar loop.  wq/bq arrive pre-scaled by 1/sqrt(Dh)."""
    x = x_ref[:].astype(jnp.float32)                       # (R, E)
    xn = _layer_norm_rows(x, g1_ref[:], be1_ref[:], eps).astype(x_ref.dtype)
    q_scr[:] = (jnp.dot(xn, wq_ref[:].astype(xn.dtype),
                        preferred_element_type=jnp.float32)
                + bq_ref[:]).astype(q_scr.dtype)
    k_scr[:] = (jnp.dot(xn, wk_ref[:].astype(xn.dtype),
                        preferred_element_type=jnp.float32)
                + bk_ref[:]).astype(k_scr.dtype)
    v_scr[:] = (jnp.dot(xn, wv_ref[:].astype(xn.dtype),
                        preferred_element_type=jnp.float32)
                + bv_ref[:]).astype(v_scr.dtype)

    for h in range(heads):
        lanes = slice(h * dh, (h + 1) * dh)
        qh = q_scr[:, lanes].reshape(bi, t_pad, dh)
        kh = k_scr[:, lanes].reshape(bi, t_pad, dh)
        vh = v_scr[:, lanes].reshape(bi, t_pad, dh)
        # (bi, t_pad, t_pad) scores, image-batched in one dot_general
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < t_real, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(vh.dtype), vh,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) / l
        oh_scr[:, lanes] = o.reshape(bi * t_pad, dh).astype(oh_scr.dtype)

    # residual + bias + one full-width out projection
    y = x + bo_ref[:] + jnp.dot(oh_scr[:], wo_ref[:].astype(oh_scr.dtype),
                                preferred_element_type=jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


class FusedLayerVMEMError(ValueError):
    """Raised when a fused inference-layer kernel cannot fit the scoped
    VMEM budget at any image-block size (including bi=1).  Callers should
    route to the composable impl='small' path instead of compiling a
    kernel Mosaic will reject (advisor r3)."""


def _attn_vmem_est(bi: int, t_pad: int, e: int, hd: int, it: int) -> int:
    """Scoped-VMEM estimate for _attn_layer_kernel at image-block bi
    (calibrated ~1.26x over the compiler's accounting, see chooser)."""
    rr = bi * t_pad
    return (4 * rr * e * it          # x in + y out, double-buffered
            + 4 * rr * hd * it       # q/k/v/o scratch
            + rr * e * 4             # xn f32 temp
            + 4 * e * hd * it        # packed weights
            + 2 * bi * t_pad * t_pad * 4)   # live score buffers


def _norm_mlp_chunks(r: int, mlp_chunks: int) -> int:
    """Largest chunk count <= mlp_chunks whose row chunks divide r and
    stay 8-sublane aligned.  The VMEM admit MUST use this normalised
    value: the requested count can collapse (down to 1), doubling the
    live hidden buffer versus a naively-admitted estimate (review r4)."""
    while mlp_chunks > 1 and (r % mlp_chunks or (r // mlp_chunks) % 8):
        mlp_chunks -= 1
    return mlp_chunks


def _layer_vmem_est(bi: int, t_pad: int, e: int, hd: int, hidden: int,
                    it: int, mlp_chunks: int) -> int:
    """Estimate for the merged _layer_kernel (attn est + MLP terms).
    mlp_chunks is normalised to what the kernel will actually use."""
    rr = bi * t_pad
    mlp_chunks = _norm_mlp_chunks(rr, mlp_chunks)
    return (_attn_vmem_est(bi, t_pad, e, hd, it)
            + 2 * e * hidden * it          # MLP weights
            + rr * e * 4                   # z f32
            + 2 * max(rr // mlp_chunks, 8) * hidden * 4)   # hidden chunk


_VMEM_ADMIT = 19 << 20   # estimated ~= 15M actual (1.26x calibration)

# Raised Mosaic scoped-VMEM cap for the two-kernel (v1) path.  Measured
# 2026-08-18: after a terminal-side libtpu update the compiler's scoped
# accounting of _attn_layer_kernel grew with TOTAL row count, not just the
# per-program block (16.05M at B=192 -> 18.44M at B=384/768 against the
# 16M default), so kernels that fit in round 3 started failing AOT compile.
# The observed accounting caps ~18.5M; 32M gives 1.7x headroom while
# staying a small fraction of the v5e core's 128M VMEM.  The bi/bn
# choosers still admit against the 19M-estimate budget above, so block
# choices (and the measured fused2 headline path, which keeps the default
# limit) are unchanged.
_V1_VMEM_LIMIT = int(os.environ.get("TSTM_FUSED_V1_VMEM_LIMIT", 32 << 20))


def _v2_compiler_params():
    """Optional raised scoped-VMEM cap for the merged (v2) kernel.  UNSET
    by default: the measured 11.3k img/s headline path compiles with the
    16M compiler default and must stay byte-identical.  Set
    TSTM_FUSED_V2_VMEM_LIMIT (bytes) to experiment with image blocks
    beyond the chooser's admit (scripts/probe_fused_bi.py)."""
    v = os.environ.get("TSTM_FUSED_V2_VMEM_LIMIT")
    if not v:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=int(v))


def fused_layer_fits(t_pad: int, e: int, heads: int, dh: int, hidden: int,
                     itemsize: int = 2, merged: bool = False) -> bool:
    """True iff the fused inference-layer kernels fit scoped VMEM at the
    minimum image block (bi=1) for these model dims.  vit_forward's auto
    routing gates on this so large-token or wider-than-ViT-B configs fall
    back to the composable streaming path instead of failing to compile."""
    hd = heads * dh
    if merged:
        return _layer_vmem_est(1, t_pad, e, hd, hidden, itemsize,
                               2) <= _VMEM_ADMIT
    # two-kernel path: attn kernel at bi=1 plus the MLP kernel at its
    # smallest row block (8)
    return (_attn_vmem_est(1, t_pad, e, hd, itemsize) <= _VMEM_ADMIT
            and _ln_mlp_vmem_est(8, e, hidden, itemsize) <= _VMEM_ADMIT)


def _ln_mlp_vmem_est(bn: int, e: int, hd: int, it: int) -> int:
    """Estimate for _ln_mlp_kernel at row-block bn: x/y blocks (double-
    buffered), whole weights resident, f32 hidden intermediate."""
    return (4 * bn * e * it + 2 * e * hd * it + bn * e * 4
            + 2 * bn * hd * 4)


def attn_layer_infer(x, norm1, attn, *, t_pad: int, t_real: int,
                     eps: float = 1e-6, bi: int = None):
    """x: (B * t_pad, E) folded tokens -> same shape, y = x + MHA(LN1(x)).

    norm1: {gamma, beta} (E,); attn: init_mha params (query/key/value
    kernels (E, H, Dh) + bias (H, Dh), out kernel (H, Dh, E) + bias (E,)).
    """
    n, e = x.shape
    b = n // t_pad
    h, dh = attn["query"]["bias"].shape
    hd = h * dh
    scale = 1.0 / math.sqrt(dh)

    if bi is None:
        # Mosaic scoped-vmem estimate per program (calibrated on hardware:
        # the estimate runs ~1.26x over the compiler's accounting — 16.0M
        # estimated / 12.6M actual at ViT-S bi=8, 31.9M / 25.27M at ViT-B
        # bi=8 which overflowed the 16M limit), so admit up to 19M
        # estimated ~= 15M actual
        it = x.dtype.itemsize
        bi = None
        for cand in (8, 4, 2, 1):
            if b % cand:
                continue
            if _attn_vmem_est(cand, t_pad, e, hd, it) <= _VMEM_ADMIT:
                bi = cand
                break
        if bi is None:
            # even bi=1 overflows scoped VMEM — refuse rather than hand
            # Mosaic a kernel it will reject (advisor r3); callers check
            # fused_layer_fits() and route to impl='small' instead
            raise FusedLayerVMEMError(
                f"attn_layer_infer: t_pad={t_pad} E={e} HD={hd} overflows "
                f"scoped VMEM even at bi=1 "
                f"({_attn_vmem_est(1, t_pad, e, hd, it)} est > "
                f"{_VMEM_ADMIT}); use the composable impl='small' path")
    r = bi * t_pad

    def packed(p, mul=1.0):
        # (E, H, Dh) -> (E, H*Dh) single-matmul layout
        return p["kernel"].reshape(e, hd) * mul, \
            (p["bias"].astype(jnp.float32).reshape(1, hd) * mul)

    wq, bq = packed(attn["query"], scale)      # q pre-scaled by 1/sqrt(Dh)
    wk, bk = packed(attn["key"])
    wv, bv = packed(attn["value"])
    wo = attn["out"]["kernel"].reshape(hd, e)
    bo = attn["out"]["bias"].astype(jnp.float32).reshape(1, e)
    g1 = norm1["gamma"].astype(jnp.float32).reshape(1, e)
    be1 = norm1["beta"].astype(jnp.float32).reshape(1, e)

    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        functools.partial(_attn_layer_kernel, bi=bi, t_pad=t_pad,
                          t_real=t_real, heads=h, dh=dh, eps=eps),
        grid=(b // bi,),
        in_specs=[pl.BlockSpec((r, e), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + [const] * 10,
        out_specs=pl.BlockSpec((r, e), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, e), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((r, hd), x.dtype),        # q (all heads)
            pltpu.VMEM((r, hd), x.dtype),        # k
            pltpu.VMEM((r, hd), x.dtype),        # v
            pltpu.VMEM((r, hd), x.dtype),        # attention out (all heads)
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * e * (4 * h * dh) + 4 * n * t_pad * h * dh,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=n * t_pad * h,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_V1_VMEM_LIMIT),
        interpret=_INTERPRET,
    )(x, g1, be1, wq, bq, wk, bk, wv, bv, wo, bo)
    return y


def _layer_kernel(x_ref, g1_ref, be1_ref, wq_ref, bq_ref, wk_ref,
                  bk_ref, wv_ref, bv_ref, wo_ref, bo_ref, g2_ref, be2_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                  q_scr, k_scr, v_scr, oh_scr, *, bi: int, t_pad: int,
                  t_real: int, heads: int, dh: int, eps: float,
                  mlp_chunks: int):
    """Whole transformer layer in one program:
    y = z + MLP(LN2(z)),  z = x + MHA(LN1(x)).
    Same attention structure as _attn_layer_kernel; the MLP runs in
    `mlp_chunks` row chunks so the f32 4x hidden stays small."""
    x = x_ref[:].astype(jnp.float32)                       # (R, E)
    xn = _layer_norm_rows(x, g1_ref[:], be1_ref[:], eps).astype(x_ref.dtype)
    q_scr[:] = (jnp.dot(xn, wq_ref[:].astype(xn.dtype),
                        preferred_element_type=jnp.float32)
                + bq_ref[:]).astype(q_scr.dtype)
    k_scr[:] = (jnp.dot(xn, wk_ref[:].astype(xn.dtype),
                        preferred_element_type=jnp.float32)
                + bk_ref[:]).astype(k_scr.dtype)
    v_scr[:] = (jnp.dot(xn, wv_ref[:].astype(xn.dtype),
                        preferred_element_type=jnp.float32)
                + bv_ref[:]).astype(v_scr.dtype)

    for h in range(heads):
        lanes = slice(h * dh, (h + 1) * dh)
        qh = q_scr[:, lanes].reshape(bi, t_pad, dh)
        kh = k_scr[:, lanes].reshape(bi, t_pad, dh)
        vh = v_scr[:, lanes].reshape(bi, t_pad, dh)
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < t_real, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(vh.dtype), vh,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) / l
        oh_scr[:, lanes] = o.reshape(bi * t_pad, dh).astype(oh_scr.dtype)

    z = x + bo_ref[:] + jnp.dot(oh_scr[:], wo_ref[:].astype(oh_scr.dtype),
                                preferred_element_type=jnp.float32)
    zn = _layer_norm_rows(z, g2_ref[:], be2_ref[:], eps).astype(x_ref.dtype)
    r = zn.shape[0]
    cr = r // mlp_chunks
    for c in range(mlp_chunks):
        rows = slice(c * cr, (c + 1) * cr)
        hid = jnp.dot(zn[rows], w1_ref[:].astype(zn.dtype),
                      preferred_element_type=jnp.float32) + b1_ref[:]
        hid = _gelu_exact(hid)
        y = z[rows] + (jnp.dot(hid.astype(zn.dtype),
                               w2_ref[:].astype(zn.dtype),
                               preferred_element_type=jnp.float32)
                       + b2_ref[:])
        o_ref[rows, :] = y.astype(o_ref.dtype)


def vit_layer_infer(x, norm1, attn, norm2, mlp, *, t_pad: int,
                    t_real: int, eps: float = 1e-6, bi: int = None,
                    mlp_chunks: int = 2):
    """Whole ViT layer (both sublayers) as ONE pallas_call on folded
    (B * t_pad, E) token rows — saves the inter-sublayer HBM round-trip
    of the two-kernel path (attn_layer_infer + ln_mlp_infer)."""
    n, e = x.shape
    b = n // t_pad
    h, dh = attn["query"]["bias"].shape
    hd = h * dh
    hidden = mlp["fc1"]["kernel"].shape[1]
    scale = 1.0 / math.sqrt(dh)

    it = x.dtype.itemsize
    if bi is None:
        for cand in (8, 4, 2, 1):
            if b % cand:
                continue
            if _layer_vmem_est(cand, t_pad, e, hd, hidden, it,
                               mlp_chunks) <= _VMEM_ADMIT:
                bi = cand
                break
        if bi is None:
            raise FusedLayerVMEMError(
                f"vit_layer_infer: t_pad={t_pad} E={e} HD={hd} "
                f"hidden={hidden} overflows scoped VMEM even at bi=1; "
                f"use the composable impl='small' path")
    r = bi * t_pad
    mlp_chunks = _norm_mlp_chunks(r, mlp_chunks)

    def packed(p, mul=1.0):
        return p["kernel"].reshape(e, hd) * mul, \
            (p["bias"].astype(jnp.float32).reshape(1, hd) * mul)

    wq, bq = packed(attn["query"], scale)
    wk, bk = packed(attn["key"])
    wv, bv = packed(attn["value"])
    wo = attn["out"]["kernel"].reshape(hd, e)
    bo = attn["out"]["bias"].astype(jnp.float32).reshape(1, e)
    g1 = norm1["gamma"].astype(jnp.float32).reshape(1, e)
    be1 = norm1["beta"].astype(jnp.float32).reshape(1, e)
    g2 = norm2["gamma"].astype(jnp.float32).reshape(1, e)
    be2 = norm2["beta"].astype(jnp.float32).reshape(1, e)
    b1 = mlp["fc1"]["bias"].astype(jnp.float32).reshape(1, hidden)
    b2 = mlp["fc2"]["bias"].astype(jnp.float32).reshape(1, e)

    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_layer_kernel, bi=bi, t_pad=t_pad,
                          t_real=t_real, heads=h, dh=dh, eps=eps,
                          mlp_chunks=mlp_chunks),
        grid=(b // bi,),
        in_specs=[pl.BlockSpec((r, e), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + [const] * 16,
        out_specs=pl.BlockSpec((r, e), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, e), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((r, hd), x.dtype),
            pltpu.VMEM((r, hd), x.dtype),
            pltpu.VMEM((r, hd), x.dtype),
            pltpu.VMEM((r, hd), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * e * (4 * hd + 2 * hidden)
            + 4 * n * t_pad * h * dh,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=n * (t_pad * h + hidden),
        ),
        compiler_params=_v2_compiler_params(),
        interpret=_INTERPRET,
    )(x, g1, be1, wq, bq, wk, bk, wv, bv, wo, bo, g2, be2,
      mlp["fc1"]["kernel"], b1, mlp["fc2"]["kernel"], b2)


def _quant_rows(x):
    """Symmetric per-row dynamic int8 quantization of an f32 block.

    Returns (int8 values, f32 (R, 1) dequant scales).  The row abs-max is
    clamped away from zero so all-zero rows (e.g. the folded layout's
    padded token rows) quantize to zeros with a finite scale."""
    amax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-6)
    q = jnp.clip(jnp.round(x * (127.0 / amax)), -127.0, 127.0)
    return q.astype(jnp.int8), amax * (1.0 / 127.0)


def _quant_cols(w):
    """Symmetric per-output-channel int8 quantization of an (in, out)
    weight matrix.  Returns (int8 weights, f32 (1, out) dequant scales)."""
    w = w.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True), 1e-6)
    q = jnp.clip(jnp.round(w * (127.0 / amax)), -127.0, 127.0)
    return q.astype(jnp.int8), amax * (1.0 / 127.0)


def _qdot(xq, sx, w_ref, sw_ref, b_ref):
    """int8 x int8 -> int32 matmul with scale/bias epilogue (f32 out).

    Contraction depths here (<= 1536) keep |acc| <= 127*127*1536 < 2^31.
    """
    acc = jax.lax.dot_general(xq, w_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * sw_ref[:] + b_ref[:]


def _layer_kernel_int8(x_ref, g1_ref, be1_ref, wq_ref, sq_ref, bq_ref,
                       wk_ref, sk_ref, bk_ref, wv_ref, sv_ref, bv_ref,
                       wo_ref, so_ref, bo_ref, g2_ref, be2_ref,
                       w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                       o_ref, q_scr, k_scr, v_scr, oh_scr, *, bi: int,
                       t_pad: int, t_real: int, heads: int, dh: int,
                       eps: float, mlp_chunks: int):
    """Whole transformer layer with all six projections on the int8 MXU
    path (2x bf16 peak): weights are pre-quantized per output channel,
    activations quantize dynamically per token row inside the kernel.
    The attention core (scores, softmax, p@v) stays bf16/f32 — it is
    ~15% of layer FLOPs and carries the softmax numerics."""
    x = x_ref[:].astype(jnp.float32)                       # (R, E)
    xn = _layer_norm_rows(x, g1_ref[:], be1_ref[:], eps)
    xq, sx = _quant_rows(xn)
    q_scr[:] = _qdot(xq, sx, wq_ref, sq_ref, bq_ref).astype(q_scr.dtype)
    k_scr[:] = _qdot(xq, sx, wk_ref, sk_ref, bk_ref).astype(k_scr.dtype)
    v_scr[:] = _qdot(xq, sx, wv_ref, sv_ref, bv_ref).astype(v_scr.dtype)

    for h in range(heads):
        lanes = slice(h * dh, (h + 1) * dh)
        qh = q_scr[:, lanes].reshape(bi, t_pad, dh)
        kh = k_scr[:, lanes].reshape(bi, t_pad, dh)
        vh = v_scr[:, lanes].reshape(bi, t_pad, dh)
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < t_real, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(vh.dtype), vh,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) / l
        oh_scr[:, lanes] = o.reshape(bi * t_pad, dh).astype(oh_scr.dtype)

    ohq, soh = _quant_rows(oh_scr[:].astype(jnp.float32))
    z = x + _qdot(ohq, soh, wo_ref, so_ref, bo_ref)
    zn = _layer_norm_rows(z, g2_ref[:], be2_ref[:], eps)
    r = zn.shape[0]
    cr = r // mlp_chunks
    for c in range(mlp_chunks):
        rows = slice(c * cr, (c + 1) * cr)
        znq, sz = _quant_rows(zn[rows])
        hid = _gelu_exact(_qdot(znq, sz, w1_ref, s1_ref, b1_ref))
        hq, sh = _quant_rows(hid)
        y = z[rows] + _qdot(hq, sh, w2_ref, s2_ref, b2_ref)
        o_ref[rows, :] = y.astype(o_ref.dtype)


def _layer_vmem_est_int8(bi: int, t_pad: int, e: int, hd: int,
                         hidden: int, mlp_chunks: int) -> int:
    """Scoped-VMEM estimate for _layer_kernel_int8: bf16 activations and
    scratch as in _layer_vmem_est, int8 resident weights (half), plus the
    int8 quantized-activation temporaries."""
    rr = bi * t_pad
    mlp_chunks = _norm_mlp_chunks(rr, mlp_chunks)
    chunk = max(rr // mlp_chunks, 8)
    return (4 * rr * e * 2               # x in + y out, double-buffered
            + 4 * rr * hd * 2            # q/k/v/o bf16 scratch
            + 2 * rr * e * 4             # xn / z f32 temps
            + rr * e                     # xq int8
            + 4 * e * hd                 # int8 qkv + out weights
            + 2 * e * hidden             # int8 MLP weights
            + 2 * bi * t_pad * t_pad * 4  # live score buffers
            + 2 * chunk * hidden * 4     # f32 hidden chunk
            + chunk * hidden)            # int8 hidden chunk


def vit_layer_infer_int8(x, norm1, attn, norm2, mlp, *, t_pad: int,
                         t_real: int, eps: float = 1e-6, bi: int = None,
                         mlp_chunks: int = 2):
    """Int8 variant of vit_layer_infer: one pallas_call per layer with
    every projection (QKV, attention out, both MLP matmuls — ~85% of
    layer FLOPs) running int8 x int8 -> int32 on the MXU's double-rate
    int8 path.  Weights quantize per output channel outside the kernel;
    activations quantize per token row inside it (dynamic symmetric
    abs-max).  Numeric drift vs the bf16 fused path is ~1% of the logit
    scale (see tests/test_fused_layer.py) — an opt-in serving mode, not
    the parity path."""
    n, e = x.shape
    b = n // t_pad
    h, dh = attn["query"]["bias"].shape
    hd = h * dh
    hidden = mlp["fc1"]["kernel"].shape[1]
    scale = 1.0 / math.sqrt(dh)

    if bi is None:
        for cand in (8, 4, 2, 1):
            if b % cand:
                continue
            if _layer_vmem_est_int8(cand, t_pad, e, hd, hidden,
                                    mlp_chunks) <= _VMEM_ADMIT:
                bi = cand
                break
        if bi is None:
            raise FusedLayerVMEMError(
                f"vit_layer_infer_int8: t_pad={t_pad} E={e} HD={hd} "
                f"hidden={hidden} overflows scoped VMEM even at bi=1; "
                f"use the composable impl='small' path")
    r = bi * t_pad
    mlp_chunks = _norm_mlp_chunks(r, mlp_chunks)

    def packed_q(p, mul=1.0):
        wq, sw = _quant_cols(p["kernel"].reshape(e, hd) * mul)
        return wq, sw, (p["bias"].astype(jnp.float32).reshape(1, hd) * mul)

    wq, sq, bq = packed_q(attn["query"], scale)   # q pre-scaled 1/sqrt(Dh)
    wk, sk, bk = packed_q(attn["key"])
    wv, sv, bv = packed_q(attn["value"])
    wo, so = _quant_cols(attn["out"]["kernel"].reshape(hd, e))
    bo = attn["out"]["bias"].astype(jnp.float32).reshape(1, e)
    w1, s1 = _quant_cols(mlp["fc1"]["kernel"])
    w2, s2 = _quant_cols(mlp["fc2"]["kernel"])
    g1 = norm1["gamma"].astype(jnp.float32).reshape(1, e)
    be1 = norm1["beta"].astype(jnp.float32).reshape(1, e)
    g2 = norm2["gamma"].astype(jnp.float32).reshape(1, e)
    be2 = norm2["beta"].astype(jnp.float32).reshape(1, e)
    b1 = mlp["fc1"]["bias"].astype(jnp.float32).reshape(1, hidden)
    b2 = mlp["fc2"]["bias"].astype(jnp.float32).reshape(1, e)

    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_layer_kernel_int8, bi=bi, t_pad=t_pad,
                          t_real=t_real, heads=h, dh=dh, eps=eps,
                          mlp_chunks=mlp_chunks),
        grid=(b // bi,),
        in_specs=[pl.BlockSpec((r, e), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + [const] * 22,
        out_specs=pl.BlockSpec((r, e), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, e), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((r, hd), x.dtype),
            pltpu.VMEM((r, hd), x.dtype),
            pltpu.VMEM((r, hd), x.dtype),
            pltpu.VMEM((r, hd), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * e * (4 * hd + 2 * hidden)
            + 4 * n * t_pad * h * dh,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=n * (t_pad * h + hidden),
        ),
        compiler_params=_v2_compiler_params(),
        interpret=_INTERPRET,
    )(x, g1, be1, wq, sq, bq, wk, sk, bk, wv, sv, bv, wo, so, bo,
      g2, be2, w1, s1, b1, w2, s2, b2)


def _ln_mlp_kernel(x_ref, g2_ref, be2_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    xn = _layer_norm_rows(x, g2_ref[:], be2_ref[:], eps).astype(x_ref.dtype)
    hid = jnp.dot(xn, w1_ref[:].astype(xn.dtype),
                  preferred_element_type=jnp.float32) + b1_ref[:]
    hid = _gelu_exact(hid)
    y = jnp.dot(hid.astype(x_ref.dtype), w2_ref[:].astype(x_ref.dtype),
                preferred_element_type=jnp.float32) + b2_ref[:]
    o_ref[:] = (x + y).astype(o_ref.dtype)


def ln_mlp_infer(x, norm2, mlp, *, eps: float = 1e-6, bn: int = 512):
    """x: (N, E) token rows -> same shape, y = x + MLP(LN2(x)).

    mlp: {fc1: {kernel (E, Hd), bias}, fc2: {kernel (Hd, E), bias}}.
    E and Hd must be 128-multiples (384/1536 at ViT-S); N a multiple of 8.
    """
    n, e = x.shape
    hd = mlp["fc1"]["kernel"].shape[1]
    it = x.dtype.itemsize
    # largest row-block <= bn that divides n AND fits scoped VMEM (n is a
    # multiple of 8: the caller folds B * t_pad rows with t_pad 8-aligned)
    chosen = None
    for cand in (bn, 512, 256, 128, 64, 32, 16, 8):
        if (cand <= bn and n % cand == 0
                and _ln_mlp_vmem_est(cand, e, hd, it) <= _VMEM_ADMIT):
            chosen = cand
            break
    if chosen is None:
        raise FusedLayerVMEMError(
            f"ln_mlp_infer: E={e} hidden={hd} overflows scoped VMEM even "
            f"at bn=8 (resident MLP weights too large); use the "
            f"composable path")
    bn = chosen

    g2 = norm2["gamma"].astype(jnp.float32).reshape(1, e)
    be2 = norm2["beta"].astype(jnp.float32).reshape(1, e)
    b1 = mlp["fc1"]["bias"].astype(jnp.float32).reshape(1, hd)
    b2 = mlp["fc2"]["bias"].astype(jnp.float32).reshape(1, e)

    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_mlp_kernel, eps=eps),
        grid=(n // bn,),
        in_specs=[pl.BlockSpec((bn, e), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + [const] * 6,
        out_specs=pl.BlockSpec((bn, e), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, e), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * e * hd,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=n * hd,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_V1_VMEM_LIMIT),
        interpret=_INTERPRET,
    )(x, g2, be2, mlp["fc1"]["kernel"], b1, mlp["fc2"]["kernel"], b2)
