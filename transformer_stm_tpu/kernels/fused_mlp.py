"""Pallas TPU fused transformer MLP: Dense -> exact GELU -> Dense.

Fuses the reference block's two-matmul MLP (models/CvT(Par).py:253-258) into
a single kernel: the (tokens, hidden) intermediate lives only in VMEM, saving
one full HBM round-trip of the 4x-expanded activation — the classic
bandwidth win on TPU where HBM, not the MXU, is the bottleneck.

Weights (D, Hd) and (Hd, D) are kept whole in VMEM (<= ~1 MB at CvT sizes,
~19 MB at ViT-B — still fine blocked over hidden); the grid runs over token
blocks.  Feature dims are zero-padded to the 128-lane boundary (zero
columns/rows are exact no-ops through matmul and gelu(0)=0).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# CPU tests exercise the kernels via the Pallas interpreter
# (TSTM_PALLAS_INTERPRET=1); on TPU they compile through Mosaic.
_INTERPRET = os.environ.get("TSTM_PALLAS_INTERPRET", "0") == "1"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _erf_approx(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs error 1.5e-7) —
    Mosaic implements neither erf nor erfc, so the kernel carries its own.
    The resulting GELU deviates from exact erf-GELU by < 1e-7 * |x|."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_exact(x):
    """erf-based GELU matching tf.nn.gelu(approximate=False) numerics to
    ~1e-7 (reference MLP activation, models/CvT(Par).py:254)."""
    return x * 0.5 * (1.0 + _erf_approx(x * 0.7071067811865476))


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    h = jnp.dot(x, w1_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32) + b1_ref[:]
    h = _gelu_exact(h)
    y = jnp.dot(h, w2_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32) + b2_ref[:]
    o_ref[:] = y.astype(o_ref.dtype)


def fused_mlp(x, w1, b1, w2, b2):
    """x: (..., N, D) -> (..., N, out).  w1: (D, Hd), w2: (Hd, out)."""
    orig_shape = x.shape
    d = x.shape[-1]
    hd = w1.shape[1]
    out = w2.shape[1]
    n = 1
    for s in orig_shape[:-1]:
        n *= s
    xf = x.reshape(n, d)

    bn = 256 if n >= 256 else _round_up(max(n, 8), 8)
    n_pad = _round_up(n, bn)
    d_pad = _round_up(d, 128)
    hd_pad = _round_up(hd, 128)
    out_pad = _round_up(out, 128)

    xf = jnp.pad(xf, ((0, n_pad - n), (0, d_pad - d)))
    w1p = jnp.pad(w1, ((0, d_pad - d), (0, hd_pad - hd)))
    b1p = jnp.pad(b1.astype(jnp.float32), (0, hd_pad - hd)).reshape(1, hd_pad)
    w2p = jnp.pad(w2, ((0, hd_pad - hd), (0, out_pad - out)))
    b2p = jnp.pad(b2.astype(jnp.float32), (0, out_pad - out)).reshape(1, out_pad)

    y = pl.pallas_call(
        _mlp_kernel,
        grid=(n_pad // bn,),
        in_specs=[
            pl.BlockSpec((bn, d_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, hd_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd_pad, out_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, out_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_pad), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (d * hd + hd * out),
            bytes_accessed=(xf.size + w1p.size + w2p.size) * 4,
            transcendentals=n * hd,
        ),
        interpret=_INTERPRET,
    )(xf, w1p, b1p, w2p, b2p)
    return y[:n, :out].reshape(*orig_shape[:-1], out)


# ---------------------------------------------------------------------------
# Training-mode fused MLP (custom_vjp): Dense -> GELU -> Drop -> Dense -> Drop
# ---------------------------------------------------------------------------
#
# The backward recomputes the hidden activation and the dropout masks
# instead of stashing them, so the (N, 4D) intermediate never touches HBM in
# either direction.  Dropout masks come from the TPU core PRNG
# (pltpu.prng_seed / prng_random_bits).  Each token block reads its own
# (2,)-word seed from an (n_blocks, 2) SMEM input indexed by the *block*
# grid axis — NOT from pl.program_id, which under jax.vmap would name the
# prepended batch axis (the multi-target trainer's target slot) instead of
# the token block: with program_id-derived seeds every token block of one
# call would reuse one mask (block-periodic dropout, advisor r2 finding).
# fwd and bwd rebuild the identical seed table from the saved (2,) seed, so
# masks agree — deterministic given (seed, block index).  The mask *stream*
# differs from the jax.random-based XLA path (equally-distributed Bernoulli;
# the reference's TF dropout stream differs from both, so parity is defined
# distribution-wise, not bitwise).  On CPU (interpret mode) an XLA fallback
# with jax.random masks implements the same custom_vjp formulas — that path
# is what the gradient tests validate.
#
# Weight/bias grads are written PER BLOCK to (n_blocks, ...) outputs and
# summed outside the kernel.  The previous design accumulated them across
# the sequential grid with a zero-init gated on pl.program_id(0) == 0;
# under vmap that predicate again tests the batch axis, so slot 0 re-zeroed
# at every token block and slots >= 1 never initialised at all (advisor r2
# high-severity finding).  Per-block outputs have no revisit/init semantics
# and are correct under any vmap nesting; the extra HBM round-trip of the
# (n_blocks, D, 4D) partials costs ~0.7 ms per stage-1 CvT backward —
# a few percent of the step, kept for correctness.

_SQRT1_2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _gelu_grad_exact(a):
    """d/da [a * Phi(a)] = Phi(a) + a * phi(a)."""
    phi = jnp.exp(-0.5 * a * a) * _INV_SQRT_2PI
    big_phi = 0.5 * (1.0 + _erf_approx(a * _SQRT1_2))
    return big_phi + a * phi


def _keep_mask(bits, rate: float):
    """Random bits -> keep mask scaled by 1/(1-rate).

    Mosaic's prng_random_bits yields SIGNED int32; comparing that against a
    uint32 threshold promotes the threshold to a negative int32 for any
    rate >= 0.5 — and mixed promotion is unreliable below that too — so the
    comparison must be forced into the uint32 domain (int32 -> uint32
    astype is a two's-complement reinterpret, exactly what we want).  The
    unconverted form made the mask all-keep on hardware: dropout silently
    became a deterministic 1/(1-rate) gain."""
    bits = bits.astype(jnp.uint32)
    thresh = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    return (bits >= thresh).astype(jnp.float32) / (1.0 - rate)


def _mlp_train_fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                          o_ref, *, rate: float):
    if rate > 0.0:
        # per-block seed row (see module docstring: program_id is unsafe
        # under vmap)
        pltpu.prng_seed(seed_ref[0, 0, 0], seed_ref[0, 0, 1])
    x = x_ref[:].astype(jnp.float32)
    a = jnp.dot(x, w1_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32) + b1_ref[:]
    h = _gelu_exact(a)
    if rate > 0.0:
        h = h * _keep_mask(pltpu.prng_random_bits(h.shape), rate)
    y = jnp.dot(h, w2_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32) + b2_ref[:]
    if rate > 0.0:
        y = y * _keep_mask(pltpu.prng_random_bits(y.shape), rate)
    o_ref[:] = y.astype(o_ref.dtype)


def _mlp_train_bwd_kernel(seed_ref, x_ref, g_ref, w1_ref, b1_ref, w2_ref,
                          dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *,
                          rate: float):
    """Recompute + grads for one token block; weight/bias grads go to
    per-block output slots (summed by the caller — vmap-safe, no
    cross-iteration accumulator state)."""
    if rate > 0.0:
        # identical per-block seed row + draw order as the forward kernel
        pltpu.prng_seed(seed_ref[0, 0, 0], seed_ref[0, 0, 1])
    x = x_ref[:].astype(jnp.float32)
    w1 = w1_ref[:].astype(jnp.float32)
    w2 = w2_ref[:].astype(jnp.float32)
    a = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1_ref[:]
    h = _gelu_exact(a)
    if rate > 0.0:
        m1 = _keep_mask(pltpu.prng_random_bits(h.shape), rate)
        h = h * m1
    g = g_ref[:].astype(jnp.float32)
    if rate > 0.0:
        m2 = _keep_mask(pltpu.prng_random_bits(g.shape), rate)
        g = g * m2
    dh = jnp.dot(g, w2.T, preferred_element_type=jnp.float32)
    if rate > 0.0:
        dh = dh * m1
    da = dh * _gelu_grad_exact(a)
    dx_ref[:] = jnp.dot(da, w1.T,
                        preferred_element_type=jnp.float32).astype(
                            dx_ref.dtype)

    dw1_ref[:] = jnp.dot(x.T, da,
                         preferred_element_type=jnp.float32)[None]
    db1_ref[:] = jnp.sum(da, axis=0, keepdims=True)[None]
    dw2_ref[:] = jnp.dot(h.T, g,
                         preferred_element_type=jnp.float32)[None]
    db2_ref[:] = jnp.sum(g, axis=0, keepdims=True)[None]


def _train_dims(x, w1, w2, bn_override=None):
    d = x.shape[-1]
    hd = w1.shape[1]
    out = w2.shape[1]
    n = 1
    for s in x.shape[:-1]:
        n *= s
    hd_pad = _round_up(hd, 128)
    # explicit arg (threaded from the trainer) beats the env knob, which
    # remains for ad-hoc scripts; mutating process env from a trainer
    # leaked the narrow block to later trainers in the same process
    # (advisor r3)
    env_bn = (str(bn_override) if bn_override
              else os.environ.get("TSTM_MLP_TRAIN_BN", ""))
    if env_bn:
        # explicit token-block override: the multi-target trainer sets
        # this for wide vmaps, where Mosaic's scoped-vmem accounting of
        # the bwd kernel grows with the vmapped width (measured: bn=512
        # fits the 16 MB limit at T=5 slots but overflows at T=6+ —
        # 16.39/19.37/17.89 MB at T=6/8/10; the 512-row bwd blocks are
        # the dominant term, so halving bn restores headroom)
        bn = max(8, min(_round_up(int(env_bn), 8), _round_up(n, 8)))
    elif n >= 256:
        # Larger token blocks cut the (n_blocks, D, Hd) weight-grad
        # partial traffic proportionally; bounded by the (bn, hd_pad) f32
        # intermediates (~4 live buffers) fitting an 8 MB VMEM budget.
        # CvT stage 1 (hd_pad 256) gets 1024-row blocks — 4x fewer
        # partials on the shape that dominates the backward.
        bn = 256
        for cand in (1024, 512):
            if n >= cand and cand * hd_pad * 16 <= (8 << 20):
                bn = cand
                break
    else:
        bn = _round_up(max(n, 8), 8)
    return (n, d, hd, out, bn, _round_up(n, bn), _round_up(d, 128),
            hd_pad, _round_up(out, 128))


def _seed_table(seed, n_blocks: int):
    """(2,) int32 -> (n_blocks, 1, 2) per-block PRNG seed rows.  Word 0 mixes
    the block index with a golden-ratio multiply (int32 wraparound is fine —
    rows only need to be distinct), word 1 passes through."""
    s0 = (seed[0] * jnp.int32(-1640531535)  # 2654435761 as i32
          + jnp.arange(n_blocks, dtype=jnp.int32))
    s1 = jnp.broadcast_to(seed[1], (n_blocks,)).astype(jnp.int32)
    # (nb, 1, 2): a (1, 1, 2) block's last-two dims equal the array's, the
    # only layout Mosaic accepts for tiny SMEM blocks (also under vmap's
    # prepended batch axis)
    return jnp.stack([s0, s1], axis=1).reshape(n_blocks, 1, 2)


def _fallback_masks(seed, shape1, shape2, rate: float):
    """jax.random masks for the interpret/CPU path (same formulas, host
    PRNG stream)."""
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed[0])
    key = jax.random.fold_in(key, seed[1])
    k1, k2 = jax.random.split(key)
    m1 = jax.random.bernoulli(k1, 1.0 - rate, shape1).astype(
        jnp.float32) / (1.0 - rate)
    m2 = jax.random.bernoulli(k2, 1.0 - rate, shape2).astype(
        jnp.float32) / (1.0 - rate)
    return m1, m2


def make_fused_mlp_train(rate: float, interpret: bool = None,
                         bn: int = None):
    """Returns f(x, w1, b1, w2, b2, seed) -> y with a fused custom_vjp.

    seed: (2,) int32 — derive from the step's dropout rng.  rate is static.
    bn: optional explicit token-block override (wide-vmap callers pass the
    width-scaled size; None keeps the auto/env choice).
    """
    interp = _INTERPRET if interpret is None else interpret

    @jax.custom_vjp
    def f(x, w1, b1, w2, b2, seed):
        return _fwd(x, w1, b1, w2, b2, seed)[0]

    def _fwd(x, w1, b1, w2, b2, seed):
        if interp and rate > 0.0:
            # interpret mode lacks the TPU PRNG — same math, XLA masks
            orig = x.shape
            xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
            a = xf @ w1.astype(jnp.float32) + b1
            h = _gelu_exact(a)
            m1, m2 = _fallback_masks(seed, a.shape,
                                     (a.shape[0], w2.shape[1]), rate)
            y = (h * m1) @ w2.astype(jnp.float32) + b2
            y = y * m2
            return (y.reshape(*orig[:-1], w2.shape[1]).astype(x.dtype),
                    (x, w1, b1, w2, b2, seed))

        n, d, hd, out, bn_blk, n_pad, d_pad, hd_pad, out_pad = _train_dims(
            x, w1, w2, bn)
        xf = jnp.pad(x.reshape(n, d), ((0, n_pad - n), (0, d_pad - d)))
        w1p = jnp.pad(w1, ((0, d_pad - d), (0, hd_pad - hd)))
        b1p = jnp.pad(b1.astype(jnp.float32),
                      (0, hd_pad - hd)).reshape(1, hd_pad)
        w2p = jnp.pad(w2, ((0, hd_pad - hd), (0, out_pad - out)))
        b2p = jnp.pad(b2.astype(jnp.float32),
                      (0, out_pad - out)).reshape(1, out_pad)
        y = pl.pallas_call(
            functools.partial(_mlp_train_fwd_kernel, rate=rate),
            grid=(n_pad // bn_blk,),
            in_specs=[
                # (1, 1, 2) SMEM seed block indexed by the token-block
                # axis; see _seed_table for the layout rationale
                pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((bn_blk, d_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d_pad, hd_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hd_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hd_pad, out_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, out_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bn_blk, out_pad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, out_pad), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * (d * hd + hd * out),
                bytes_accessed=(xf.size + w1p.size + w2p.size) * 4,
                transcendentals=2 * n * hd,
            ),
            interpret=interp,
        )(_seed_table(seed, n_pad // bn_blk), xf, w1p, b1p, w2p, b2p)
        return (y[:n, :out].reshape(*x.shape[:-1], out),
                (x, w1, b1, w2, b2, seed))

    def _bwd(res, gy):
        x, w1, b1, w2, b2, seed = res
        if interp and rate > 0.0:
            orig = x.shape
            xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
            a = xf @ w1.astype(jnp.float32) + b1
            h0 = _gelu_exact(a)
            m1, m2 = _fallback_masks(seed, a.shape,
                                     (a.shape[0], w2.shape[1]), rate)
            h = h0 * m1
            g = gy.reshape(-1, gy.shape[-1]).astype(jnp.float32) * m2
            dh = (g @ w2.astype(jnp.float32).T) * m1
            da = dh * _gelu_grad_exact(a)
            dx = (da @ w1.astype(jnp.float32).T).reshape(orig).astype(
                x.dtype)
            return (dx, (xf.T @ da).astype(w1.dtype),
                    jnp.sum(da, axis=0).astype(b1.dtype),
                    (h.T @ g).astype(w2.dtype),
                    jnp.sum(g, axis=0).astype(b2.dtype),
                    jnp.zeros(seed.shape, jax.dtypes.float0))

        n, d, hd, out, bn_blk, n_pad, d_pad, hd_pad, out_pad = _train_dims(
            x, w1, w2, bn)
        xf = jnp.pad(x.reshape(n, d), ((0, n_pad - n), (0, d_pad - d)))
        gf = jnp.pad(gy.reshape(n, out), ((0, n_pad - n),
                                          (0, out_pad - out)))
        w1p = jnp.pad(w1, ((0, d_pad - d), (0, hd_pad - hd)))
        b1p = jnp.pad(b1.astype(jnp.float32),
                      (0, hd_pad - hd)).reshape(1, hd_pad)
        w2p = jnp.pad(w2, ((0, hd_pad - hd), (0, out_pad - out)))
        nb = n_pad // bn_blk
        dx, dw1, db1, dw2, db2 = pl.pallas_call(
            functools.partial(_mlp_train_bwd_kernel, rate=rate),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((bn_blk, d_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn_blk, out_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d_pad, hd_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hd_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hd_pad, out_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bn_blk, d_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                # per-block weight/bias grad slots (summed below):
                # no revisit accumulation -> correct under vmap
                pl.BlockSpec((1, d_pad, hd_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, hd_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hd_pad, out_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, out_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_pad, d_pad), x.dtype),
                jax.ShapeDtypeStruct((nb, d_pad, hd_pad), jnp.float32),
                jax.ShapeDtypeStruct((nb, 1, hd_pad), jnp.float32),
                jax.ShapeDtypeStruct((nb, hd_pad, out_pad), jnp.float32),
                jax.ShapeDtypeStruct((nb, 1, out_pad), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=6 * n * (d * hd + hd * out),
                bytes_accessed=(xf.size + gf.size + 2 * w1p.size
                                + 2 * w2p.size) * 4,
                transcendentals=2 * n * hd,
            ),
            interpret=interp,
        )(_seed_table(seed, nb), xf, gf, w1p, b1p, w2p)
        return (dx[:n, :d].reshape(x.shape),
                jnp.sum(dw1, axis=0)[:d, :hd].astype(w1.dtype),
                jnp.sum(db1, axis=0)[0, :hd].astype(b1.dtype),
                jnp.sum(dw2, axis=0)[:hd, :out].astype(w2.dtype),
                jnp.sum(db2, axis=0)[0, :out].astype(b2.dtype),
                jnp.zeros(seed.shape, jax.dtypes.float0))

    f.defvjp(_fwd, _bwd)
    return f
