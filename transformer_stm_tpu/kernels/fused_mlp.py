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
