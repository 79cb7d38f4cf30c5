"""Foundational ops: convs, dense, norms, pooling, activations.

These re-implement the exact numerics of the Keras layers the reference
builds on (reference: models/CvT(Par).py:93-142,203-209,248-259) as pure JAX
functions over pytree params — but TPU-first: NHWC layouts that XLA maps onto
the MXU, static shapes, no Python control flow on traced values.

TF-parity notes encoded here:
- 'same' padding is TensorFlow's asymmetric SAME (extra pad goes *after*),
  which differs from jnp's default for even kernel/stride combinations.
- AveragePooling2D with SAME padding excludes padded cells from the divisor.
- GELU is exact (erf) — tf.nn.gelu(approximate=False) is the Keras default,
  while jax.nn.gelu defaults to the tanh approximation.
- Keras kernel init is glorot_uniform, biases zeros.
- BatchNormalization defaults: momentum 0.99, epsilon 1e-3.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def glorot_uniform(key, shape, fan_in: int, fan_out: int, dtype=jnp.float32):
    """Keras default kernel initializer."""
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def matmul_precision(dtype):
    """float32 inputs get full-precision MXU passes (3-pass bf16 on TPU,
    strict fp32 on CPU) — required for the <=1e-3 logits-parity contract.
    bfloat16 inputs (the throughput path) use the fast default."""
    return lax.Precision.HIGHEST if dtype == jnp.float32 \
        else lax.Precision.DEFAULT


# ---------------------------------------------------------------------------
# Padding
# ---------------------------------------------------------------------------

def same_padding(in_size: int, kernel: int, stride: int) -> Tuple[int, int]:
    """TensorFlow 'SAME' padding for one spatial dim: output = ceil(in/s),
    total pad = max((out-1)*s + k - in, 0), split low-first (extra after).

    This asymmetry matters for the stride-4 7x7 patch embed on 128px input
    (reference: models/CvT(Par).py:68): TF pads (1, 2) per dim there.
    """
    out_size = -(-in_size // stride)
    pad = max((out_size - 1) * stride + kernel - in_size, 0)
    return pad // 2, pad - pad // 2


# ---------------------------------------------------------------------------
# Conv2D (NHWC)
# ---------------------------------------------------------------------------

def init_conv2d(key, in_ch: int, out_ch: int, kernel_size: int,
                use_bias: bool = True, dtype=jnp.float32):
    """Keras Conv2D: kernel (kh, kw, in, out) glorot_uniform, bias zeros."""
    rf = kernel_size * kernel_size
    kernel = glorot_uniform(
        key, (kernel_size, kernel_size, in_ch, out_ch),
        fan_in=in_ch * rf, fan_out=out_ch * rf, dtype=dtype)
    params = {"kernel": kernel}
    if use_bias:
        params["bias"] = jnp.zeros((out_ch,), dtype)
    return params


def conv2d(params, x, stride: int = 1, padding: str = "same"):
    """NHWC conv with TF-SAME padding. x: (B, H, W, Cin) -> (B, H', W', Cout)."""
    kh, kw = params["kernel"].shape[:2]
    if padding == "same":
        pad = (same_padding(x.shape[1], kh, stride),
               same_padding(x.shape[2], kw, stride))
    else:
        pad = ((0, 0), (0, 0))
    y = lax.conv_general_dilated(
        x, params["kernel"].astype(x.dtype), window_strides=(stride, stride),
        padding=pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=matmul_precision(x.dtype))
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y


def init_depthwise_conv2d(key, channels: int, kernel_size: int,
                          use_bias: bool = False, dtype=jnp.float32):
    """Keras DepthwiseConv2D (depth_multiplier=1): kernel (kh, kw, C, 1).

    The reference's dw_bn QKV projection uses use_bias=False
    (reference: models/CvT(Par).py:93).
    Keras computes glorot fan from the kernel shape (kh, kw, C, 1):
    fan_in = kh*kw*C, fan_out = kh*kw*1.
    """
    rf = kernel_size * kernel_size
    kernel = glorot_uniform(
        key, (kernel_size, kernel_size, channels, 1),
        fan_in=rf * channels, fan_out=rf, dtype=dtype)
    params = {"kernel": kernel}
    if use_bias:
        params["bias"] = jnp.zeros((channels,), dtype)
    return params


def depthwise_conv2d(params, x, stride: int = 1, padding: str = "same"):
    """Depthwise NHWC conv, feature_group_count = C."""
    kh, kw, c, mult = params["kernel"].shape
    if padding == "same":
        pad = (same_padding(x.shape[1], kh, stride),
               same_padding(x.shape[2], kw, stride))
    else:
        pad = ((0, 0), (0, 0))
    # lax expects kernel (kh, kw, in_ch/groups, out_ch) with groups = C:
    # reshape (kh, kw, C, 1) -> (kh, kw, 1, C*mult)
    kernel = jnp.transpose(params["kernel"], (0, 1, 3, 2)).reshape(
        kh, kw, 1, c * mult)
    y = lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(stride, stride),
        padding=pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=matmul_precision(x.dtype))
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------

def init_dense(key, in_dim: int, out_dim: int, use_bias: bool = True,
               dtype=jnp.float32):
    kernel = glorot_uniform(key, (in_dim, out_dim), in_dim, out_dim, dtype)
    params = {"kernel": kernel}
    if use_bias:
        params["bias"] = jnp.zeros((out_dim,), dtype)
    return params


def dense(params, x):
    """y = x @ W + b on the last axis — an MXU matmul when batched."""
    y = jnp.matmul(x, params["kernel"].astype(x.dtype),
                   precision=matmul_precision(x.dtype))
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------

def init_layer_norm(dim: int, dtype=jnp.float32):
    return {"gamma": jnp.ones((dim,), dtype), "beta": jnp.zeros((dim,), dtype)}


def layer_norm(params, x, eps: float = 1e-6):
    """LayerNorm over the last axis. The reference always passes epsilon=1e-6
    (models/CvT(Par).py:248,328,336). Statistics in float32 for bf16 inputs."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y * params["gamma"] + params["beta"]
    return y.astype(x.dtype)


def init_batch_norm(dim: int, dtype=jnp.float32):
    """Keras BatchNormalization (reference dw_bn projection,
    models/CvT(Par).py:94). Returns (params, state)."""
    params = {"gamma": jnp.ones((dim,), dtype), "beta": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), jnp.float32),
             "var": jnp.ones((dim,), jnp.float32)}
    return params, state


def batch_norm(params, state, x, train: bool, momentum: float = 0.99,
               eps: float = 1e-3, axis_name: Optional[str] = None):
    """BatchNorm over all axes but the last. In train mode returns updated
    moving stats; stats are synchronised across a `data` mesh axis when
    axis_name is given (DP training — the TPU-native replacement for the
    reference's single-GPU implicit behavior)."""
    xf = x.astype(jnp.float32)
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf, axis=axes)
        mean_sq = jnp.mean(jnp.square(xf), axis=axes)
        if axis_name is not None:
            mean = lax.pmean(mean, axis_name)
            mean_sq = lax.pmean(mean_sq, axis_name)
        var = mean_sq - jnp.square(mean)
        # Keras-2 fused BatchNorm (what the reference ran on) updates the
        # moving variance with the UNBIASED sample variance (Bessel's
        # n/(n-1)), while normalisation uses the biased batch variance.
        n = x.size // x.shape[-1]
        if axis_name is not None:
            n = n * lax.psum(1, axis_name)
        bessel = n / max(n - 1, 1)
        new_state = {
            "mean": momentum * state["mean"] + (1 - momentum) * mean,
            "var": momentum * state["var"] + (1 - momentum) * var * bessel,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y * params["gamma"] + params["beta"]
    return y.astype(x.dtype), new_state


# ---------------------------------------------------------------------------
# Pooling
# ---------------------------------------------------------------------------

def avg_pool_same(x, pool_size: int, stride: int):
    """Keras AveragePooling2D(padding='same'): zero-padded cells are excluded
    from the divisor (tf.nn.avg_pool semantics). Used by the 'avg' QKV
    projection (reference: models/CvT(Par).py:96)."""
    pad = (same_padding(x.shape[1], pool_size, stride),
           same_padding(x.shape[2], pool_size, stride))
    window = (1, pool_size, pool_size, 1)
    strides = (1, stride, stride, 1)
    padding = ((0, 0), pad[0], pad[1], (0, 0))
    summed = lax.reduce_window(x, jnp.zeros((), x.dtype), lax.add,
                               window, strides, padding)
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    counts = lax.reduce_window(ones, jnp.zeros((), x.dtype), lax.add,
                               window, strides, padding)
    return summed / counts


# ---------------------------------------------------------------------------
# Activations / regularisation
# ---------------------------------------------------------------------------

def gelu(x):
    """Exact (erf) GELU = tf.nn.gelu default, used by the reference MLP
    (models/CvT(Par).py:254). NB jax.nn.gelu defaults to approximate=True.

    bfloat16 inputs use the Abramowitz-Stegun rational erf (max error
    1.5e-7, far below bf16 resolution ~8e-3 — numerically identical at
    bf16) because XLA's exact erf expansion dominates MLP time on TPU
    (measured 7x on ViT-S shapes)."""
    if x.dtype == jnp.bfloat16:
        xf = x.astype(jnp.float32)
        y = xf * 0.5 * (1.0 + _erf_rational(xf * 0.7071067811865476))
        return y.astype(x.dtype)
    return jax.nn.gelu(x, approximate=False)


def _erf_rational(x):
    """A&S 7.1.26 rational erf approximation (|err| <= 1.5e-7)."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-ax * ax))


def dropout(key, x, rate: float, train: bool):
    """Inverted dropout (Keras semantics). No-op when not training or rate 0."""
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))
