"""Conv QKV projection (reference: Projection, models/CvT(Par).py:83-112).

Three methods:
- ``dw_bn``:  DepthwiseConv2D(k, s, same, no bias) + BatchNormalization
- ``avg``:    AveragePooling2D(k, s, same)  (padding excluded from divisor)
- ``linear``: **identity** — the reference sets ``self.proj = None`` and
  returns the input unchanged (models/CvT(Par).py:97-98,109-110).  This quirk
  is preserved: 'linear' has no parameters.
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import (
    avg_pool_same, batch_norm, depthwise_conv2d,
    init_batch_norm, init_depthwise_conv2d,
)


def init_projection(key, dim: int, kernel_size: int, method: str,
                    dtype=jnp.float32):
    """Returns (params, state). 'avg' and 'linear' are parameter-free."""
    if method == "dw_bn":
        conv = init_depthwise_conv2d(key, dim, kernel_size, use_bias=False,
                                     dtype=dtype)
        bn_params, bn_state = init_batch_norm(dim, dtype)
        return {"conv": conv, "bn": bn_params}, {"bn": bn_state}
    if method in ("avg", "linear"):
        return {}, {}
    raise ValueError(f"Unknown method: {method}")


def projection(params, state, x, *, kernel_size: int, stride: int,
               method: str, train: bool = False, axis_name=None):
    """x: (B, H, W, C) -> (B, H', W', C). Returns (y, new_state)."""
    if method == "dw_bn":
        y = depthwise_conv2d(params["conv"], x, stride=stride)
        y, bn_state = batch_norm(params["bn"], state["bn"], y, train=train,
                                 axis_name=axis_name)
        return y, {"bn": bn_state}
    if method == "avg":
        return avg_pool_same(x, kernel_size, stride), state
    if method == "linear":
        return x, state
    raise ValueError(f"Unknown method: {method}")
