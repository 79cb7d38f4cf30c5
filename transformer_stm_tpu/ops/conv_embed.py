"""Convolutional patch embedding (reference: ConvEmbed,
models/CvT(Par).py:194-228).

Quirk preserved: the reference's LayerNorm after the embed conv is dead at
runtime — its gate compares ``norm_layer == "LayerNormalization"`` (a string)
but callers pass the class object, so ``self.norm = None``
(models/CvT(Par).py:209,304).  ``norm=False`` (default) reproduces that;
``norm=True`` enables the norm the upstream CvT paper intended.
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import conv2d, init_conv2d, init_layer_norm, layer_norm


def init_conv_embed(key, in_ch: int, embed_dim: int, patch_size: int,
                    norm: bool = False, dtype=jnp.float32):
    params = {"proj": init_conv2d(key, in_ch, embed_dim, patch_size,
                                  dtype=dtype)}
    if norm:
        params["norm"] = init_layer_norm(embed_dim, dtype)
    return params


def conv_embed(params, x, *, stride: int):
    """x: (B, H, W, Cin) -> (B, ceil(H/s), ceil(W/s), D)."""
    y = conv2d(params["proj"], x, stride=stride, padding="same")
    if "norm" in params:
        y = layer_norm(params["norm"], y, eps=1e-3)  # Keras LN default eps
    return y
