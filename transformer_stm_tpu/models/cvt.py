"""CvT model builder (reference: create_cvt_model, models/CvT(Par).py:292-354).

Spec-driven 3-stage pyramid: [ConvEmbed -> ConvTransformerBlock] x 3, then
- cls head:    LayerNorm(cls_token) -> squeeze            (ref :326-329)
- no-cls head: flatten -> LayerNorm -> mean over tokens   (ref :334-337)
optionally concatenated with a Dense(256, relu) x 2 process-parameter branch
(ref :343-347) and a final linear Dense(num_classes) (ref :350).

Functional API:
    params, state = init_cvt(key, spec)
    out, new_state = cvt_forward(params, state, spec, images, proc,
                                 train=..., rng=...)

`state` carries the BatchNorm moving statistics of the dw_bn QKV projections;
it is empty for 'avg'/'linear' projections.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import CvTSpec
from ..ops import (
    conv_embed, conv_transformer_block, dense, init_conv_embed,
    init_conv_transformer_block, init_dense, init_layer_norm, layer_norm,
)


def init_cvt(key, spec: CvTSpec, dtype=jnp.float32):
    """Returns (params, state)."""
    n_stages = len(spec.stages)
    keys = jax.random.split(key, 2 * n_stages + 4)
    params = {"stages": []}
    state = {"stages": []}
    in_ch = spec.num_channels
    for i, st in enumerate(spec.stages):
        embed = init_conv_embed(keys[2 * i], in_ch, st.embed_dim,
                                st.patch_size, norm=spec.embed_norm,
                                dtype=dtype)
        blocks, block_states = [], []
        bkeys = jax.random.split(keys[2 * i + 1], st.depth)
        for d in range(st.depth):
            bp, bs = init_conv_transformer_block(
                bkeys[d], st.embed_dim, st.num_heads, st.kernel_size,
                st.qkv_method, st.mlp_ratio,
                with_cls_token=st.with_cls_token, dtype=dtype)
            blocks.append(bp)
            block_states.append(bs)
        params["stages"].append({"embed": embed, "blocks": blocks})
        state["stages"].append({"blocks": block_states})
        in_ch = st.embed_dim

    last_dim = spec.stages[-1].embed_dim
    params["head_norm"] = init_layer_norm(last_dim, dtype)
    feat_dim = last_dim
    if spec.proc_dim > 0:
        params["proc_fc1"] = init_dense(keys[-3], spec.proc_dim,
                                        spec.proc_hidden, dtype=dtype)
        params["proc_fc2"] = init_dense(keys[-2], spec.proc_hidden,
                                        spec.proc_hidden, dtype=dtype)
        feat_dim = last_dim + spec.proc_hidden
    params["final"] = init_dense(keys[-1], feat_dim, spec.num_classes,
                                 dtype=dtype)
    return params, state


def cvt_forward(params, state, spec: CvTSpec, images, proc=None, *,
                train: bool = False, rng=None, impl: str = "auto",
                mlp_impl=None, mlp_bn=None, axis_name=None,
                return_features: bool = False, remat: bool = False):
    """images: (B, H, W, C) float; proc: (B, proc_dim) or None.

    Returns (output (B, num_classes), new_state); with return_features=True
    also returns the stage feature maps (for Grad-CAM, tools/grad_cam.py).

    remat=True wraps each transformer block in jax.checkpoint so the
    backward pass recomputes block activations instead of stashing them —
    the HBM trade that lets the multi-target trainer fit 20 models'
    training state on one chip (train/multi.py).
    """
    x = images
    cls_tokens = None
    new_state = {"stages": []}
    features = []
    n_blocks = sum(st.depth for st in spec.stages)
    rngs = (jax.random.split(rng, n_blocks) if rng is not None
            else [None] * n_blocks)
    bi = 0
    for si, st in enumerate(spec.stages):
        sp = params["stages"][si]
        ss = state["stages"][si]
        x = conv_embed(sp["embed"], x, stride=st.stride)
        bstates = []
        for d in range(st.depth):
            def block_fn(bp, bs_in, x_in, block_rng, _st=st):
                return conv_transformer_block(
                    bp, bs_in, x_in,
                    num_heads=_st.num_heads, kernel_size=_st.kernel_size,
                    strides=_st.strides, qkv_method=_st.qkv_method,
                    with_cls_token=_st.with_cls_token,
                    dropout_rate=_st.dropout_rate, train=train,
                    rng=block_rng, impl=impl, mlp_impl=mlp_impl,
                    mlp_bn=mlp_bn, axis_name=axis_name)
            if remat:
                block_fn = jax.checkpoint(block_fn)
            x, cls, bs = block_fn(sp["blocks"][d], ss["blocks"][d], x,
                                  rngs[bi])
            if cls is not None:
                cls_tokens = cls
            bstates.append(bs)
            bi += 1
        new_state["stages"].append({"blocks": bstates})
        features.append(x)

    if cls_tokens is not None:
        # cls head (ref models/CvT(Par).py:326-329)
        feat = layer_norm(params["head_norm"], cls_tokens, eps=1e-6)
        feat = feat[:, 0, :]
    else:
        # token-mean head (ref :334-337)
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        tokens = layer_norm(params["head_norm"], tokens, eps=1e-6)
        feat = jnp.mean(tokens, axis=1)

    if spec.proc_dim > 0:
        assert proc is not None, "spec.proc_dim > 0 requires proc inputs"
        p = jax.nn.relu(dense(params["proc_fc1"], proc))
        p = jax.nn.relu(dense(params["proc_fc2"], p))
        feat = jnp.concatenate([feat, p], axis=-1)

    out = dense(params["final"], feat)
    if return_features:
        return out, new_state, features
    return out, new_state


def cvt_param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
