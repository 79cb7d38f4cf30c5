"""Transformer blocks: GELU MLP and the CvT ConvTransformerBlock
(reference: models/CvT(Par).py:231-289).

Quirks preserved from the reference block:
- the *same* LayerNorm instance is applied both before attention and before
  the MLP (shared weights, no norm2 — models/CvT(Par).py:272,278);
- the cls token is a zero-initialised (1, 1, 1, D) weight tiled per batch
  (models/CvT(Par).py:245,265-268);
- ``output_conv`` is constructed but never called (models/CvT(Par).py:259) —
  not replicated (it holds no reachable state);
- MLP = Dense(4D, gelu-exact) > Dropout(0.1) > Dense(D) > Dropout(0.1)
  (models/CvT(Par).py:253-258).

The MLP can be routed through the fused Pallas kernel
(kernels/fused_mlp.py) in inference mode on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .attention import conv_attention, init_conv_attention
from .common import dense, dropout, gelu, init_dense, init_layer_norm, layer_norm


# ---------------------------------------------------------------------------
# MLP
# ---------------------------------------------------------------------------

def init_mlp(key, dim: int, hidden_dim: int, out_dim: Optional[int] = None,
             dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_dense(k1, dim, hidden_dim, dtype=dtype),
        "fc2": init_dense(k2, hidden_dim, out_dim or dim, dtype=dtype),
    }


def mlp(params, x, *, dropout_rate: float = 0.1, train: bool = False,
        rng=None, impl: str = "auto", mlp_bn: int = None):
    """Dense->GELU->Drop->Dense->Drop.  In inference the two matmuls + GELU
    fuse into one Pallas kernel on TPU (identical numerics).  In training,
    impl='pallas' routes through the fused custom_vjp kernel
    (kernels/fused_mlp.make_fused_mlp_train): fwd AND bwd keep the 4x
    hidden out of HBM, with in-kernel dropout (equal-distribution Bernoulli
    on the TPU core PRNG — a different stream than the jax.random XLA
    path, same semantics)."""
    if impl == "auto":
        impl = ("pallas" if (jax.default_backend() == "tpu" and not train)
                else "xla")
    if train and dropout_rate > 0.0 and rng is None:
        # match the XLA path's failure mode with a clear message instead of
        # silently reusing an all-zero dropout seed every step
        raise ValueError("mlp: train=True with dropout_rate>0 requires rng")
    if impl in ("pallas", "flash") and train:
        from ..kernels.fused_mlp import make_fused_mlp_train
        rate = dropout_rate if dropout_rate > 0.0 else 0.0
        seed = (jnp.zeros((2,), jnp.int32) if rate == 0.0
                else jax.random.randint(rng, (2,), 0, 2 ** 31 - 1,
                                        jnp.int32))
        f = make_fused_mlp_train(rate, bn=mlp_bn)
        return f(x, params["fc1"]["kernel"], params["fc1"]["bias"],
                 params["fc2"]["kernel"], params["fc2"]["bias"], seed)
    if impl in ("pallas", "flash") and not train:
        from ..kernels.fused_mlp import fused_mlp
        return fused_mlp(x, params["fc1"]["kernel"], params["fc1"]["bias"],
                         params["fc2"]["kernel"], params["fc2"]["bias"])
    y = gelu(dense(params["fc1"], x))
    if train and dropout_rate > 0.0:
        r1, r2 = jax.random.split(rng)
        y = dropout(r1, y, dropout_rate, train)
        y = dense(params["fc2"], y)
        y = dropout(r2, y, dropout_rate, train)
        return y
    return dense(params["fc2"], y)


# ---------------------------------------------------------------------------
# ConvTransformerBlock
# ---------------------------------------------------------------------------

def init_conv_transformer_block(key, dim: int, num_heads: int,
                                kernel_size: int, qkv_method: str = "dw_bn",
                                mlp_ratio: int = 4,
                                with_cls_token: bool = False,
                                dtype=jnp.float32):
    """Returns (params, state)."""
    k_attn, k_mlp = jax.random.split(key)
    attn_params, attn_state = init_conv_attention(
        k_attn, dim, num_heads, kernel_size, qkv_method, dtype)
    params = {
        "norm1": init_layer_norm(dim, dtype),  # shared: attn AND mlp pre-norm
        "attn": attn_params,
        "mlp": init_mlp(k_mlp, dim, dim * mlp_ratio, dtype=dtype),
    }
    if with_cls_token:
        params["cls_token"] = jnp.zeros((1, 1, dim), dtype)
    return params, {"attn": attn_state}


def conv_transformer_block(params, state, x, *, num_heads: int,
                           kernel_size: int, strides: int = 1,
                           qkv_method: str = "dw_bn",
                           with_cls_token: bool = False,
                           dropout_rate: float = 0.1, train: bool = False,
                           rng=None, impl: str = "auto", mlp_impl=None,
                           mlp_bn: int = None, axis_name=None):
    """x: (B, H, W, C) -> ((B, H, W, C), cls (B, 1, C) | None, new_state).

    Mirrors reference models/CvT(Par).py:261-289.
    """
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    if with_cls_token:
        cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (b, 1, c))
        tokens = jnp.concatenate([cls, tokens], axis=1)

    if rng is not None:
        rng_attn, rng_mlp = jax.random.split(rng)
    else:
        rng_attn = rng_mlp = None

    y = layer_norm(params["norm1"], tokens, eps=1e-6)
    attn_out, attn_state = conv_attention(
        params["attn"], state["attn"], y, h, w, num_heads=num_heads,
        kernel_size=kernel_size, strides=strides, qkv_method=qkv_method,
        with_cls_token=with_cls_token, proj_drop=dropout_rate, train=train,
        rng=rng_attn, impl=impl, axis_name=axis_name)
    tokens = attn_out + tokens

    # Reference reuses norm1 (shared weights) before the MLP (:278).
    y = layer_norm(params["norm1"], tokens, eps=1e-6)
    tokens = tokens + mlp(params["mlp"], y, dropout_rate=dropout_rate,
                          train=train, rng=rng_mlp,
                          impl=mlp_impl if mlp_impl is not None else impl,
                          mlp_bn=mlp_bn)

    new_state = {"attn": attn_state}
    if with_cls_token:
        cls_out, grid = tokens[:, :1, :], tokens[:, 1:, :]
        return grid.reshape(b, h, w, c), cls_out, new_state
    return tokens.reshape(b, h, w, c), None, new_state
