"""Multi-head attention and the CvT ConvAttention.

``mha`` reproduces keras.layers.MultiHeadAttention numerics exactly
(per-head einsum projections with bias, 1/sqrt(key_dim) scaling, softmax,
output einsum back to the query dim) so that logits-parity with the reference
holds (reference usage: models/CvT(Par).py:137,185).  The inner
softmax(QK^T)V is routed either through plain XLA einsums or through the
Pallas flash-attention kernel (kernels/flash_attention.py) — both produce the
same values; the kernel wins on long sequences where the (T, S) score matrix
stops fitting in VMEM.

``conv_attention`` is the CvT attention block (reference: ConvAttention,
models/CvT(Par).py:115-191) including its quirks:
- q_proj uses 'linear' (identity) when qkv_method == 'avg' (ref :127);
- a *second* set of Dense projections proj_q/k/v after the conv projection
  (ref :180-182);
- Keras MHA called as attention(q, v, k) = (query, value, key) — i.e.
  standard attention on (q, k, v) (ref :185);
- attn_dropout constructed but never applied (ref :140); only the output
  projection has dropout (ref :188-189).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from .common import dense, dropout, glorot_uniform, init_dense, matmul_precision
from .projection import init_projection, projection


# ---------------------------------------------------------------------------
# Keras-parity multi-head attention
# ---------------------------------------------------------------------------

def init_mha(key, dim: int, num_heads: int, key_dim: Optional[int] = None,
             dtype=jnp.float32):
    """Keras MultiHeadAttention(num_heads, key_dim=dim//num_heads).

    Kernels: query/key/value (E, H, Dh) + bias (H, Dh); out (H, Dh, E) +
    bias (E,).  (reference: models/CvT(Par).py:137)
    """
    key_dim = key_dim if key_dim is not None else dim // num_heads
    ks = jax.random.split(key, 4)
    h, dh = num_heads, key_dim

    def qkv(k):
        return {
            "kernel": glorot_uniform(k, (dim, h, dh), fan_in=dim,
                                     fan_out=h * dh, dtype=dtype),
            "bias": jnp.zeros((h, dh), dtype),
        }

    return {
        "query": qkv(ks[0]),
        "key": qkv(ks[1]),
        "value": qkv(ks[2]),
        "out": {
            "kernel": glorot_uniform(ks[3], (h, dh, dim), fan_in=h * dh,
                                     fan_out=dim, dtype=dtype),
            "bias": jnp.zeros((dim,), dtype),
        },
    }


def _attention_core(q, k, v, *, impl: str = "auto"):
    """softmax(q k^T / sqrt(dh)) v with q,k,v: (B, T|S, H, Dh).

    impl: 'xla' | 'pallas' | 'auto'.  'auto' picks the Pallas flash kernel
    on TPU for long sequences, where the O(T*S) score materialisation
    dominates HBM traffic; at short lengths (<= ~1k tokens — every CvT
    stage and ViT @224) the materialised scores fit the HBM budget and
    XLA's fused path beats Mosaic's per-grid-step overhead (measured on
    v5e: 12-layer ViT-S attention 23ms XLA vs 98ms kernel at 197 tokens).
    """
    if impl == "auto":
        # Measured routing (Result/attention_sweep.json, v5e, scanned
        # timing): attention_small beats XLA 3-4x fwd AND bwd from the
        # CvT's 1,024-token stage up through 9,216 tokens (native-Dh
        # whole-KV-in-VMEM beats both XLA's HBM score traffic and the
        # streaming kernel's running-softmax overhead); below ~200k score
        # entries/head (ViT @224 = 39k) XLA's fused path still wins the
        # forward.  Also route to the kernel whenever the XLA f32 score
        # buffer would be HBM-dangerous (the multi-target trainer's
        # vmapped batches: 20x128 x 1,024 tokens = 10.7 GB).
        entries = q.shape[1] * k.shape[1]
        h = q.shape[2]
        score_bytes = 4 * h * entries * q.shape[0]
        big_scores = score_bytes > (1 << 30)
        # measurement override: lets the sweep/probes re-derive the
        # threshold without editing routing code
        min_entries = int(os.environ.get("TSTM_SMALL_MIN_ENTRIES",
                                         "300000"))
        if jax.default_backend() != "tpu":
            impl = "xla"
        elif entries > min_entries or big_scores:
            # whole K/V per program fits VMEM to ~9k tokens (the 16k
            # train config measured 16.01M/16M scoped vmem — the
            # double-buffered K/V windows are the floor); beyond that the
            # streaming kernel takes over
            impl = "small" if k.shape[1] < 16384 else "pallas"
        else:
            impl = "xla"
    if impl in ("pallas", "flash"):
        from ..kernels.flash_attention import flash_attention
        return flash_attention(q, k, v)
    if impl in ("small", "pallas_small"):
        from ..kernels.flash_attention import attention_small
        return attention_small(q, k, v)
    if impl != "xla":
        raise ValueError(f"unknown attention impl {impl!r} (want 'auto' | "
                         "'xla' | 'pallas' | 'flash' | 'small')")
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32)).astype(q.dtype)
    prec = matmul_precision(q.dtype)
    scores = jnp.einsum("bthd,bshd->bhts", q * scale, k,
                        preferred_element_type=jnp.float32, precision=prec)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v,
                      preferred_element_type=q.dtype, precision=prec)


def mha(params, query, key, value, *, impl: str = "auto"):
    """(B, T, E) x (B, S, E) x (B, S, E) -> (B, T, E), Keras numerics."""
    b, t, e = query.shape
    h, dh = params["query"]["bias"].shape

    def proj_in(p, x):
        y = jnp.einsum("bse,ehd->bshd", x, p["kernel"].astype(x.dtype),
                       precision=matmul_precision(x.dtype))
        return y + p["bias"].astype(x.dtype)

    q = proj_in(params["query"], query)
    k = proj_in(params["key"], key)
    v = proj_in(params["value"], value)
    o = _attention_core(q, k, v, impl=impl)
    out = jnp.einsum("bthd,hde->bte", o,
                     params["out"]["kernel"].astype(o.dtype),
                     precision=matmul_precision(o.dtype))
    return out + params["out"]["bias"].astype(out.dtype)


# ---------------------------------------------------------------------------
# CvT ConvAttention
# ---------------------------------------------------------------------------

def init_conv_attention(key, dim: int, num_heads: int, kernel_size: int,
                        qkv_method: str = "dw_bn", dtype=jnp.float32):
    """Returns (params, state)."""
    ks = jax.random.split(key, 8)
    q_method = "linear" if qkv_method == "avg" else qkv_method
    q_proj, q_state = init_projection(ks[0], dim, kernel_size, q_method, dtype)
    k_proj, k_state = init_projection(ks[1], dim, kernel_size, qkv_method, dtype)
    v_proj, v_state = init_projection(ks[2], dim, kernel_size, qkv_method, dtype)
    params = {
        "q_proj": q_proj, "k_proj": k_proj, "v_proj": v_proj,
        "proj_q": init_dense(ks[3], dim, dim, dtype=dtype),
        "proj_k": init_dense(ks[4], dim, dim, dtype=dtype),
        "proj_v": init_dense(ks[5], dim, dim, dtype=dtype),
        "mha": init_mha(ks[6], dim, num_heads, dtype=dtype),
        "proj": init_dense(ks[7], dim, dim, dtype=dtype),
    }
    state = {"q_proj": q_state, "k_proj": k_state, "v_proj": v_state}
    return params, state


def conv_attention(params, state, x, height: int, width: int, *,
                   num_heads: int, kernel_size: int, strides: int = 1,
                   qkv_method: str = "dw_bn", with_cls_token: bool = False,
                   proj_drop: float = 0.1, train: bool = False,
                   rng=None, impl: str = "auto", axis_name=None):
    """x: (B, N, C) tokens (N = H*W [+1 cls at front]). Returns (y, state).

    Shape trace mirrors reference models/CvT(Par).py:144-191.
    """
    b = x.shape[0]
    c = x.shape[2]
    if with_cls_token:
        cls_tokens, grid = x[:, :1, :], x[:, 1:, :]
    else:
        cls_tokens, grid = None, x
    grid = grid.reshape(b, height, width, c)

    q_method = "linear" if qkv_method == "avg" else qkv_method
    q, q_state = projection(params["q_proj"], state["q_proj"], grid,
                            kernel_size=kernel_size, stride=strides,
                            method=q_method, train=train, axis_name=axis_name)
    k, k_state = projection(params["k_proj"], state["k_proj"], grid,
                            kernel_size=kernel_size, stride=strides,
                            method=qkv_method, train=train, axis_name=axis_name)
    v, v_state = projection(params["v_proj"], state["v_proj"], grid,
                            kernel_size=kernel_size, stride=strides,
                            method=qkv_method, train=train, axis_name=axis_name)
    new_state = {"q_proj": q_state, "k_proj": k_state, "v_proj": v_state}

    q = q.reshape(b, -1, c)
    k = k.reshape(b, -1, c)
    v = v.reshape(b, -1, c)
    if with_cls_token:
        q = jnp.concatenate([cls_tokens, q], axis=1)
        k = jnp.concatenate([cls_tokens, k], axis=1)
        v = jnp.concatenate([cls_tokens, v], axis=1)

    q = dense(params["proj_q"], q)
    k = dense(params["proj_k"], k)
    v = dense(params["proj_v"], v)

    # Reference calls attention(q, v, k) = Keras (query, value, key)
    # => standard attention(q, k, v) (models/CvT(Par).py:185).
    attn_out = mha(params["mha"], q, k, v, impl=impl)

    out = dense(params["proj"], attn_out)
    if train and proj_drop > 0.0:
        out = dropout(rng, out, proj_drop, train)
    return out, new_state
