"""Plain ViT classifiers (ViT-Ti/S/B /16) for the BASELINE.json configs:
224px SLS image classification with patchify -> pre-norm encoder -> head.

The CvT is a ViT-family encoder (conv token embedding + conv QKV projection);
this is the vanilla variant the north-star benchmark configs name
(BASELINE.json configs 1-3).  Attention and MLP route through the same
kernels as the CvT (kernels/flash_attention.py, kernels/fused_mlp.py).

Standard pre-norm block (distinct norm2, unlike the reference CvT's shared
norm1 quirk): x += MHA(LN1(x)); x += MLP(LN2(x)).  Learned position
embeddings, learnable zero-init cls token, LN head.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ViTSpec
from ..ops import (
    dense, dropout, init_dense, init_layer_norm, init_mha, layer_norm, mha,
)
from ..ops.blocks import init_mlp, mlp
from ..ops.common import glorot_uniform


def init_vit(key, spec: ViTSpec, dtype=jnp.float32):
    n_patches = (spec.image_size // spec.patch_size) ** 2
    patch_dim = spec.patch_size * spec.patch_size * spec.num_channels
    keys = jax.random.split(key, 3 * spec.depth + 4)
    params = {
        "patch_embed": init_dense(keys[0], patch_dim, spec.embed_dim,
                                  dtype=dtype),
        "pos_embed": jax.random.normal(
            keys[1], (1, n_patches + 1, spec.embed_dim), dtype) * 0.02,
        "cls_token": jnp.zeros((1, 1, spec.embed_dim), dtype),
        "blocks": [],
        "head_norm": init_layer_norm(spec.embed_dim, dtype),
        "head": init_dense(keys[2], spec.embed_dim, spec.num_classes,
                           dtype=dtype),
    }
    for d in range(spec.depth):
        k1, k2 = keys[3 + 2 * d], keys[4 + 2 * d]
        params["blocks"].append({
            "norm1": init_layer_norm(spec.embed_dim, dtype),
            "attn": init_mha(k1, spec.embed_dim, spec.num_heads, dtype=dtype),
            "norm2": init_layer_norm(spec.embed_dim, dtype),
            "mlp": init_mlp(k2, spec.embed_dim,
                            spec.embed_dim * spec.mlp_ratio, dtype=dtype),
        })
    return params


def patchify(images, patch_size: int):
    """(B, H, W, C) -> (B, N, P*P*C) non-overlapping patches.

    Pure reshape/transpose — fuses into the following matmul under XLA, so
    the patch embed is a single MXU matmul over the batch of patches.
    """
    b, h, w, c = images.shape
    p = patch_size
    x = images.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // p) * (w // p), p * p * c)


def vit_forward(params, spec: ViTSpec, images, *, train: bool = False,
                rng=None, impl: str = "auto", mlp_impl: str = None):
    """images: (B, H, W, C) -> logits (B, num_classes).

    impl routes the attention core; mlp_impl (default: follow impl) routes
    the MLP separately so e.g. impl='small' attention can pair with the
    fused Pallas inference MLP (same split as conv_transformer_block).
    impl='fused' (inference only) runs each layer as two fused Pallas
    kernels (kernels/fused_layer.py) with the token rows kept folded in
    HBM across all layers — the bandwidth-floor path for the @224
    throughput configs.  'auto' picks it for TPU inference (override with
    TSTM_VIT_INFER=xla|small|fused)."""
    if impl == "auto" and not train and jax.default_backend() == "tpu" \
            and images.dtype == jnp.bfloat16:
        # bf16 only: inside the kernel, f32 matmuls run as single-pass
        # bf16 on the MXU (measured 1e-2 drift vs XLA's multi-pass f32),
        # so full-precision inference keeps the composable path
        import os

        # fused2 (merged packed projections) is the measured winner:
        # 11,000 img/s at B=192-384 vs 8,782 XLA / v1-fused erroring on
        # hardware (Result/fused_layer_probe.json, round 4)
        impl = os.environ.get("TSTM_VIT_INFER", "fused2")
        if impl in ("fused", "fused2"):
            # large-token / wider-than-ViT-B configs overflow the fused
            # kernels' scoped VMEM even at bi=1 — fall back to the
            # streaming composable path instead of failing to compile
            from ..kernels.fused_layer import fused_layer_fits

            t = (images.shape[1] // spec.patch_size) * \
                (images.shape[2] // spec.patch_size) + 1
            if not fused_layer_fits(((t + 7) // 8) * 8, spec.embed_dim,
                                    spec.num_heads,
                                    spec.embed_dim // spec.num_heads,
                                    spec.embed_dim * spec.mlp_ratio, 2,
                                    merged=(impl == "fused2")):
                impl = "small"
    if impl in ("fused", "fused2", "fused2_int8"):
        if train:
            raise ValueError(f"impl={impl!r} is inference-only")
        return _vit_forward_fused(params, spec, images,
                                  merged=(impl != "fused"),
                                  int8=(impl == "fused2_int8"))
    x = patchify(images, spec.patch_size)
    x = dense(params["patch_embed"], x)
    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                           (b, 1, spec.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)

    rngs = (jax.random.split(rng, spec.depth) if rng is not None
            else [None] * spec.depth)
    for d, blk in enumerate(params["blocks"]):
        y = layer_norm(blk["norm1"], x, eps=1e-6)
        y = mha(blk["attn"], y, y, y, impl=impl)
        if train and spec.dropout_rate > 0.0:
            r1, r2 = jax.random.split(rngs[d])
            y = dropout(r1, y, spec.dropout_rate, train)
        else:
            r2 = rngs[d]
        x = x + y
        y = layer_norm(blk["norm2"], x, eps=1e-6)
        y = mlp(blk["mlp"], y, dropout_rate=spec.dropout_rate, train=train,
                rng=r2, impl=mlp_impl if mlp_impl is not None else impl)
        x = x + y

    x = layer_norm(params["head_norm"], x, eps=1e-6)
    return dense(params["head"], x[:, 0, :])


def _vit_forward_fused(params, spec: ViTSpec, images, merged: bool = False,
                       int8: bool = False):
    """Fused-layer inference: fold (B, T, E) -> (B * t_pad, E) once, run
    every layer as attn_layer_infer + ln_mlp_infer (each one pallas_call,
    HBM sees only the x read + y write), unfold at the head.  merged=True
    runs both sublayers in ONE pallas_call per layer (vit_layer_infer);
    int8=True additionally runs all six projections on the MXU's
    double-rate int8 path (vit_layer_infer_int8 — opt-in serving mode,
    ~1% numeric drift, never picked by impl='auto')."""
    from ..kernels.fused_layer import (attn_layer_infer, ln_mlp_infer,
                                       vit_layer_infer,
                                       vit_layer_infer_int8)

    x = patchify(images, spec.patch_size)
    x = dense(params["patch_embed"], x)
    b, n_p, e = x.shape
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (b, 1, e))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)

    t = n_p + 1
    t_pad = ((t + 7) // 8) * 8
    x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    x = x.reshape(b * t_pad, e)
    for blk in params["blocks"]:
        if merged:
            layer_fn = vit_layer_infer_int8 if int8 else vit_layer_infer
            x = layer_fn(x, blk["norm1"], blk["attn"],
                         blk["norm2"], blk["mlp"],
                         t_pad=t_pad, t_real=t)
        else:
            x = attn_layer_infer(x, blk["norm1"], blk["attn"],
                                 t_pad=t_pad, t_real=t)
            x = ln_mlp_infer(x, blk["norm2"], blk["mlp"])
    x_cls = x.reshape(b, t_pad, e)[:, :1, :]
    x_cls = layer_norm(params["head_norm"], x_cls, eps=1e-6)
    return dense(params["head"], x_cls[:, 0, :])


def classify_image(params, spec: ViTSpec, path: str, *,
                   impl: str = "auto"):
    """Single-image end-to-end classification (BASELINE.json config 1:
    decode -> resize/normalize -> patchify -> encoder -> softmax), runs on
    any backend incl. CPU.

    Returns (probs (num_classes,), top1 int).  Decode uses the native C++
    loader when available, else cv2/PIL.
    """
    import numpy as np

    size = spec.image_size
    if spec.num_channels == 1:
        from ..data import native

        if native.available():
            gray = native.decode_batch([path], size, size)[0]
        else:
            import cv2

            bgr = cv2.imread(path)
            gray = cv2.cvtColor(cv2.resize(bgr, (size, size)),
                                cv2.COLOR_BGR2GRAY)
        img = gray.astype(np.float32)[None, :, :, None] / 255.0
    else:
        import cv2

        bgr = cv2.imread(path)
        rgb = cv2.cvtColor(cv2.resize(bgr, (size, size)),
                           cv2.COLOR_BGR2RGB)
        img = rgb.astype(np.float32)[None] / 255.0

    logits = vit_forward(params, spec, jnp.asarray(img), train=False,
                         impl=impl)
    probs = jax.nn.softmax(logits[0].astype(jnp.float32))
    return np.asarray(probs), int(jnp.argmax(probs))
