"""Grad-CAM for the CvT (reference: tools/grad_cam_CvT.py:422-481).

The reference builds a second Keras model exposing the stage-3 transformer
output and differentiates with GradientTape; in JAX the same thing is one
``jax.grad`` through the head with respect to the stage-3 feature map:

  heatmap = ReLU( sum_c  mean_hw(d pred / d fmap)_c * fmap_c ) / max

(channel-mean pooled gradients as weights, reference :460-472), then JET
colormap overlay at 0.4 alpha (reference :537-548).

Not replicated (documented reference bugs, SURVEY.md do-not-replicate list):
the stale weight-name pattern (:513) and the swapped plt.savefig args (:596).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import CvTSpec
from ..models.cvt import cvt_forward


def gradcam_heatmaps(params, state, spec: CvTSpec, images, proc=None,
                     stage: int = -1):
    """images (B, H, W, C), proc (B, P) -> (heatmaps (B, h, w), preds (B,)).

    heatmap resolution = the chosen stage's grid (stage 3: 8x8 at 128px).
    """
    n_stages = len(spec.stages)
    stage = stage % n_stages

    def fwd_with_sub(sub_feats):
        out = _forward_substituting(params, state, spec, images, proc,
                                    stage, sub_feats)
        return jnp.sum(out[:, 0])  # d(sum preds)/d(feats) = per-sample grads

    _, _, features = cvt_forward(params, state, spec, images, proc,
                                 train=False, return_features=True)
    feats = features[stage]
    grads = jax.grad(fwd_with_sub)(feats)
    preds = _forward_substituting(params, state, spec, images, proc, stage,
                                  feats)[:, 0]

    pooled = jnp.mean(grads, axis=(1, 2), keepdims=True)  # (B,1,1,C) weights
    cam = jnp.sum(pooled * feats, axis=-1)  # (B, h, w)
    cam = jnp.maximum(cam, 0.0)
    denom = jnp.maximum(jnp.max(cam, axis=(1, 2), keepdims=True), 1e-10)
    return np.asarray(cam / denom), np.asarray(preds)


def _forward_substituting(params, state, spec, images, proc, stage,
                          sub_feats):
    """cvt_forward but with the given stage's block output replaced by
    sub_feats (identical values in the unperturbed evaluation; the
    substitution point defines where gradients are taken)."""
    from ..ops import conv_embed, conv_transformer_block, dense, layer_norm

    x = images
    cls_tokens = None
    for si, st in enumerate(spec.stages):
        sp = params["stages"][si]
        ss = state["stages"][si]
        x = conv_embed(sp["embed"], x, stride=st.stride)
        for d in range(st.depth):
            x, cls, _ = conv_transformer_block(
                sp["blocks"][d], ss["blocks"][d], x,
                num_heads=st.num_heads, kernel_size=st.kernel_size,
                strides=st.strides, qkv_method=st.qkv_method,
                with_cls_token=st.with_cls_token,
                dropout_rate=st.dropout_rate, train=False, impl="xla")
            if cls is not None:
                cls_tokens = cls
        if si == stage:
            x = sub_feats

    if cls_tokens is not None and spec.stages[-1].with_cls_token:
        # cls head: note the cls token does NOT flow through sub_feats; the
        # reference grad-cam variant uses the GAP head for this reason
        # (tools/grad_cam_CvT.py:316-350 rebuilds with a GAP head).
        b, h, w, c = x.shape
        tokens = layer_norm(params["head_norm"], x.reshape(b, h * w, c),
                            eps=1e-6)
        feat = jnp.mean(tokens, axis=1)
    else:
        b, h, w, c = x.shape
        tokens = layer_norm(params["head_norm"], x.reshape(b, h * w, c),
                            eps=1e-6)
        feat = jnp.mean(tokens, axis=1)

    if spec.proc_dim > 0 and proc is not None:
        p = jax.nn.relu(dense(params["proc_fc1"], proc))
        p = jax.nn.relu(dense(params["proc_fc2"], p))
        feat = jnp.concatenate([feat, p], axis=-1)
    return dense(params["final"], feat)


def overlay_heatmap(image_gray: np.ndarray, heatmap: np.ndarray,
                    alpha: float = 0.4) -> np.ndarray:
    """JET-colormap overlay (reference: tools/grad_cam_CvT.py:537-548).
    image_gray (H, W) in [0,1], heatmap (h, w) in [0,1] -> (H, W, 3) RGB."""
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import cm

    h, w = image_gray.shape
    # bilinear upscale of the heatmap to image size
    yi = np.linspace(0, heatmap.shape[0] - 1, h)
    xi = np.linspace(0, heatmap.shape[1] - 1, w)
    y0 = np.floor(yi).astype(int)
    x0 = np.floor(xi).astype(int)
    y1 = np.minimum(y0 + 1, heatmap.shape[0] - 1)
    x1 = np.minimum(x0 + 1, heatmap.shape[1] - 1)
    wy = (yi - y0)[:, None]
    wx = (xi - x0)[None, :]
    hm = (heatmap[np.ix_(y0, x0)] * (1 - wy) * (1 - wx)
          + heatmap[np.ix_(y1, x0)] * wy * (1 - wx)
          + heatmap[np.ix_(y0, x1)] * (1 - wy) * wx
          + heatmap[np.ix_(y1, x1)] * wy * wx)
    jet = cm.jet(hm)[:, :, :3]
    base = np.stack([image_gray] * 3, axis=-1)
    return np.clip(base + alpha * jet, 0, 1)


def save_gradcam_panel(path: str, image_gray: np.ndarray,
                       heatmap: np.ndarray, pred: float,
                       actual: Optional[float] = None) -> None:
    """4-panel dump: original / heatmap / overlay / annotated
    (reference: tools/grad_cam_CvT.py:532-598)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 4, figsize=(16, 4))
    axes[0].imshow(image_gray, cmap="gray")
    axes[0].set_title("input")
    axes[1].imshow(heatmap, cmap="jet")
    axes[1].set_title("Grad-CAM")
    axes[2].imshow(overlay_heatmap(image_gray, heatmap))
    axes[2].set_title("overlay")
    axes[3].imshow(overlay_heatmap(image_gray, heatmap))
    title = f"pred: {pred:.2f}"
    if actual is not None:
        title += f" / actual: {actual:.2f}"
    axes[3].set_title(title)
    for ax in axes:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
