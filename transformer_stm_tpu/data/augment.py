"""On-device augmentation (BASELINE.json config 4: flip/crop/jitter).

The reference's only augmentation is an *offline* 90/180/270 rotation tool
(tools/Rotate.py — shipped data does not include its outputs).  Here
augmentation runs on device inside the jitted train step: vectorised over
the batch, fused by XLA, costing no host round-trip.  All ops are
shape-static (random resized crop uses a fixed output size with dynamic
slice) so nothing recompiles.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class AugmentConfig(NamedTuple):
    horizontal_flip: bool = True
    vertical_flip: bool = False
    rot90: bool = True           # random 0/90/180/270 rotation
    crop_padding: int = 8        # pad-and-crop jitter, 0 = off
    brightness: float = 0.1      # multiplicative jitter amplitude, 0 = off
    contrast: float = 0.1        # contrast jitter amplitude, 0 = off


def augment_batch(rng, images, cfg: AugmentConfig = AugmentConfig()):
    """images (B, H, W, C) float in [0,1] -> augmented, same shape.

    Each sample draws independent augmentation parameters (vmapped)."""
    b = images.shape[0]
    keys = jax.random.split(rng, b)
    return jax.vmap(lambda k, im: _augment_one(k, im, cfg))(keys, images)


def _augment_one(rng, img, cfg: AugmentConfig):
    h, w, c = img.shape
    k_flip_h, k_flip_v, k_rot, k_crop, k_bright, k_cont = \
        jax.random.split(rng, 6)

    if cfg.horizontal_flip:
        img = jnp.where(jax.random.bernoulli(k_flip_h),
                        img[:, ::-1, :], img)
    if cfg.vertical_flip:
        img = jnp.where(jax.random.bernoulli(k_flip_v),
                        img[::-1, :, :], img)
    if cfg.rot90 and h == w:
        k = jax.random.randint(k_rot, (), 0, 4)
        img = jax.lax.switch(
            k,
            [lambda x: x,
             lambda x: jnp.rot90(x, 1, axes=(0, 1)),
             lambda x: jnp.rot90(x, 2, axes=(0, 1)),
             lambda x: jnp.rot90(x, 3, axes=(0, 1))],
            img)
    if cfg.crop_padding > 0:
        p = cfg.crop_padding
        padded = jnp.pad(img, ((p, p), (p, p), (0, 0)), mode="reflect")
        oy = jax.random.randint(k_crop, (), 0, 2 * p + 1)
        ox = jax.random.randint(jax.random.fold_in(k_crop, 1), (), 0,
                                2 * p + 1)
        img = jax.lax.dynamic_slice(padded, (oy, ox, 0), (h, w, c))
    if cfg.brightness > 0:
        scale = 1.0 + jax.random.uniform(
            k_bright, (), minval=-cfg.brightness, maxval=cfg.brightness)
        img = img * scale
    if cfg.contrast > 0:
        factor = 1.0 + jax.random.uniform(
            k_cont, (), minval=-cfg.contrast, maxval=cfg.contrast)
        mean = jnp.mean(img, axis=(0, 1), keepdims=True)
        img = (img - mean) * factor + mean
    return jnp.clip(img, 0.0, 1.0)
