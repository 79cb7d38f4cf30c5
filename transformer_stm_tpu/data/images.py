"""Image pipeline: host decode to a shared cache + on-device preprocessing.

Reference pipeline (models/CvT(Par).py:411-426): per valid specimen, 200
JPEGs, each cv2.imread (BGR) -> cv2.resize to (W, H) INTER_LINEAR ->
BGR2GRAY -> /255.  Crucially the reference re-runs this full decode for each
of the 20 targets (models/CvT(Par).py:499-504) — 20x redundant work.

Here the corpus is decoded **once** into a uint8 memmap cache
(specimen-major, already resized+grayscaled, cv2-bit-exact) shared by all
targets and repeat runs; per-target loading is then pure indexing.  The
normalize (/255) runs on device where it fuses into the first conv.

For the throughput path (BASELINE.json config 2) ``preprocess_images_device``
performs resize -> BT.601 grayscale -> normalize entirely on the TPU from raw
RGB uint8 batches, so the host only decodes JPEGs.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

from ..config import DataConfig
from .labels import LabelTable, ProcessTable, build_target_arrays


def _specimen_dir(cfg: DataConfig, spec_idx: int) -> str:
    """Specimen row -> data folder (models/CvT(Par).py:412-416)."""
    pieces = cfg.piece_num_end - cfg.piece_num_start + 1
    group = spec_idx // pieces + 1
    piece = spec_idx % pieces + 1
    return os.path.join(cfg.data_root,
                        f"circle(340x345)/trail{group:01d}_{piece:02d}")


def decode_specimen(cfg: DataConfig, spec_idx: int,
                    use_native: Optional[bool] = None) -> np.ndarray:
    """Decode one specimen's image_layers JPEGs -> (L, H, W) uint8 gray,
    bit-exact with the reference's cv2 pipeline (resize INTER_LINEAR on the
    3-channel image first, then BGR2GRAY — order matters).

    Fast path: the native C++ loader (data/native.py — threaded libjpeg
    decode + OpenCV-fixed-point resize/gray, bit-identical to cv2, verified
    in tests/test_native.py).  Falls back to cv2 per image.
    """
    folder = _specimen_dir(cfg, spec_idx)
    paths = [os.path.join(folder, f"layer_{i + 1:02d}.jpg")
             for i in range(cfg.image_layers)]

    if use_native is not False:
        from . import native
        if native.available():
            try:
                return native.decode_batch(paths, cfg.image_height,
                                           cfg.image_width)
            except IOError:
                pass  # fall through to cv2 for a precise error

    import cv2

    out = np.empty((cfg.image_layers, cfg.image_height, cfg.image_width),
                   np.uint8)
    for i, fn in enumerate(paths):
        img = cv2.imread(fn)
        if img is None:
            raise FileNotFoundError(fn)
        img = cv2.resize(img, (cfg.image_width, cfg.image_height))
        out[i] = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    return out


def _cache_paths(cfg: DataConfig) -> Tuple[str, str]:
    tag = f"{cfg.image_height}x{cfg.image_width}_L{cfg.image_layers}"
    base = os.path.join(cfg.cache_dir, f"corpus_{tag}")
    return base + ".npy", base + ".json"


def decode_corpus(cfg: DataConfig, specimen_indices=None,
                  verbose: bool = True) -> np.ndarray:
    """Decode (or load from cache) the whole corpus as a memmap
    (n_specimens, L, H, W) uint8.  Decoded once; every target/repeat reuses
    it — fixing the reference's 20x redundant decode for free."""
    pieces = cfg.piece_num_end - cfg.piece_num_start + 1
    n_spec = cfg.group_end * pieces
    npy, meta = _cache_paths(cfg)
    if os.path.exists(npy) and os.path.exists(meta):
        with open(meta) as f:
            done = set(json.load(f)["decoded"])
    else:
        os.makedirs(cfg.cache_dir, exist_ok=True)
        arr = np.lib.format.open_memmap(
            npy, mode="w+", dtype=np.uint8,
            shape=(n_spec, cfg.image_layers, cfg.image_height,
                   cfg.image_width))
        del arr
        done = set()

    wanted = (list(range(n_spec)) if specimen_indices is None
              else [int(i) for i in specimen_indices])
    missing = [i for i in wanted if i not in done]
    if missing:
        arr = np.lib.format.open_memmap(npy, mode="r+")
        for n, idx in enumerate(missing):
            arr[idx] = decode_specimen(cfg, idx)
            done.add(idx)
            if verbose and (n + 1) % 20 == 0:
                print(f"decoded {n + 1}/{len(missing)} specimens")
        arr.flush()
        del arr
        with open(meta, "w") as f:
            json.dump({"decoded": sorted(done)}, f)
    return np.lib.format.open_memmap(npy, mode="r")


def load_dataset(cfg: DataConfig, freq: str, labels: Optional[LabelTable] = None,
                 procs: Optional[ProcessTable] = None,
                 with_images: bool = True):
    """Full per-target dataset with the reference's array layout.

    Returns dict: images (N, H, W, 1) uint8 (normalize on device),
    labels (N,), proc_scaled (N, 5), valid_indices, count.
    N = V * image_layers in specimen order (models/CvT(Par).py:409-426).
    with_images=False skips the decode (params-only FFN runs).
    """
    labels = labels or LabelTable.load(cfg.excel_labels)
    procs = procs or ProcessTable.load(cfg.excel_process)
    t = build_target_arrays(cfg, freq, labels, procs)
    if with_images:
        corpus = decode_corpus(cfg, t["valid_indices"])
        imgs = corpus[t["valid_indices"]]  # (V, L, H, W)
        v, l, h, w = imgs.shape
        t["images"] = np.asarray(imgs).reshape(v * l, h, w, 1)
    return t


def normalize_images(x):
    """uint8 -> float in [0, 1] (models/CvT(Par).py:423). On device this is
    a cheap cast that XLA fuses into the first conv."""
    import jax.numpy as jnp
    return x.astype(jnp.float32) / 255.0


def preprocess_images_device(rgb, out_h: int, out_w: int,
                             dtype=None, antialias: bool = False):
    """Fused on-device preprocessing (BASELINE.json config 2): raw RGB uint8
    (B, H0, W0, 3) -> resized, BT.601-grayscaled, normalized (B, h, w, 1).

    antialias=False reproduces cv2 INTER_LINEAR downscaling (plain bilinear
    with half-pixel centers, 2x2 taps — matches the reference pipeline to
    ~3e-3, bounded by cv2's uint8 intermediate rounding); antialias=True
    gives the better-quality box-filtered downscale.  Grayscale uses the
    BT.601 weights cv2's BGR2GRAY applies (0.299 R + 0.587 G + 0.114 B).
    Everything is one XLA fusion on TPU — no host round-trip after JPEG
    decode.
    """
    import jax.numpy as jnp
    import jax

    x = rgb.astype(jnp.float32)
    b, h0, w0, c = x.shape
    x = jax.image.resize(x, (b, out_h, out_w, c), method="linear",
                         antialias=antialias)
    weights = jnp.array([0.299, 0.587, 0.114], jnp.float32)
    gray = jnp.einsum("bhwc,c->bhw", x, weights)
    gray = gray / 255.0
    if dtype is not None:
        gray = gray.astype(dtype)
    return gray[..., None]
