"""Native C++ preprocessing library vs the cv2 reference pipeline.

The library (native/preprocess.cpp) must be BIT-IDENTICAL to
cv2.imread -> cv2.resize(INTER_LINEAR) -> cv2.cvtColor(BGR2GRAY)
(the reference pipeline, models/CvT(Par).py:418-423) — it replicates
OpenCV's fixed-point coefficients and the specialised uchar vertical pass.
"""

import glob
import os

import numpy as np
import pytest

from transformer_stm_tpu.data import native

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no g++?)")


def _cv2_pipeline(path, h, w):
    import cv2

    bgr = cv2.imread(path)
    return cv2.cvtColor(cv2.resize(bgr, (w, h)), cv2.COLOR_BGR2GRAY)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_decode_batch_bit_exact_vs_cv2():
    paths = sorted(glob.glob(
        f"{REF}/data/circle(340x345)/trail*/layer_0*.jpg"))[:30]
    got = native.decode_batch(paths, 128, 128)
    for p, g in zip(paths, got):
        np.testing.assert_array_equal(g, _cv2_pipeline(p, 128, 128))


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
@pytest.mark.parametrize("size", [(64, 64), (224, 224), (345, 340),
                                  (512, 512), (100, 50)])
def test_resize_gray_sizes(size):
    """Other target sizes: cv2's IPP fast path rounds some size/ratio
    combinations differently by at most 1 LSB — bound it (the reference's
    own 345x340 -> 128x128 case is bit-exact, tested above)."""
    import cv2

    h, w = size
    fn = f"{REF}/data/circle(340x345)/trail1_01/layer_01.jpg"
    bgr = cv2.imread(fn)
    ref = cv2.cvtColor(cv2.resize(bgr, (w, h)), cv2.COLOR_BGR2GRAY)
    got = native.resize_gray(bgr, h, w)
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02


def test_resize_gray_synthetic():
    """Random synthetic input, no JPEG involved (same <=1 LSB bound)."""
    import cv2

    rng = np.random.default_rng(0)
    bgr = rng.integers(0, 256, (97, 131, 3), dtype=np.uint8)
    ref = cv2.cvtColor(cv2.resize(bgr, (64, 48)), cv2.COLOR_BGR2GRAY)
    got = native.resize_gray(bgr, 48, 64)
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_decode_batch_missing_file_raises():
    with pytest.raises(IOError):
        native.decode_batch(["/nonexistent/file.jpg"], 32, 32)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_decode_specimen_uses_native_and_matches_cv2_path():
    import dataclasses

    from transformer_stm_tpu.config import DataConfig
    from transformer_stm_tpu.data.images import decode_specimen

    cfg = dataclasses.replace(DataConfig(), image_layers=4)
    nat = decode_specimen(cfg, 0, use_native=True)
    cv = decode_specimen(cfg, 0, use_native=False)
    np.testing.assert_array_equal(nat, cv)
