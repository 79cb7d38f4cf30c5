"""Data layer: split parity with the reference's committed artifacts, label
logic, IQR prep, image decode parity."""

import os

import numpy as np
import pytest

from transformer_stm_tpu.config import DataConfig, FREQUENCIES
from transformer_stm_tpu.data.labels import (
    LabelTable, ProcessTable, build_target_arrays, iqr_filter, standard_scale)
from transformer_stm_tpu.data.split import (
    first_valid_per_group, train_val_split)

REF = "/root/reference"
HAVE_REF = os.path.isdir(REF)

# Train/Test mounts committed in
# Result/Excel/Images & Parameters/Predictions_Metrics_{freq}.xlsx
# (see BASELINE.md).
EXPECTED_TRAIN = {
    "50HZ_Bm": 29800, "50HZ_Hc": 28800, "50HZ_μa": 28800, "50HZ_Br": 28600,
    "50HZ_Pcv": 30000, "200HZ_Bm": 29000, "200HZ_Hc": 29000,
    "200HZ_μa": 29200, "200HZ_Br": 29000, "200HZ_Pcv": 28200,
    "400HZ_Bm": 30200, "400HZ_Hc": 29600, "400HZ_μa": 29000,
    "400HZ_Br": 29000, "400HZ_Pcv": 29200, "800HZ_Bm": 29400,
    "800HZ_Hc": 29200, "800HZ_μa": 29000, "800HZ_Br": 27800,
    "800HZ_Pcv": 28200,
}


@pytest.fixture(scope="module")
def tables():
    if not HAVE_REF:
        pytest.skip("reference not mounted")
    cfg = DataConfig()
    return (cfg, LabelTable.load(cfg.excel_labels),
            ProcessTable.load(cfg.excel_process))


@pytest.mark.parametrize("freq", FREQUENCIES)
def test_split_mounts_match_committed(tables, freq):
    """The first-valid-per-group split must reproduce the exact Train/Test
    mounts in the reference's committed spreadsheets (SURVEY.md §7.2)."""
    cfg, lt, pt = tables
    t = build_target_arrays(cfg, freq, lt, pt)
    train_rows, val_rows = train_val_split(t["valid_indices"], t["count"],
                                           cfg.image_layers)
    assert len(val_rows) == 8000
    assert len(train_rows) == EXPECTED_TRAIN[freq]
    assert len(t["labels"]) == len(train_rows) + len(val_rows)


def test_standard_scale_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.preprocessing")
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 100, (40, 5))
    scaled, mean, std = standard_scale(x)
    ref = sklearn.StandardScaler().fit_transform(x)
    np.testing.assert_allclose(scaled, ref, rtol=1e-12)


def test_proc_replication_scaling_invariant(tables):
    """Scaling the layer-replicated param rows equals scaling the unique
    rows (uniform replication preserves mean/std) — the reference fits on
    the replicated array (models/CvT(Par).py:406)."""
    cfg, lt, pt = tables
    t = build_target_arrays(cfg, "50HZ_Bm", lt, pt)
    v = t["valid_indices"]
    unique = np.array([pt.group_params(int(i) // 5) for i in v])
    scaled_unique, _, _ = standard_scale(
        np.repeat(unique, cfg.image_layers, axis=0))
    np.testing.assert_allclose(t["proc_scaled"],
                               scaled_unique.astype(np.float32), atol=1e-6)


def test_first_valid_per_group():
    valid = [1, 2, 5, 11, 12, 13]
    firsts = first_valid_per_group(valid, count=15, group_size=5)
    assert firsts == [1, 5, 11]


def test_iqr_filter():
    vals = [10.0, 11.0, 10.5, 10.2, 1000.0]  # 1000 is the outlier
    out = iqr_filter(vals)
    assert out[-1] is None
    assert out[:4] == vals[:4]


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
def test_image_decode_cv2_parity():
    """decode_specimen must be bit-exact with the reference's cv2 pipeline
    (models/CvT(Par).py:418-423): imread -> resize(INTER_LINEAR) ->
    BGR2GRAY."""
    cv2 = pytest.importorskip("cv2")
    from transformer_stm_tpu.data.images import decode_specimen
    import dataclasses

    cfg = dataclasses.replace(DataConfig(), image_layers=3)
    got = decode_specimen(cfg, 0)  # trail1_01
    for i in range(3):
        fn = f"{REF}/data/circle(340x345)/trail1_01/layer_{i + 1:02d}.jpg"
        img = cv2.imread(fn)
        img = cv2.resize(img, (128, 128))
        ref = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        np.testing.assert_array_equal(got[i], ref)


@pytest.mark.skipif(not HAVE_REF, reason="reference not mounted")
def test_device_preprocess_close_to_cv2():
    """The fused on-device resize/gray/normalize approximates the cv2 host
    pipeline (uint8 rounding + interpolation differences stay small)."""
    cv2 = pytest.importorskip("cv2")
    import jax.numpy as jnp
    from transformer_stm_tpu.data.images import preprocess_images_device

    fn = f"{REF}/data/circle(340x345)/trail1_01/layer_01.jpg"
    bgr = cv2.imread(fn)
    ref = cv2.cvtColor(cv2.resize(bgr, (128, 128)),
                       cv2.COLOR_BGR2GRAY) / 255.0
    rgb = bgr[:, :, ::-1]
    got = preprocess_images_device(jnp.asarray(rgb[None]), 128, 128)
    got = np.asarray(got)[0, :, :, 0]
    # bounded by cv2's uint8 intermediate rounding
    assert np.mean(np.abs(got - ref)) < 0.002
    assert np.max(np.abs(got - ref)) < 0.02
