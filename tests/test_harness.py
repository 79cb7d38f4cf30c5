"""End-to-end harness on a tiny slice of the real dataset: train -> test ->
heatmap produce the reference's artifact tree (weights, records xlsx,
Predictions_Metrics xlsx, plots, Grad-CAM panels)."""

import dataclasses
import os

import numpy as np
import pytest

from transformer_stm_tpu.config import (
    CvTSpec, DataConfig, ExperimentConfig, StageSpec, TrainConfig)

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")

TINY_MODEL = CvTSpec(
    stages=(
        StageSpec(embed_dim=8, patch_size=7, stride=4, num_heads=1),
        StageSpec(embed_dim=16, patch_size=3, stride=2, num_heads=2),
        StageSpec(embed_dim=16, patch_size=3, stride=2, num_heads=2,
                  with_cls_token=True),
    ),
    image_height=64, image_width=64,
)


def _cfg(tmp_path, inputs="img+par"):
    return ExperimentConfig(
        inputs=inputs,
        frequencies=("50HZ_Bm",),
        model=TINY_MODEL,
        data=DataConfig(group_end=2, image_layers=4, image_height=64,
                        image_width=64,
                        cache_dir=str(tmp_path / "cache")),
        train=TrainConfig(epochs=2, batch_size=16, seed=0),
        result_dir=str(tmp_path / "Result"),
    )


def test_train_test_heatmap_cycle(tmp_path):
    from transformer_stm_tpu.harness import (heatmap_target, test_target,
                                             train_target)

    cfg = _cfg(tmp_path)
    out = train_target(cfg, "50HZ_Bm", verbose=False)
    assert os.path.isdir(out["paths"]["weights"])
    assert os.path.exists(out["paths"]["records"])
    assert len(out["records"]) == 2  # 2 epochs logged

    res = test_target(cfg, "50HZ_Bm", verbose=False)
    assert os.path.exists(res["paths"]["metrics"])
    assert os.path.exists(res["paths"]["plot_scatter"])
    assert os.path.exists(res["paths"]["plot_lines"])
    assert np.isfinite(res["r2"])

    # metrics file round-trips with the committed schema
    from transformer_stm_tpu.train.metrics import read_predictions_metrics
    m = read_predictions_metrics(res["paths"]["metrics"])
    assert m["test_num"] == len(m["predictions"])

    hm = heatmap_target(cfg, "50HZ_Bm", layers=2, n_images=2, verbose=False)
    assert len(hm["panels"]) == 2
    assert all(os.path.exists(p) for p in hm["panels"])


def test_ffn_par_only_cycle(tmp_path):
    from transformer_stm_tpu.harness import test_target, train_target

    cfg = _cfg(tmp_path, inputs="par")
    out = train_target(cfg, "50HZ_Bm", verbose=False)
    assert os.path.exists(out["paths"]["records"])
    res = test_target(cfg, "50HZ_Bm", verbose=False)
    assert np.isfinite(res["r2"])
    # FFN weight naming convention (reference: models/FFN(OnlyPar).py)
    assert "Vit_model_weights" in res["paths"]["weights"]


def test_img_only_cycle(tmp_path):
    from transformer_stm_tpu.harness import test_target, train_target

    cfg = _cfg(tmp_path, inputs="img")
    train_target(cfg, "50HZ_Bm", verbose=False)
    res = test_target(cfg, "50HZ_Bm", verbose=False)
    assert np.isfinite(res["r2"])
    assert "Images" in res["paths"]["metrics"]
    assert "Parameters" not in res["paths"]["metrics"]


def test_repeat_runs_weight_suffix(tmp_path):
    """'(many)' mode inserts the run index right after the target
    (reference: models/CvT(Par)(many).py:489)."""
    cfg = _cfg(tmp_path)
    assert "_50HZ_Bm_3_" in cfg.weight_name("50HZ_Bm", time=3)


def test_train_resumes_from_checkpoint(tmp_path):
    """Interrupted training resumes from the latest mid-run checkpoint
    instead of restarting (the reference loses the whole run)."""
    import dataclasses as dc
    from transformer_stm_tpu.harness import train_target

    cfg = _cfg(tmp_path)
    cfg = dc.replace(cfg, train=dc.replace(cfg.train, epochs=4,
                                           checkpoint_every=2))
    # phase 1: only 2 of 4 epochs
    out1 = train_target(cfg, "50HZ_Bm", epochs=2, verbose=False)
    assert len(out1["records"]) == 2
    # phase 2: resumes at epoch 2, finishes 4
    out2 = train_target(cfg, "50HZ_Bm", verbose=False)
    assert len(out2["records"]) == 2  # epochs 3-4 only
    assert out2["records"][0][0] == 3  # 1-based epoch column


def test_repeat_runs_differ_by_seed(tmp_path):
    """"(many)" repeats must differ by init randomness (reference trains a
    fresh default-init model per repeat) — same repeat index reproduces,
    different index diverges."""
    from transformer_stm_tpu.config import DataConfig, ExperimentConfig, TrainConfig
    from transformer_stm_tpu.data.labels import LabelTable, ProcessTable
    from transformer_stm_tpu.harness import train_target
    from transformer_stm_tpu.train.checkpoint import (latest_checkpoint,
                                                      load_checkpoint)
    from transformer_stm_tpu.models.ffn import init_ffn

    cfg = ExperimentConfig(
        inputs="par", frequencies=("50HZ_Bm",),
        train=TrainConfig(epochs=2, batch_size=64),
        result_dir=str(tmp_path / "Result"),
    )
    labels = LabelTable.load(cfg.data.excel_labels)
    procs = ProcessTable.load(cfg.data.excel_process)
    out1 = train_target(cfg, "50HZ_Bm", labels, procs, time=1,
                        verbose=False)
    out2 = train_target(cfg, "50HZ_Bm", labels, procs, time=2,
                        verbose=False)
    w1 = latest_checkpoint(out1["paths"]["weights"])
    w2 = latest_checkpoint(out2["paths"]["weights"])
    assert w1 != w2  # distinct _{time} artifact paths
    import numpy as np
    with np.load(w1) as z1, np.load(w2) as z2:
        k = [k for k in z1.files if k.endswith("kernel")][0]
        assert not np.array_equal(z1[k], z2[k])
