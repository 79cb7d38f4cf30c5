"""Hyperparameter sweep runner (train/sweep.py) — the TPU-native
equivalent of the reference lineage's keras-tuner search
(old_codes/BayConvT(OnlyPar).py:191): CvT points train simultaneously
as vmapped slots with per-slot learning rates; FFN points sweep
(lr, seed, hidden) sequentially through the harness."""

import dataclasses
import os

import numpy as np
import pytest

from transformer_stm_tpu.config import (
    CvTSpec, DataConfig, ExperimentConfig, StageSpec, TrainConfig)
from transformer_stm_tpu.train.sweep import (grid_points, run_sweep,
                                             sweep_cvt, write_summary)

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")

TINY_MODEL = CvTSpec(
    stages=(
        StageSpec(embed_dim=8, patch_size=7, stride=4, num_heads=1),
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
        train=TrainConfig(epochs=2, batch_size=8, seed=0),
        result_dir=str(tmp_path / "Result"),
    )


def test_grid_points_cross_product():
    pts = grid_points([1e-3, 1e-4], dropouts=[0.0, 0.1], seeds=[0, 1])
    assert len(pts) == 8
    assert {"lr": 1e-4, "seed": 1, "dropout": 0.1} in pts
    # None entries stay unset
    assert "hidden" not in pts[0]


def test_sweep_cvt_lr_points_differ(tmp_path):
    """Two LR points in ONE vmapped group must produce genuinely
    different trainings (per-slot lr reaches the Adam update), and the
    summary must rank them."""
    cfg = _cfg(tmp_path)
    pts = [{"lr": 1e-3, "seed": 0}, {"lr": 1e-5, "seed": 0}]
    res = sweep_cvt(cfg, "50HZ_Bm", pts, epochs=2, verbose=False)
    assert len(res) == 2
    assert res[0]["val_mse"] != res[1]["val_mse"]
    assert all(r["epochs"] == 2 and "best_epoch" in r for r in res)


def test_sweep_cvt_scale_one_matches_plain_trainer(tmp_path):
    """lr_scale=1 slots are bit-identical to the pre-sweep trainer —
    the per-slot LR plumbing must not perturb production training."""
    import jax

    from transformer_stm_tpu.train.multi import MultiTargetTrainer

    cfg = _cfg(tmp_path)
    a = MultiTargetTrainer(cfg, [("50HZ_Bm", 0, None)])
    a.fit(2, verbose=False)
    b = MultiTargetTrainer(cfg, [("50HZ_Bm", 0, None)], lr_scales=[1.0])
    b.fit(2, verbose=False)
    for x, y in zip(jax.tree_util.tree_leaves(a.params),
                    jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_sweep_cvt_dropout_groups_and_summary(tmp_path):
    """Points with different (static) dropout rates split into separate
    vmapped groups; run_sweep ranks all of them into one summary."""
    cfg = _cfg(tmp_path)
    pts = [{"lr": 1e-3, "seed": 0, "dropout": 0.0},
           {"lr": 1e-3, "seed": 1, "dropout": 0.0},
           {"lr": 1e-3, "seed": 0, "dropout": 0.3}]
    summary = run_sweep(cfg, "50HZ_Bm", pts, epochs=2, verbose=False)
    assert summary["n_points"] == 3
    mses = [r["val_mse"] for r in summary["results"]]
    assert mses == sorted(mses)
    assert summary["best"]["val_mse"] == mses[0]
    path = write_summary(summary, cfg.result_dir)
    assert os.path.exists(path)


def test_sweep_ffn_lr_seed_hidden(tmp_path):
    """FFN sweep: sequential points over (lr, hidden); the hidden-width
    knob must actually change the trained model (ffn_hidden threads
    through the harness), and artifacts must not overwrite."""
    cfg = _cfg(tmp_path, inputs="par")
    pts = [{"lr": 1e-3, "seed": 0},
           {"lr": 1e-3, "seed": 0, "hidden": 32}]
    summary = run_sweep(cfg, "50HZ_Bm", pts, epochs=2, verbose=False)
    assert summary["n_points"] == 2
    assert all(np.isfinite(r["val_mse"]) for r in summary["results"])
    # both point checkpoints exist side by side, in the sweep-specific
    # artifact namespace (distinct from "(many)" repeat runs' _{int})
    wdir = os.path.join(cfg.result_dir, "Weight", "Parameters")
    names = os.listdir(wdir)
    assert any("sweep1" in n for n in names)
    assert any("sweep2" in n for n in names)


def test_sweep_cvt_rejects_hidden(tmp_path):
    cfg = _cfg(tmp_path)
    with pytest.raises(ValueError):
        sweep_cvt(cfg, "50HZ_Bm", [{"lr": 1e-3, "seed": 0, "hidden": 64}],
                  epochs=1, verbose=False)
