"""Hyperparameter sweep runner (grid/random, dotted-path overrides,
leaderboard xlsx)."""

import dataclasses

from transformer_stm_tpu.config import ExperimentConfig
from transformer_stm_tpu.tools.sweep import (
    grid_points, random_points, run_sweep, _set_path)


def test_set_path_nested():
    cfg = ExperimentConfig()
    cfg2 = _set_path(cfg, "train.batch_size", 64)
    assert cfg2.train.batch_size == 64
    assert cfg.train.batch_size == 128  # original untouched
    cfg3 = _set_path(cfg, "projection_method", "avg")
    assert cfg3.projection_method == "avg"


def test_grid_and_random_points():
    space = {"train.learning_rate": [1e-3, 3e-4],
             "train.batch_size": [64, 128]}
    g = grid_points(space)
    assert len(g) == 4
    r = random_points(space, 7, seed=1)
    assert len(r) == 7
    assert all(p["train.batch_size"] in (64, 128) for p in r)


def test_run_sweep_sorts_and_writes(tmp_path):
    space = {"train.learning_rate": [1e-3, 1e-2, 1e-4]}

    def trial(cfg):
        # pretend 1e-3 is best
        return {"val_loss": abs(cfg.train.learning_rate - 1e-3)}

    out = str(tmp_path / "sweep.xlsx")
    trials = run_sweep(ExperimentConfig(), space, trial, mode="grid",
                       out_path=out)
    assert trials[0]["train.learning_rate"] == 1e-3
    from transformer_stm_tpu.data.xlsx import read_xlsx

    rows = read_xlsx(out)["sweep"]
    assert rows[0][0] == "trial"
    assert len(rows) == 4
