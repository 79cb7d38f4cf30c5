"""CLI: argument plumbing, config overrides, non-train subcommands."""

import json
import os

import numpy as np
import pytest

from transformer_stm_tpu.cli import _build_cfg, main
from transformer_stm_tpu.config import load_config


def test_save_config_with_overrides(tmp_path):
    out = str(tmp_path / "cfg.json")
    rc = main(["save-config", "--inputs", "img", "--projection", "avg",
               "--cls-token", "0", "--epochs", "7", "--batch-size", "32",
               "--repeats", "3", "--freq", "50HZ_Bm", "800HZ_Pcv",
               "--out", out])
    assert rc == 0
    cfg = load_config(out)
    assert cfg.inputs == "img"
    assert cfg.projection_method == "avg"
    assert cfg.cls_token is False
    assert cfg.train.epochs == 7
    assert cfg.train.repeats == 3
    assert cfg.frequencies == ("50HZ_Bm", "800HZ_Pcv")


def test_config_file_plus_override(tmp_path):
    out = str(tmp_path / "base.json")
    main(["save-config", "--inputs", "par", "--out", out])

    class A:  # argparse-shaped namespace
        config = out
        inputs = None
        projection = "linear"
        cls_token = None
        freq = None
        epochs = 5
        batch_size = None
        repeats = None
        seed = None
        result_dir = str(tmp_path / "R")

    cfg = _build_cfg(A())
    assert cfg.inputs == "par"  # from file
    assert cfg.projection_method == "linear"  # override
    assert cfg.train.epochs == 5
    assert cfg.result_dir.endswith("R")


def test_plot_records_subcommand(tmp_path):
    from transformer_stm_tpu.train.metrics import RecordsWriter

    w = RecordsWriter()
    for e in range(5):
        w.log(e, 1.0 / (e + 1), 0.5, 1.1, 0.6, 1e-3)
    rec = str(tmp_path / "r.xlsx")
    w.write(rec)
    out = str(tmp_path / "r.png")
    assert main(["plot-records", "--records", rec, "--out", out]) == 0
    assert os.path.getsize(out) > 1000


def test_model_plot_subcommand(tmp_path):
    out = str(tmp_path / "m.png")
    assert main(["model-plot", "--out", out]) == 0
    assert os.path.getsize(out) > 1000
