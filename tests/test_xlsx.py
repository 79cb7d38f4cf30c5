"""xlsx codec: roundtrip + reading the reference's committed spreadsheets."""

import math
import os

import numpy as np
import pytest

from transformer_stm_tpu.data.xlsx import read_table, read_xlsx, write_xlsx

REF = "/root/reference"


def test_roundtrip(tmp_path):
    sheets = {
        "Sheet1": [["a", "b", "c"], [1, 2.5, None], ["x&<>\"", -3, True]],
        "metrics": [["R2"], [0.987654321]],
    }
    path = str(tmp_path / "t.xlsx")
    write_xlsx(path, sheets)
    back = read_xlsx(path)
    assert list(back) == ["Sheet1", "metrics"]
    assert back["Sheet1"][0] == ["a", "b", "c"]
    assert back["Sheet1"][1] == [1.0, 2.5, None]
    assert back["Sheet1"][2][0] == 'x&<>"'
    assert back["metrics"][1][0] == pytest.approx(0.987654321)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_read_reference_labels():
    cols, rows = read_table(f"{REF}/Excel/Processed_Circle_test.xlsx")
    assert len(rows) == 200
    assert "50HZ_Bm" in cols and "800HZ_Pcv" in cols
    assert rows[0][cols.index("50HZ_Bm")] == pytest.approx(1058.9)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_read_reference_committed_metrics():
    from transformer_stm_tpu.train.metrics import read_predictions_metrics

    m = read_predictions_metrics(
        f"{REF}/Result/Excel/Images & Parameters/"
        "Predictions_Metrics_50HZ_Bm.xlsx")
    assert m["train_num"] == 29800
    assert m["test_num"] == 8000
    assert m["r2"] == pytest.approx(0.9836, abs=1e-3)
    assert len(m["predictions"]) == 8000


def test_metrics_writer_roundtrip(tmp_path):
    from transformer_stm_tpu.train.metrics import (
        read_predictions_metrics, write_predictions_metrics)

    rng = np.random.default_rng(0)
    y_true = rng.uniform(10, 100, 50)
    y_pred = y_true + rng.normal(0, 1, 50)
    path = str(tmp_path / "Predictions_Metrics_test.xlsx")
    write_predictions_metrics(path, "50HZ_Bm", y_pred, y_true, 100, 50)
    m = read_predictions_metrics(path)
    np.testing.assert_allclose(m["predictions"], y_pred, rtol=1e-12)
    np.testing.assert_allclose(m["actual"], y_true, rtol=1e-12)
    assert m["train_num"] == 100


def test_records_writer(tmp_path):
    from transformer_stm_tpu.train.metrics import RecordsWriter

    w = RecordsWriter()
    w.log(0, 1.5, 0.9, 2.0, 1.1, 1e-3)
    w.log(1, 1.2, 0.8, None, None, 1e-3)
    path = str(tmp_path / "records.xlsx")
    w.write(path)
    back = read_xlsx(path)["Sheet1"]
    assert back[0] == RecordsWriter.COLUMNS
    assert back[1][0] == 1.0 and back[1][1] == pytest.approx(1.5)
    assert back[2][3] is None
