"""Evaluation metrics and artifact writers.

Metrics match sklearn's r2_score/mean_squared_error/mean_absolute_error used
by the reference eval harness (models/CvT_test(Par).py:525-527).  Writers
reproduce the reference's artifact schemas so existing analysis habits carry
over (SURVEY.md §5.5):

- ``RecordsWriter``: per-epoch training records
  (epoch/loss/mae/val_loss/val_mae/lr) -> xlsx, the schema consumed by
  tools/Plot_records.py (reference: models/CvT(Par).py:492-494).
- ``write_predictions_metrics``: the Predictions_Metrics_{freq}.xlsx schema
  (Predictions / Actual / Errors(%) columns + Train/Test mounts + R2/MSE/MAE,
  reference: save_predictions_to_excel, models/CvT_test(Par).py:440-477).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..data.xlsx import write_xlsx


def mse(y_true, y_pred) -> float:
    y_true = np.asarray(y_true, np.float64).ravel()
    y_pred = np.asarray(y_pred, np.float64).ravel()
    return float(np.mean((y_true - y_pred) ** 2))


def mae(y_true, y_pred) -> float:
    y_true = np.asarray(y_true, np.float64).ravel()
    y_pred = np.asarray(y_pred, np.float64).ravel()
    return float(np.mean(np.abs(y_true - y_pred)))


def r2_score(y_true, y_pred) -> float:
    y_true = np.asarray(y_true, np.float64).ravel()
    y_pred = np.asarray(y_pred, np.float64).ravel()
    ss_res = np.sum((y_true - y_pred) ** 2)
    ss_tot = np.sum((y_true - y_true.mean()) ** 2)
    return float(1.0 - ss_res / ss_tot) if ss_tot > 0 else 0.0


class RecordsWriter:
    """Accumulates per-epoch training records; mirrors
    pd.DataFrame(model.history.history) with a leading epoch column
    (reference: models/CvT(Par).py:492-494)."""

    COLUMNS = ["epoch", "loss", "mae", "val_loss", "val_mae", "lr"]

    def __init__(self):
        self.rows: List[List] = []

    def log(self, epoch: int, loss: float, mae_v: float,
            val_loss: Optional[float], val_mae: Optional[float],
            lr: float) -> None:
        self.rows.append([epoch + 1, float(loss), float(mae_v),
                          None if val_loss is None else float(val_loss),
                          None if val_mae is None else float(val_mae),
                          float(lr)])

    def write(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        write_xlsx(path, {"Sheet1": [self.COLUMNS] + self.rows})


def write_predictions_metrics(path: str, freq: str, y_pred, y_true,
                              train_num: int, test_num: int) -> None:
    """Predictions_Metrics_{freq}.xlsx: per-image Predictions/Actual/Errors(%)
    plus summary columns (reference: models/CvT_test(Par).py:440-477)."""
    y_pred = np.asarray(y_pred, np.float64).ravel()
    y_true = np.asarray(y_true, np.float64).ravel()
    errors = np.abs(y_pred - y_true) / y_true * 100
    header = ["Predictions", "Actual", "Errors(%)",
              "Train mounts", "Test mounts", "R2 Score", "MSE", "MAE"]
    summary = [train_num, test_num, r2_score(y_true, y_pred),
               mse(y_true, y_pred), mae(y_true, y_pred)]
    rows = [header]
    for i in range(len(y_pred)):
        row = [float(y_pred[i]), float(y_true[i]), float(errors[i])]
        if i == 0:
            row += summary
        rows.append(row)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    write_xlsx(path, {"Sheet1": rows})


def read_predictions_metrics(path: str) -> Dict:
    """Parse a Predictions_Metrics xlsx (ours or the reference's committed
    ones) back into arrays + summary stats."""
    from ..data.xlsx import read_xlsx

    sheets = read_xlsx(path)
    name = next(iter(sheets))
    rows = sheets[name]
    header, data = rows[0], rows[1:]
    col = {h: i for i, h in enumerate(header) if h}
    preds = np.array([r[col["Predictions"]] for r in data
                      if r[col["Predictions"]] is not None])
    actual = np.array([r[col["Actual"]] for r in data
                       if r[col["Actual"]] is not None])
    first = data[0]
    return {
        "sheet": name, "predictions": preds, "actual": actual,
        "train_num": first[col["Train mounts"]],
        "test_num": first[col["Test mounts"]],
        "r2": first[col["R2 Score"]],
        "mse": first[col["MSE"]],
        "mae": first[col["MAE"]],
    }
