"""Plotting tools (reference: tools/Plot_records.py, Compare_plot.py,
Compare_r.py, Plot_Original_Data.py, and the eval harness's two plot dumps
models/CvT_test(Par).py:541-557).

All functions write PNGs headlessly (Agg backend) from the framework's
artifacts (records xlsx, Predictions_Metrics xlsx) and the reference's
committed GLCM baselines.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ..data.xlsx import read_xlsx  # noqa: E402


def _ensure_dir(path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)


# ---------------------------------------------------------------------------
# Training-records curves (reference: tools/Plot_records.py:19-78)
# ---------------------------------------------------------------------------

def plot_records(records_path: str, out_path: str,
                 clip_percentile: float = 99.8) -> None:
    """loss/mae + val curves vs epoch, y-clipped at the given percentile
    (the reference clips at 99.8 to keep early-epoch spikes from flattening
    the plot, tools/Plot_records.py)."""
    rows = read_xlsx(records_path)["Sheet1"]
    header, data = rows[0], rows[1:]
    col = {h: i for i, h in enumerate(header)}
    epoch = [r[col["epoch"]] for r in data]

    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    for ax, keys, title in (
            (axes[0], ["loss", "val_loss"], "loss (MSE)"),
            (axes[1], ["mae", "val_mae"], "MAE")):
        allvals = []
        for k in keys:
            if k in col:
                vals = [r[col[k]] for r in data]
                if any(v is not None for v in vals):
                    ax.plot(epoch, vals, label=k)
                    allvals += [v for v in vals if v is not None]
        if allvals:
            ax.set_ylim(0, float(np.percentile(allvals, clip_percentile)))
        ax.set_xlabel("epoch")
        ax.set_title(title)
        ax.legend()
    fig.tight_layout()
    _ensure_dir(out_path)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


# ---------------------------------------------------------------------------
# Eval-harness plots (reference: models/CvT_test(Par).py:541-557)
# ---------------------------------------------------------------------------

def plot_r2_scatter(y_true, y_pred, r2: float, freq: str,
                    out_path: str) -> None:
    """Predicted-vs-actual scatter with the identity line."""
    y_true = np.asarray(y_true).ravel()
    y_pred = np.asarray(y_pred).ravel()
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.scatter(y_true, y_pred, s=4, alpha=0.3)
    lo, hi = float(min(y_true.min(), y_pred.min())), \
        float(max(y_true.max(), y_pred.max()))
    ax.plot([lo, hi], [lo, hi], "r--", linewidth=1)
    ax.set_xlabel("actual")
    ax.set_ylabel("predicted")
    ax.set_title(f"{freq}  R² = {r2:.4f}")
    fig.tight_layout()
    _ensure_dir(out_path)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def plot_actual_vs_predicted(y_true, y_pred, freq: str,
                             out_path: str) -> None:
    """Actual and predicted value lines over the eval set index."""
    y_true = np.asarray(y_true).ravel()
    y_pred = np.asarray(y_pred).ravel()
    fig, ax = plt.subplots(figsize=(12, 4))
    ax.plot(y_true, label="actual", linewidth=0.8)
    ax.plot(y_pred, label="predicted", linewidth=0.8, alpha=0.8)
    ax.set_xlabel("test image")
    ax.set_ylabel(freq)
    ax.set_title(f"actual vs predicted — {freq}")
    ax.legend()
    fig.tight_layout()
    _ensure_dir(out_path)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


# ---------------------------------------------------------------------------
# Baseline comparison (reference: tools/Compare_plot.py, Compare_r.py)
# ---------------------------------------------------------------------------

def read_glcm_baseline(glcm_dir: str, prop: str, model: str,
                       freq_sheet: str) -> Dict:
    """Read one classical-ML baseline sheet
    (Result/Excel/glcm/{prop}_{model}.xlsx, sheet e.g. '50HZ_Hc')."""
    sheets = read_xlsx(os.path.join(glcm_dir, f"{prop}_{model}.xlsx"))
    rows = sheets[freq_sheet]
    header, data = rows[0], rows[1:]
    col = {h: i for i, h in enumerate(header) if h}
    pred_key = next(k for k in col if "prediction" in str(k).lower())
    true_key = next(k for k in col if "true" in str(k).lower())
    r2_key = next(k for k in col if "r2" in str(k).lower()
                  or "r²" in str(k).lower())
    return {
        "predictions": np.array([r[col[pred_key]] for r in data
                                 if r[col[pred_key]] is not None]),
        "true": np.array([r[col[true_key]] for r in data
                          if r[col[true_key]] is not None]),
        "r2": data[0][col[r2_key]],
    }


def plot_compare_predictions(cvt_metrics_path: str, glcm_dir: str,
                             prop: str, freq: str, out_path: str,
                             models: Sequence[str] = ("lightgbm",)) -> None:
    """Overlay CvT predictions with classical-model predictions
    (reference: tools/Compare_plot.py:30-82)."""
    from ..train.metrics import read_predictions_metrics

    cvt = read_predictions_metrics(cvt_metrics_path)
    fig, ax = plt.subplots(figsize=(12, 4))
    ax.plot(cvt["actual"], label="actual", linewidth=0.8, color="black")
    ax.plot(cvt["predictions"], label=f"CvT (R²={cvt['r2']:.3f})",
            linewidth=0.8, alpha=0.8)
    for m in models:
        try:
            b = read_glcm_baseline(glcm_dir, prop, m, freq)
            ax.plot(b["predictions"], label=f"{m} (R²={b['r2']:.3f})",
                    linewidth=0.8, alpha=0.6)
        except (FileNotFoundError, KeyError, StopIteration):
            continue
    ax.set_title(f"{freq}: CvT vs classical baselines")
    ax.legend()
    fig.tight_layout()
    _ensure_dir(out_path)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def plot_compare_r2(metrics_by_freq: Dict[str, str], glcm_dir: str,
                    prop: str, out_path: str,
                    models: Sequence[str] = ("lightgbm", "xgboost", "svr",
                                             "logistic", "linear")) -> None:
    """R² vs frequency for CvT + the classical models
    (reference: tools/Compare_r.py:29-68).
    metrics_by_freq: {'50HZ_Hc': path_to_Predictions_Metrics, ...}."""
    from ..train.metrics import read_predictions_metrics

    freqs = sorted(metrics_by_freq, key=lambda f: int(f.split("HZ")[0]))
    hz = [int(f.split("HZ")[0]) for f in freqs]
    fig, ax = plt.subplots(figsize=(8, 5))
    cvt_r2 = [read_predictions_metrics(metrics_by_freq[f])["r2"]
              for f in freqs]
    ax.plot(hz, cvt_r2, "o-", label="CvT")
    for m in models:
        try:
            r2s = [read_glcm_baseline(glcm_dir, prop, m, f)["r2"]
                   for f in freqs]
            ax.plot(hz, r2s, "s--", label=m, alpha=0.7)
        except (FileNotFoundError, KeyError, StopIteration):
            continue
    ax.set_xlabel("frequency (Hz)")
    ax.set_ylabel("R²")
    ax.set_title(f"{prop}: R² vs frequency")
    ax.legend()
    fig.tight_layout()
    _ensure_dir(out_path)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


# ---------------------------------------------------------------------------
# Dataset visualisation (reference: tools/Plot_Original_Data.py:41-197)
# ---------------------------------------------------------------------------

def plot_label_distribution(labels_by_freq: Dict[str, np.ndarray],
                            out_path: str) -> None:
    """Per-target label values vs specimen index with group means."""
    n = len(labels_by_freq)
    cols = 2
    rows = (n + 1) // 2
    fig, axes = plt.subplots(rows, cols, figsize=(12, 3 * rows),
                             squeeze=False)
    for ax, (freq, vals) in zip(axes.ravel(), labels_by_freq.items()):
        vals = np.asarray(vals, np.float64)
        ax.plot(vals, ".", markersize=3)
        ax.set_title(freq)
    fig.tight_layout()
    _ensure_dir(out_path)
    fig.savefig(out_path, dpi=100)
    plt.close(fig)


def plot_values_vs_group_average(values, freq: str, out_path: str,
                                 pieces_per_group: int = 5,
                                 layers_per_piece: int = 200) -> None:
    """The reference's dataset visualizer view (tools/Plot_Original_Data.py
    :176-197): per-image label values over the corpus (each specimen's value
    repeated for its `layers_per_piece` images) against the per-group
    average (one group = `pieces_per_group` specimens), drawn as a dashed
    step line.

    `values` is the per-specimen label column (LabelTable.target_values);
    None/NaN entries are expanded like numbers so image numbering matches
    the reference corpus layout.
    """
    vals = np.array([np.nan if v is None else float(v) for v in values],
                    np.float64)
    per_image = np.repeat(vals, layers_per_piece)
    n_groups = len(vals) // pieces_per_group
    group_avg = np.empty_like(per_image)
    span = pieces_per_group * layers_per_piece
    for g in range(n_groups):
        block = vals[g * pieces_per_group:(g + 1) * pieces_per_group]
        group_avg[g * span:(g + 1) * span] = np.nanmean(block) \
            if np.any(~np.isnan(block)) else np.nan
    image_numbers = np.arange(1, len(per_image) + 1)

    fig, ax = plt.subplots(figsize=(10, 4))
    ax.plot(image_numbers, per_image, label="Actual", marker="o",
            markersize=1, linewidth=0.5)
    ax.plot(image_numbers, group_avg, label="Group Average", color="red",
            linestyle="--")
    ax.set_xlabel("Image Number")
    ax.set_ylabel("Values")
    ax.set_title(f"Actual vs Group Average - {freq}")
    ax.legend()
    fig.tight_layout()
    _ensure_dir(out_path)
    fig.savefig(out_path, dpi=100)
    plt.close(fig)


def plot_labels_vs_parameters(values, proc_scaled: np.ndarray, freq: str,
                              out_path: str,
                              layers_per_piece: int = 200) -> None:
    """The visualizer's twin-axis labels-vs-scaled-process-parameters view
    (tools/Plot_Original_Data.py:135-170 — present in the reference but
    commented out; kept here as a working tool).  `proc_scaled` is
    (n_specimens, 5) standard-scaled parameters."""
    vals = np.array([np.nan if v is None else float(v) for v in values],
                    np.float64)
    per_image = np.repeat(vals, layers_per_piece)
    proc_rep = np.repeat(np.asarray(proc_scaled, np.float64),
                         layers_per_piece, axis=0)
    image_numbers = np.arange(1, len(per_image) + 1)
    param_labels = ["Oxygen Concentration", "Laser Scanning Speed",
                    "Laser Power", "Layer Spacing", "Energy Density"]
    colors = ["red", "green", "blue", "purple", "orange"]

    fig, ax1 = plt.subplots(figsize=(10, 4))
    ax1.set_xlabel("Image Number")
    ax1.set_ylabel("Labels", color="tab:blue")
    ax1.plot(image_numbers, per_image, label="Labels", marker="o",
             markersize=1, linewidth=0.5, color="tab:blue")
    ax1.tick_params(axis="y", labelcolor="tab:blue")
    ax2 = ax1.twinx()
    for i, lbl in enumerate(param_labels):
        ax2.plot(image_numbers, proc_rep[:, i], label=lbl, marker="x",
                 markersize=1, linewidth=0.5, color=colors[i])
    ax2.set_ylabel("Parameters", color="tab:red")
    ax2.tick_params(axis="y", labelcolor="tab:red")
    l1, n1 = ax1.get_legend_handles_labels()
    l2, n2 = ax2.get_legend_handles_labels()
    ax2.legend(l1 + l2, n1 + n2, loc="upper center",
               bbox_to_anchor=(0.5, -0.15), ncol=6, fontsize=6)
    ax1.set_title(f"Labels vs Parameters - {freq}")
    fig.tight_layout()
    _ensure_dir(out_path)
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
