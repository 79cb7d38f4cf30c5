"""Emit RESULTS.md-ready markdown tables comparing our trained artifacts
with the reference's committed spreadsheets (read with the same
read_predictions_metrics codec; reference files:
Result/Excel/{Parameters,Images & Parameters}/Predictions_Metrics_*.xlsx).

Usage: python scripts/results_tables.py [ffn|flagship]
"""

import os
import sys

sys.path.insert(0, ".")

from transformer_stm_tpu.train.metrics import read_predictions_metrics

ALL = [f"{f}HZ_{p}" for f in (50, 200, 400, 800)
       for p in ("Bm", "Hc", "μa", "Br", "Pcv")]
REF = "/root/reference/Result/Excel"
OURS = "Result/Excel"


def table(variant_dir: str):
    rows = []
    for freq in ALL:
        name = f"Predictions_Metrics_{freq}.xlsx"
        ours_p = os.path.join(OURS, variant_dir, name)
        ref_p = os.path.join(REF, variant_dir, name)
        if not os.path.exists(ours_p):
            rows.append(f"| {freq} | — | | | | | | (not trained) |")
            continue
        o = read_predictions_metrics(ours_p)
        r = read_predictions_metrics(ref_p)
        better = sum((o["r2"] > r["r2"], o["mse"] < r["mse"],
                      o["mae"] < r["mae"]))
        b = lambda x, win: f"**{x:.4f}**" if win else f"{x:.4f}"
        rows.append(
            f"| {freq} | {b(o['r2'], o['r2'] > r['r2'])} | {r['r2']:.4f} "
            f"| {b(o['mse'], o['mse'] < r['mse'])} | {r['mse']:.4f} "
            f"| {b(o['mae'], o['mae'] < r['mae'])} | {r['mae']:.4f} "
            f"| {better}/3 |")
    head = ("| Target | ours R² | ref R² | ours MSE | ref MSE | ours MAE "
            "| ref MAE | wins |\n|---|---|---|---|---|---|---|---|")
    return head + "\n" + "\n".join(rows)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "ffn"
    vd = "Parameters" if which == "ffn" else "Images & Parameters"
    print(table(vd))
