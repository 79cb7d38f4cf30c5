"""FFN "(many)" repeat-run variance study (reference models/FFN(OnlyPar)
(many).py:179-194: 8 repeats per target, weights Vit_model_weights_{freq}
_{time}.h5).

CPU-friendly (params only, no images) — runs the full 1000-epoch protocol
8 times per target with per-repeat init seeds, evaluates each run, and
writes mean/std/min/max R2-MSE-MAE to Result/ffn_many_{freq}_summary.json.

Usage: python scripts/ffn_many.py [freq ...] [--epochs N] [--repeats N]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from transformer_stm_tpu.config import ExperimentConfig, TrainConfig
from transformer_stm_tpu.data.labels import LabelTable, ProcessTable
from transformer_stm_tpu.harness import test_target, train_target


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("freqs", nargs="*", default=None)
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--repeats", type=int, default=8)
    args = ap.parse_args()
    freqs = args.freqs or ["50HZ_Bm", "800HZ_Pcv"]

    cfg = ExperimentConfig(
        inputs="par",
        frequencies=tuple(freqs),
        train=TrainConfig(epochs=args.epochs, batch_size=128,
                          repeats=args.repeats),
        result_dir="Result",
    )
    labels = LabelTable.load(cfg.data.excel_labels)
    procs = ProcessTable.load(cfg.data.excel_process)
    for freq in freqs:
        rows = []
        for t in range(1, args.repeats + 1):
            t0 = time.time()
            train_target(cfg, freq, labels, procs, time=t, verbose=False)
            res = test_target(cfg, freq, labels, procs, time=t,
                              verbose=False)
            rows.append({"time": t, "r2": res["r2"], "mse": res["mse"],
                         "mae": res["mae"]})
            print(f"{freq} run {t}: R2 {res['r2']:.4f} MSE "
                  f"{res['mse']:.2f} MAE {res['mae']:.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        arr = {k: np.array([r[k] for r in rows])
               for k in ("r2", "mse", "mae")}
        summary = {
            "freq": freq, "epochs": args.epochs, "repeats": args.repeats,
            "runs": rows,
            "stats": {k: {"mean": float(v.mean()),
                          "std": float(v.std(ddof=1)),
                          "min": float(v.min()), "max": float(v.max())}
                      for k, v in arr.items()},
        }
        with open(f"Result/ffn_many_{freq}_summary.json", "w") as fh:
            json.dump(summary, fh, indent=1)
        print(json.dumps(summary["stats"], indent=1), flush=True)


if __name__ == "__main__":
    main()
