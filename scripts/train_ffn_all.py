"""Train + evaluate the params-only FFN for all 20 targets at the full
reference protocol (models/FFN(OnlyPar).py: Dense(256,relu)x2 -> Dense(1),
Adam 1e-3, MSE, batch 128, lr x0.8@50, 1000 epochs), writing the
Result/Excel/Parameters/Predictions_Metrics_{freq}.xlsx table.

CPU-friendly (no images decoded).  Usage: python scripts/train_ffn_all.py
[epochs] [targets...]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

from transformer_stm_tpu.config import ExperimentConfig, TrainConfig
from transformer_stm_tpu.data.labels import LabelTable, ProcessTable
from transformer_stm_tpu.harness import test_target, train_target

ALL_TARGETS = [f"{f}HZ_{p}" for f in (50, 200, 400, 800)
               for p in ("Bm", "Hc", "μa", "Br", "Pcv")]


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    targets = sys.argv[2:] if len(sys.argv) > 2 else ALL_TARGETS
    cfg = ExperimentConfig(
        inputs="par",
        frequencies=tuple(ALL_TARGETS),
        train=TrainConfig(epochs=epochs, batch_size=128),
        result_dir="Result",
    )
    labels = LabelTable.load(cfg.data.excel_labels)
    procs = ProcessTable.load(cfg.data.excel_process)
    results = {}
    for freq in targets:
        t0 = time.time()
        train_target(cfg, freq, labels, procs, verbose=False)
        res = test_target(cfg, freq, labels, procs, verbose=False)
        results[freq] = {"r2": res["r2"], "mse": res["mse"],
                         "mae": res["mae"]}
        print(f"{freq}: R2 {res['r2']:.4f} MSE {res['mse']:.2f} "
              f"MAE {res['mae']:.3f} ({time.time() - t0:.0f}s)",
              flush=True)
    import os
    prev = {}
    if os.path.exists("Result/ffn_run_summary.json"):
        with open("Result/ffn_run_summary.json") as fh:
            prev = json.load(fh).get("results", {})
    prev.update(results)
    with open("Result/ffn_run_summary.json", "w") as fh:
        json.dump({"epochs": epochs, "results": prev}, fh, indent=1)


if __name__ == "__main__":
    main()
