"""The "(many)" repeat-run variance study (reference models/CvT(Par)(many)
.py:499-505: 8 repeats per target, artifacts suffixed _{time}).

All 8 repeats train *simultaneously* as vmapped slots of the multi-target
trainer — one jitted program, 8 different init seeds, identical protocol.
Writes per-repeat artifacts in the reference's (many) naming
(cvt_model_weights_{freq}_{time}_...) plus a variance summary
(mean/std/min/max R2-MSE-MAE) into Result/many_{freq}_summary.json.

Usage: python scripts/train_many.py [freq] [epochs] [repeats]
"""

import json
import os
import sys
import time as _time

sys.path.insert(0, ".")

import numpy as np

import jax  # noqa: F401  (backend init order)

from transformer_stm_tpu.config import ExperimentConfig, TrainConfig


def main():
    freq = sys.argv[1] if len(sys.argv) > 1 else "50HZ_Bm"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    cfg = ExperimentConfig(
        inputs="img+par",
        frequencies=(freq,),
        train=TrainConfig(epochs=epochs, batch_size=128,
                          compute_dtype="bfloat16"),
        result_dir="Result",
    )
    # TrainConfig.prng_impl defaults to the TPU hardware RNG (unsafe_rbg)
    # — threefry mask-gen cost ~10% of a profiled epoch; the choice is
    # recorded in the config so checkpoints capture it.
    cfg.train.apply_prng_impl()
    from transformer_stm_tpu.train.multi import MultiTargetTrainer

    targets = [(freq, 1000 + t, t) for t in range(1, repeats + 1)]
    impl = os.environ.get("TSTM_MULTI_IMPL", "small")
    mlp_impl = os.environ.get("TSTM_MULTI_MLP", "pallas")
    t0 = _time.time()
    # hang watchdog + supervisor respawn, same contract as train_all.py:
    # run this under `python -m transformer_stm_tpu.train.supervisor` for
    # the 12h+ unattended T=8 run (8 repeats x 1000 epochs ~= 12.25h at
    # the measured 44.1 s/epoch, Result/multi_width_probe.json)
    from contextlib import nullcontext

    from transformer_stm_tpu.train.watchdog import watchdog_from_env
    wd = watchdog_from_env(default_timeout=720.0)
    if wd is not None:
        wd.start()
    wd_ctx = (wd.dispatch if wd is not None
              else (lambda label: nullcontext()))
    with wd_ctx("trainer init / first device contact"):
        tr = MultiTargetTrainer(cfg, targets, epochs_per_call=10,
                                impl=impl, mlp_impl=mlp_impl)
    ckdir = os.path.join("Result", "Weight", cfg.variant_dir,
                         f"many_{freq}.ckpts")
    if tr.load(ckdir):
        print(f"resumed at epoch {tr.epoch}", flush=True)
    tr.fit(epochs=epochs, checkpoint_dir=ckdir, checkpoint_every=50,
           verbose=True, watchdog=wd)
    print(f"trained {repeats} repeats in {(_time.time()-t0)/60:.1f} min",
          flush=True)
    with wd_ctx("weight export"):
        tr.export(verbose=True)

    from transformer_stm_tpu.harness import test_target
    rows = []
    for _, seed, tsuf in targets:
        with wd_ctx(f"eval time={tsuf}"):
            res = test_target(cfg, freq, time=tsuf, verbose=True)
        rows.append({"time": tsuf, "seed": seed, "r2": res["r2"],
                     "mse": res["mse"], "mae": res["mae"]})
    arr = {k: np.array([r[k] for r in rows]) for k in ("r2", "mse", "mae")}
    summary = {
        "freq": freq, "epochs": epochs, "repeats": repeats,
        "runs": rows,
        "stats": {k: {"mean": float(v.mean()), "std": float(v.std(ddof=1)),
                      "min": float(v.min()), "max": float(v.max())}
                  for k, v in arr.items()},
    }
    with open(f"Result/many_{freq}_summary.json", "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary["stats"], indent=1))


if __name__ == "__main__":
    main()
