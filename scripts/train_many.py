"""The "(many)" repeat-run variance study (reference models/CvT(Par)(many)
.py:499-505: 8 repeats per target, artifacts suffixed _{time}).

All 8 repeats train *simultaneously* as vmapped slots of the multi-target
trainer — one jitted program, 8 different init seeds, identical protocol.
Core logic lives in transformer_stm_tpu/train/many.py (unit-tested on the
tiny fixture); this script binds the full-protocol config and the hang
watchdog.  Writes per-repeat artifacts in the reference's (many) naming
(cvt_model_weights_{freq}_{time}_...) plus a variance summary
(mean/std/min/max R2-MSE-MAE) into Result/cvt_many_{freq}_summary.json.

Usage: python scripts/train_many.py [freq] [epochs] [repeats]

Run under `python -m transformer_stm_tpu.train.supervisor` for the 12h+
unattended T=8 run (8 repeats x 1000 epochs ~= 12.25h at the measured
44.1 s/epoch, Result/multi_width_probe.json).
"""

import json
import os
import sys

sys.path.insert(0, ".")

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

    from transformer_stm_tpu.train.many import run_many
    from transformer_stm_tpu.train.watchdog import watchdog_from_env
    wd = watchdog_from_env(default_timeout=720.0)
    if wd is not None:
        wd.start()
    summary = run_many(
        cfg, freq, epochs, repeats,
        impl=os.environ.get("TSTM_MULTI_IMPL", "small"),
        mlp_impl=os.environ.get("TSTM_MULTI_MLP", "pallas"),
        watchdog=wd)
    print(json.dumps(summary["stats"], indent=1))


if __name__ == "__main__":
    main()
