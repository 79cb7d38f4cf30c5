"""Export + evaluate a (possibly still-running or interrupted) chunked
multi-target run from its latest stacked checkpoint.

Loads the checkpoint that matches the given target list (same signature
scheme as scripts/train_all.py), writes per-target weights/records in the
reference layout, and runs the standard harness evaluation for each —
without touching the TPU for training (evaluation is inference-only).

Usage: python scripts/export_multi.py <freq> [freq...]
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, ".")

from transformer_stm_tpu.config import ExperimentConfig, TrainConfig


def main():
    targets = sys.argv[1:]
    assert targets, "pass the chunk's target list"
    cfg = ExperimentConfig(
        inputs="img+par",
        frequencies=tuple(targets),
        train=TrainConfig(epochs=1000, batch_size=128,
                          compute_dtype="bfloat16"),
        result_dir="Result",
    )
    from transformer_stm_tpu.train.multi import (MultiTargetTrainer,
                                                  chunk_checkpoint_dir)

    # same per-slot seed scheme + checkpoint key as scripts/train_all.py
    seed_env = os.environ.get("TSTM_MULTI_SEED", "")
    base_seed, overrides = cfg.train.seed, {}
    if seed_env:
        if "=" in seed_env:
            for part in seed_env.split(","):
                f, s = part.split("=")
                overrides[f.strip()] = int(s)
        else:
            base_seed = int(seed_env)
    slots = [(f, overrides.get(f, base_seed), None) for f in targets]
    sig = hashlib.sha1("|".join(targets).encode()).hexdigest()[:10]
    ckdir = chunk_checkpoint_dir(cfg, [f"{f}#{s}" for f, s, _ in slots])
    tr = MultiTargetTrainer(cfg, slots,
                            impl=os.environ.get("TSTM_MULTI_IMPL", "small"))
    assert tr.load(ckdir), f"no checkpoint in {ckdir}"
    print(f"loaded epoch {tr.epoch} from {ckdir}", flush=True)
    tr.export(verbose=True)

    from transformer_stm_tpu.harness import test_target
    results = {}
    for f in targets:
        res = test_target(cfg, f, verbose=True)
        results[f] = {"r2": res["r2"], "mse": res["mse"],
                      "mae": res["mae"], "epochs": tr.epoch}
    out = f"Result/multi_chunk_{sig}_summary.json"
    prev = {}
    if os.path.exists(out):
        with open(out) as fh:
            prev = json.load(fh).get("results", {})
    prev.update(results)
    with open(out, "w") as fh:
        json.dump({"targets": targets, "results": prev}, fh, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
