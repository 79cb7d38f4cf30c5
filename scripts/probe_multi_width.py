"""Probe the vmapped multi-target trainer's width ceiling (VERDICT r2 #4).

Round-2 observation: T=10 slots crashed the TPU worker despite AOT
memory_analysis reporting 7.4 / 16 GiB peak — i.e. not an HBM OOM but a
runtime/Mosaic fault at larger vmapped grids.  This probe runs each width
in a SEPARATE subprocess (a worker crash kills only that child), 3 epochs
each on one repeated target, and records pass/fail + timing per width.

Run on an otherwise idle chip (after a worker crash the next device init
takes ~90 s — the probe tolerates that).  Writes
Result/multi_width_probe.json.

Usage: python scripts/probe_multi_width.py            # parent sweep
       python scripts/probe_multi_width.py run T      # one width (child)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

WIDTHS = (5, 6, 8, 10)


def run_one(T: int) -> None:
    import tempfile

    import numpy as np

    from transformer_stm_tpu.config import ExperimentConfig, TrainConfig

    cfg = ExperimentConfig(
        inputs="img+par", frequencies=("50HZ_Bm",),
        train=TrainConfig(epochs=3, batch_size=128,
                          compute_dtype="bfloat16"),
        result_dir=tempfile.mkdtemp())
    cfg.train.apply_prng_impl()
    from transformer_stm_tpu.train.multi import MultiTargetTrainer

    slots = [("50HZ_Bm", 1000 + i, i + 1) for i in range(T)]
    tr = MultiTargetTrainer(cfg, slots, impl="small", mlp_impl="pallas",
                            epochs_per_call=1)
    tr.fit(epochs=1, verbose=True)        # includes compile
    t0 = time.time()
    tr.fit(epochs=3, verbose=True)        # steady state
    dt = (time.time() - t0) / 2
    r = np.asarray(tr.records[0], np.float64)
    assert np.isfinite(r).all()
    print(f"RESULT T={T} ok steady_epoch_s={dt:.2f}", flush=True)


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "run":
        run_one(int(sys.argv[2]))
        return

    widths = (tuple(int(a) for a in sys.argv[1:]) if len(sys.argv) > 1
              else WIDTHS)
    out = {}
    if os.path.exists("Result/multi_width_probe.json"):
        with open("Result/multi_width_probe.json") as f:
            out = json.load(f)
    for T in widths:
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, __file__, "run", str(T)],
            capture_output=True, text=True, timeout=1800)
        ok = p.returncode == 0
        tail = (p.stdout + p.stderr).strip().splitlines()[-6:]
        out[f"T{T}"] = {"ok": ok, "wall_s": round(time.time() - t0, 1),
                        "tail": tail}
        print(f"T={T}: {'OK' if ok else f'CRASH rc={p.returncode}'} "
              f"({out[f'T{T}']['wall_s']}s)", flush=True)
        if not ok:
            for line in tail:
                print("   ", line, flush=True)
            # give the TPU worker time to recover before the next width
            time.sleep(120)
    with open("Result/multi_width_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v["ok"] for k, v in out.items()}))


if __name__ == "__main__":
    main()
