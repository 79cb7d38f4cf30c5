"""The "(many)" repeat-run variance study, in-framework.

The reference ships (many) trainer variants that repeat every training
8x with fresh random init (/root/reference/models/CvT(Par)(many).py:499-505,
artifacts suffixed ``_{time}``) but commits no variance numbers.  Here
all repeats train *simultaneously* as vmapped slots of the multi-target
trainer — one jitted program, one shared HBM-resident corpus, per-slot
init seeds, identical protocol — then each repeat evaluates through the
standard single-target harness and a mean/std/min/max summary is written
to ``Result/cvt_many_{freq}_summary.json``.

Driven by ``scripts/train_many.py`` on hardware; unit-tested on the tiny
fixture config (tests/test_multi.py).
"""

from __future__ import annotations

import json
import os
import time as _time
from contextlib import nullcontext

import numpy as np


def run_many(cfg, freq: str, epochs: int, repeats: int = 8, *,
             impl: str = "small", mlp_impl: str = "pallas",
             watchdog=None, checkpoint_every: int = 50,
             verbose: bool = True) -> dict:
    """Train ``repeats`` seeds of ``freq`` as one vmapped chunk, export
    per-repeat ``_{time}`` artifacts, evaluate each, and write + return
    the variance summary."""
    from ..harness import test_target
    from .multi import MultiTargetTrainer

    targets = [(freq, 1000 + t, t) for t in range(1, repeats + 1)]
    wd_ctx = (watchdog.dispatch if watchdog is not None
              else (lambda label: nullcontext()))
    t0 = _time.time()
    with wd_ctx("trainer init / first device contact"):
        tr = MultiTargetTrainer(cfg, targets, epochs_per_call=10,
                                impl=impl, mlp_impl=mlp_impl)
    ckdir = os.path.join(cfg.result_dir, "Weight", cfg.variant_dir,
                         f"many_{freq}.ckpts")
    if tr.load(ckdir):
        if verbose:
            print(f"resumed at epoch {tr.epoch}", flush=True)
    tr.fit(epochs=epochs, checkpoint_dir=ckdir,
           checkpoint_every=checkpoint_every, verbose=verbose,
           watchdog=watchdog)
    if verbose:
        print(f"trained {repeats} repeats in "
              f"{(_time.time() - t0) / 60:.1f} min", flush=True)
    with wd_ctx("weight export"):
        tr.export(verbose=verbose)

    rows = []
    for _, seed, tsuf in targets:
        with wd_ctx(f"eval time={tsuf}"):
            res = test_target(cfg, freq, time=tsuf, verbose=verbose)
        rows.append({"time": tsuf, "seed": seed, "r2": res["r2"],
                     "mse": res["mse"], "mae": res["mae"]})
    arr = {k: np.array([r[k] for r in rows]) for k in ("r2", "mse", "mae")}
    summary = {
        "freq": freq, "epochs": epochs, "repeats": repeats,
        "runs": rows,
        "stats": {k: {"mean": float(v.mean()),
                      "std": float(v.std(ddof=1)) if len(rows) > 1 else 0.0,
                      "min": float(v.min()), "max": float(v.max())}
                  for k, v in arr.items()},
    }
    out = os.path.join(cfg.result_dir, f"cvt_many_{freq}_summary.json")
    with open(out, "w") as fh:
        json.dump(summary, fh, indent=1)
    return summary
