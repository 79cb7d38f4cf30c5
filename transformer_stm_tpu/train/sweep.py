"""Hyperparameter sweep runner (TPU-native successor of the reference
lineage's keras-tuner search).

The reference's predecessor scripts ran Bayesian hyperparameter search
with keras-tuner (reference: old_codes/BayConvT(OnlyPar).py:191,
kt.BayesianOptimization over layer sizes / learning rate) — one trial at
a time, each a full Keras fit.  SURVEY.md §2.5 calls for a small
equivalent.  Here the sweep is TPU-shaped instead of ported:

- **CvT sweeps vmap the trials.**  Every (learning_rate, seed) point of
  a sweep trains as one slot of the vmapped multi-target trainer
  (train/multi.py) — all trials advance simultaneously inside one jitted
  epoch program on one chip, sharing the HBM-resident corpus.  Points
  that differ in *static* hyperparameters (dropout rate, batch size)
  compile to different programs, so the runner groups points by their
  static fields and runs one vmapped chunk per group.
- **FFN sweeps run sequentially** through the standard harness (the
  params-only model trains in seconds; vmapping would save nothing) —
  and therefore may also sweep the hidden width, which is a shape
  change the vmapped path cannot express.

Selection metric: final-epoch validation MSE (the protocol's own
val_loss), with the min-over-epochs val loss recorded per point for
diagnostics.
"""

from __future__ import annotations

import dataclasses
import itertools
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..config import ExperimentConfig

__all__ = ["grid_points", "sweep_cvt", "sweep_ffn", "run_sweep",
           "write_summary", "config_grid_points", "config_random_points",
           "run_config_sweep"]


def grid_points(lrs: Sequence[float], dropouts: Sequence[float] = (None,),
                seeds: Sequence[int] = (0,),
                hiddens: Sequence[int] = (None,)) -> List[Dict]:
    """Cross product -> list of sweep points (dicts).  None entries mean
    "leave at the config's value"."""
    pts = []
    for lr, dr, seed, hid in itertools.product(lrs, dropouts, seeds,
                                               hiddens):
        p = {"lr": float(lr), "seed": int(seed)}
        if dr is not None:
            p["dropout"] = float(dr)
        if hid is not None:
            p["hidden"] = int(hid)
        pts.append(p)
    return pts


def _with_dropout(spec, rate: float):
    stages = tuple(dataclasses.replace(st, dropout_rate=rate)
                   for st in spec.stages)
    return dataclasses.replace(spec, stages=stages)


def sweep_cvt(cfg: ExperimentConfig, freq: str, points: Sequence[Dict],
              epochs: Optional[int] = None, impl: str = "auto",
              mlp_impl: str = "xla", epochs_per_call: int = 1,
              corpus=None, verbose: bool = True,
              max_group: int = 5) -> List[Dict]:
    """Run `points` for one CvT target; returns per-point results.

    Points sharing static hyperparameters (dropout) train SIMULTANEOUSLY
    as slots of one vmapped program; groups wider than `max_group` are
    split (the production chunk-width ceiling, CLAUDE.md / width probe).
    """
    from .multi import MultiTargetTrainer

    epochs = epochs or cfg.train.epochs
    for p in points:
        if "hidden" in p:
            raise ValueError("hidden-width sweep is FFN-only (a shape "
                             "change cannot be a vmapped slot)")

    by_static: Dict[Optional[float], List[int]] = {}
    for i, p in enumerate(points):
        by_static.setdefault(p.get("dropout"), []).append(i)

    results: List[Optional[Dict]] = [None] * len(points)
    for dropout, idxs in by_static.items():
        g_cfg = cfg
        if dropout is not None:
            g_cfg = dataclasses.replace(
                cfg, model=_with_dropout(cfg.model, dropout))
        for chunk_start in range(0, len(idxs), max_group):
            chunk = idxs[chunk_start:chunk_start + max_group]
            # "sweep{i}" (not the bare int a "(many)" repeat run uses)
            # keeps sweep artifacts in their own _{time} namespace, so a
            # sweep and a variance study on the same freq/variant never
            # overwrite each other (advisor r3)
            targets = [(freq, points[i]["seed"], f"sweep{i + 1}")
                       for i in chunk]
            scales = [points[i]["lr"] / g_cfg.train.learning_rate
                      for i in chunk]
            tr = MultiTargetTrainer(g_cfg, targets, impl=impl,
                                    mlp_impl=mlp_impl,
                                    epochs_per_call=epochs_per_call,
                                    corpus=corpus, lr_scales=scales)
            tr.fit(epochs, verbose=verbose)
            for slot, i in enumerate(chunk):
                rec = np.asarray(tr.records[slot], np.float64)
                val = rec[:, 3]
                results[i] = {
                    **points[i],
                    "val_mse": float(val[-1]),
                    "val_mae": float(rec[-1, 4]),
                    "best_val_mse": float(val.min()),
                    "best_epoch": int(rec[int(val.argmin()), 0]),
                    "epochs": int(epochs),
                }
            if verbose:
                got = ", ".join(
                    f"lr={points[i]['lr']:g}/s{points[i]['seed']}: "
                    f"{results[i]['val_mse']:.4f}" for i in chunk)
                print(f"[sweep {freq}] dropout={dropout}: {got}",
                      flush=True)
    return [r for r in results if r is not None]


def sweep_ffn(cfg: ExperimentConfig, freq: str, points: Sequence[Dict],
              epochs: Optional[int] = None,
              verbose: bool = True) -> List[Dict]:
    """Sequential FFN sweep through the standard harness: each point is
    a full train+eval at its (lr, seed[, hidden]); artifacts carry a
    sweep-specific _{time} suffix ("sweep{i}") so points never overwrite
    each other nor any "(many)" repeat run's numbered artifacts."""
    from ..data.labels import LabelTable, ProcessTable
    from ..harness import test_target, train_target

    epochs = epochs or cfg.train.epochs
    labels = LabelTable.load(cfg.data.excel_labels)
    procs = ProcessTable.load(cfg.data.excel_process)
    results = []
    for i, p in enumerate(points):
        if "dropout" in p:
            raise ValueError("the reference FFN has no dropout — sweep "
                             "lr/seed/hidden for inputs=par")
        tc = dataclasses.replace(cfg.train, epochs=epochs,
                                 learning_rate=p["lr"], seed=p["seed"])
        p_cfg = dataclasses.replace(cfg, train=tc)
        if "hidden" in p:
            p_cfg = dataclasses.replace(p_cfg, ffn_hidden=p["hidden"])
        # sweep-specific _{time} namespace (see sweep_cvt)
        train_target(p_cfg, freq, labels, procs, time=f"sweep{i + 1}",
                     verbose=False)
        res = test_target(p_cfg, freq, labels, procs, time=f"sweep{i + 1}",
                          verbose=False)
        results.append({**p, "val_mse": float(res["mse"]),
                        "val_mae": float(res["mae"]),
                        "r2": float(res["r2"]), "epochs": int(epochs)})
        if verbose:
            print(f"[sweep {freq}] point {i + 1}/{len(points)} {p}: "
                  f"MSE {res['mse']:.4f} R2 {res['r2']:.4f}", flush=True)
    return results


def run_sweep(cfg: ExperimentConfig, freq: str, points: Sequence[Dict],
              epochs: Optional[int] = None, verbose: bool = True,
              **cvt_kw) -> Dict:
    """Dispatch on cfg.inputs, rank, and return the summary dict."""
    if cfg.inputs == "par":
        results = sweep_ffn(cfg, freq, points, epochs=epochs,
                            verbose=verbose)
    else:
        results = sweep_cvt(cfg, freq, points, epochs=epochs,
                            verbose=verbose, **cvt_kw)
    ranked = sorted(results, key=lambda r: r["val_mse"])
    return {"freq": freq, "inputs": cfg.inputs,
            "n_points": len(results), "best": ranked[0],
            "results": ranked}


def write_summary(summary: Dict, result_dir: str) -> str:
    path = os.path.join(
        result_dir,
        f"sweep_{summary['freq']}_{summary['inputs'].replace('+', '_')}"
        ".json")
    os.makedirs(result_dir, exist_ok=True)
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    return path


# --- generic dotted-path config sweep ---------------------------------------
# Folded from the former tools/sweep.py (advisor r3: two sweep APIs with
# conflicting grid_points signatures).  This is the free-form variant —
# arbitrary TrainConfig/CvTSpec fields by dotted path, arbitrary trial
# function — alongside the protocol-shaped run_sweep above.

def _set_path(cfg, path: str, value):
    """dataclasses.replace along a dotted path, e.g. 'train.batch_size'."""
    parts = path.split(".")
    if len(parts) == 1:
        return dataclasses.replace(cfg, **{parts[0]: value})
    sub = getattr(cfg, parts[0])
    return dataclasses.replace(
        cfg, **{parts[0]: _set_path(sub, ".".join(parts[1:]), value)})


def config_grid_points(space: Dict[str, Sequence]) -> List[Dict]:
    """{dotted.path: candidates} -> full cross product of assignments."""
    keys = list(space)
    return [dict(zip(keys, combo))
            for combo in itertools.product(*(space[k] for k in keys))]


def config_random_points(space: Dict[str, Sequence], n: int,
                         seed: int = 0) -> List[Dict]:
    import random

    rng = random.Random(seed)
    return [{k: rng.choice(list(v)) for k, v in space.items()}
            for _ in range(n)]


def run_config_sweep(base_cfg: ExperimentConfig, space: Dict[str, Sequence],
                     trial_fn, mode: str = "grid", n_random: int = 10,
                     seed: int = 0, objective: str = "val_loss",
                     minimize: bool = True,
                     out_path: Optional[str] = None) -> List[Dict]:
    """trial_fn(cfg) -> metrics dict.  Returns trials sorted best-first;
    optionally writes an xlsx leaderboard (the keras-tuner-style search of
    the reference lineage, old_codes/BayConvT(OnlyPar).py:191)."""
    points = (config_grid_points(space) if mode == "grid"
              else config_random_points(space, n_random, seed))
    trials = []
    for i, point in enumerate(points):
        cfg = base_cfg
        for path, value in point.items():
            cfg = _set_path(cfg, path, value)
        metrics = trial_fn(cfg)
        trials.append({"trial": i, **point, **metrics})
        print(f"trial {i + 1}/{len(points)} {point} -> "
              f"{objective}={metrics.get(objective)}")
    trials.sort(key=lambda t: (t.get(objective) if minimize
                               else -t.get(objective)))
    if out_path:
        from ..data.xlsx import write_xlsx

        cols = ["trial"] + list(space) + sorted(
            k for k in trials[0] if k != "trial" and k not in space)
        rows = [cols] + [[t.get(c) for c in cols] for t in trials]
        write_xlsx(out_path, {"sweep": rows})
    return trials
