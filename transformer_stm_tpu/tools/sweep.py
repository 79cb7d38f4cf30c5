"""Hyperparameter sweep runner.

The reference's lineage ran keras-tuner Bayesian optimisation
(old_codes/BayConvT(OnlyPar).py:191 — dead code in the shipped repo, but a
capability that existed).  This is the framework equivalent: grid or random
search over TrainConfig/CvTSpec fields, each trial a short training run,
results collected into one xlsx leaderboard.

    space = {"train.learning_rate": [1e-3, 3e-4],
             "train.batch_size": [64, 128]}
    results = run_sweep(base_cfg, space, train_fn, mode="grid")
"""

from __future__ import annotations

import dataclasses
import itertools
import random
from typing import Any, Callable, Dict, List, Optional, Sequence

from ..config import ExperimentConfig


def _set_path(cfg, path: str, value):
    """dataclasses.replace along a dotted path, e.g. 'train.batch_size'."""
    parts = path.split(".")
    if len(parts) == 1:
        return dataclasses.replace(cfg, **{parts[0]: value})
    sub = getattr(cfg, parts[0])
    return dataclasses.replace(
        cfg, **{parts[0]: _set_path(sub, ".".join(parts[1:]), value)})


def grid_points(space: Dict[str, Sequence]) -> List[Dict[str, Any]]:
    keys = list(space)
    return [dict(zip(keys, combo))
            for combo in itertools.product(*(space[k] for k in keys))]


def random_points(space: Dict[str, Sequence], n: int,
                  seed: int = 0) -> List[Dict[str, Any]]:
    rng = random.Random(seed)
    return [{k: rng.choice(list(v)) for k, v in space.items()}
            for _ in range(n)]


def run_sweep(base_cfg: ExperimentConfig, space: Dict[str, Sequence],
              trial_fn: Callable[[ExperimentConfig], Dict[str, float]],
              mode: str = "grid", n_random: int = 10, seed: int = 0,
              objective: str = "val_loss", minimize: bool = True,
              out_path: Optional[str] = None) -> List[Dict]:
    """trial_fn(cfg) -> metrics dict.  Returns trials sorted best-first;
    optionally writes an xlsx leaderboard."""
    points = (grid_points(space) if mode == "grid"
              else random_points(space, n_random, seed))
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
