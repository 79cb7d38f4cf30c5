"""Checkpoint / resume.

The reference saves terminal-only `.h5` weights after the full 1000 epochs
and cannot resume (models/CvT(Par).py:489; SURVEY.md §5.4).  Here a
checkpoint is (params, batch-norm state, optimizer state, step) written
atomically as an .npz of path-flattened leaves + JSON metadata, with
``latest_checkpoint`` for resume-from-latest.  The weight-file *naming
convention* (config encoding) is preserved via config.ExperimentConfig
.weight_name().
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from .optimizer import AdamState


def _flatten(tree, prefix: str) -> Dict[str, np.ndarray]:
    out = {}
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_paths:
        key = prefix + "".join(_path_str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def _path_str(p) -> str:
    if isinstance(p, jax.tree_util.DictKey):
        return f"/{p.key}"
    if isinstance(p, jax.tree_util.SequenceKey):
        return f"/{p.idx}"
    if isinstance(p, jax.tree_util.GetAttrKey):
        return f"/{p.name}"
    return f"/{p}"


def _unflatten_into(template, flat: Dict[str, np.ndarray], prefix: str):
    """Fill a template pytree's leaves from the flat dict (structure comes
    from the template, so no custom treedef serialisation is needed)."""
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in leaves_with_paths:
        key = prefix + "".join(_path_str(p) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = flat[key]
        if arr.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for {key}: ckpt {arr.shape} vs model "
                f"{leaf.shape}")
        new_leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype))
    return treedef.unflatten(new_leaves)


def save_checkpoint(ckpt_dir: str, params, state, opt: Optional[AdamState],
                    step: int, metadata: Optional[Dict] = None) -> str:
    """Writes ckpt_dir/ckpt_{step:06d}.npz (+ .json) atomically."""
    os.makedirs(ckpt_dir, exist_ok=True)
    flat = {}
    flat.update(_flatten(params, "p"))
    flat.update(_flatten(state, "s"))
    if opt is not None:
        flat.update(_flatten({"step": opt.step, "mu": opt.mu,
                              "nu": opt.nu}, "o"))
    path = os.path.join(ckpt_dir, f"ckpt_{step:06d}")
    fd, tmp = tempfile.mkstemp(dir=ckpt_dir, suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path + ".npz")
    meta = {"step": step, "has_opt": opt is not None}
    meta.update(metadata or {})
    with open(path + ".json", "w") as f:
        json.dump(meta, f)
    return path + ".npz"


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = sorted(f for f in os.listdir(ckpt_dir)
                   if f.startswith("ckpt_") and f.endswith(".npz"))
    return os.path.join(ckpt_dir, ckpts[-1]) if ckpts else None


def load_checkpoint(path: str, params_template, state_template,
                    opt_template: Optional[AdamState] = None):
    """Returns (params, state, opt | None, step)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    with open(path[:-4] + ".json") as f:
        meta = json.load(f)
    params = _unflatten_into(params_template, flat, "p")
    state = _unflatten_into(state_template, flat, "s")
    opt = None
    if opt_template is not None and meta.get("has_opt"):
        od = _unflatten_into({"step": opt_template.step,
                              "mu": opt_template.mu,
                              "nu": opt_template.nu}, flat, "o")
        opt = AdamState(step=od["step"], mu=od["mu"], nu=od["nu"])
    return params, state, opt, meta["step"]
