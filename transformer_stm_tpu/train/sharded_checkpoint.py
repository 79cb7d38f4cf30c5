"""Sharded (per-process) checkpoint save/restore for mesh-resident trees.

The reference saves terminal ``.h5`` weights from its single GPU process
(models/CvT(Par).py:489).  At multi-host scale, gathering every leaf to
host 0 (what train/checkpoint.py does) costs O(model) DCN traffic and host
RAM.  Here each process writes only the array shards it can address — one
``.npz`` per process — and restore rebuilds mesh-resident ``jax.Array``s
shard-by-shard via ``jax.make_array_from_callback``: when the restore
sharding matches the saved one, no full array is ever materialised on any
host.

Layout under ``ckpt_dir``::

    ckpt_000050.manifest.json       step, process_count, metadata
    ckpt_000050.shard0.npz          keys "p/stage0/.../kernel|0:64,0:8"
    ckpt_000050.shard1.npz          (multi-host: one file per process)

Index strings are the normalised global slice of the shard, so files are
self-describing and restore works even onto a *different* mesh shape
(falls back to assembling the full leaf from shards, then slicing).
"""

from __future__ import annotations

import glob
import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from .checkpoint import _path_str  # shared path encoding
from .optimizer import AdamState


def _norm_index(index, shape) -> str:
    """Normalise a shard's global index (tuple of slices) to "a:b,c:d"."""
    parts = []
    for sl, dim in zip(index, shape):
        start, stop, step = sl.indices(dim)
        assert step == 1, "strided shards unsupported"
        parts.append(f"{start}:{stop}")
    return ",".join(parts) if parts else "scalar"


def _tree_items(tree, prefix: str):
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        yield prefix + "".join(_path_str(p) for p in path), leaf


def save_sharded_checkpoint(ckpt_dir: str, params, state,
                            opt: Optional[AdamState], step: int,
                            metadata: Optional[Dict] = None) -> str:
    """Each process writes its addressable, replica-0 shards atomically."""
    os.makedirs(ckpt_dir, exist_ok=True)
    trees = [("p", params), ("s", state)]
    if opt is not None:
        trees.append(("o", {"step": opt.step, "mu": opt.mu, "nu": opt.nu}))
    flat: Dict[str, np.ndarray] = {}
    for prefix, tree in trees:
        for key, leaf in _tree_items(tree, prefix):
            arr = jax.numpy.asarray(leaf)
            for shard in arr.addressable_shards:
                if shard.replica_id != 0:
                    continue  # replicated copies: owner writes once
                idx = _norm_index(shard.index, arr.shape)
                flat[f"{key}|{idx}"] = np.asarray(shard.data)
    proc = jax.process_index()
    base = os.path.join(ckpt_dir, f"ckpt_{step:06d}")
    fd, tmp = tempfile.mkstemp(dir=ckpt_dir, suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, f"{base}.shard{proc}.npz")
    if proc == 0:
        meta = {"step": step, "process_count": jax.process_count(),
                "has_opt": opt is not None}
        meta.update(metadata or {})
        with open(f"{base}.manifest.json", "w") as f:
            json.dump(meta, f)
    return f"{base}.shard{proc}.npz"


def latest_sharded_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Returns the newest manifest path, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    ms = sorted(glob.glob(os.path.join(ckpt_dir, "ckpt_*.manifest.json")))
    return ms[-1] if ms else None


def _load_shards(manifest_path: str) -> Tuple[Dict, Dict[str, Dict]]:
    with open(manifest_path) as f:
        meta = json.load(f)
    base = manifest_path[: -len(".manifest.json")]
    by_key: Dict[str, Dict[str, np.ndarray]] = {}
    for path in sorted(glob.glob(base + ".shard*.npz")):
        with np.load(path) as z:
            for k in z.files:
                key, idx = k.rsplit("|", 1)
                by_key.setdefault(key, {})[idx] = z[k]
    return meta, by_key


def _assemble(shards: Dict[str, np.ndarray], shape, dtype) -> np.ndarray:
    """Full-array fallback (restore onto a different mesh layout)."""
    out = np.zeros(shape, dtype)
    for idx, data in shards.items():
        if idx == "scalar":
            return np.asarray(data, dtype)
        sl = tuple(slice(*map(int, p.split(":"))) for p in idx.split(","))
        out[sl] = data
    return out


def _restore_tree(template, by_key: Dict, prefix: str):
    """template leaves must be jax.Arrays carrying the target sharding."""
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(
        template)
    new_leaves = []
    for path, leaf in leaves_with_paths:
        key = prefix + "".join(_path_str(p) for p in path)
        if key not in by_key:
            raise KeyError(f"sharded checkpoint missing leaf {key}")
        shards = by_key[key]
        arr = jax.numpy.asarray(leaf)
        full = None  # lazily assembled on layout mismatch

        def cb(index, _arr=arr, _shards=shards):
            nonlocal full
            idx = _norm_index(index, _arr.shape)
            if idx in _shards:
                return np.asarray(_shards[idx], _arr.dtype)
            if full is None:
                full = _assemble(_shards, _arr.shape, _arr.dtype)
            sl = tuple(index)
            return full[sl] if sl else full

        new_leaves.append(jax.make_array_from_callback(
            arr.shape, arr.sharding, cb))
    return treedef.unflatten(new_leaves)


def restore_sharded_checkpoint(manifest_path: str, params_like, state_like,
                               opt_like: Optional[AdamState] = None):
    """Restore onto the mesh described by the *_like trees (mesh-resident
    jax.Arrays whose shardings define the target layout).

    Returns (params, state, opt | None, step).
    """
    meta, by_key = _load_shards(manifest_path)
    params = _restore_tree(params_like, by_key, "p")
    state = _restore_tree(state_like, by_key, "s")
    opt = None
    if opt_like is not None and meta.get("has_opt"):
        od = _restore_tree({"step": opt_like.step, "mu": opt_like.mu,
                            "nu": opt_like.nu}, by_key, "o")
        opt = AdamState(step=od["step"], mu=od["mu"], nu=od["nu"])
    return params, state, opt, meta["step"]
