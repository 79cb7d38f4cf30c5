"""Sharding rules: pytree-path -> PartitionSpec.

TP is expressed purely as annotations on the parameter pytree; XLA/GSPMD
derives every collective.  Rules for the CvT/ViT parameter layout
(models/cvt.py, models/vit.py):

- MHA einsum kernels (E, H, Dh): shard heads (axis 1) over 'model';
  out kernel (H, Dh, E): shard heads (axis 0).
- MLP fc1 (D, 4D): shard hidden (axis 1); fc2 (4D, D): shard hidden (axis 0)
  — the classic Megatron split, here just a PartitionSpec.
- Conv path: ConvEmbed kernels (kh, kw, cin, cout) shard output channels;
  the depthwise QKV-projection kernels (kh, kw, C, 1) shard the channel
  dim — both are per-output-channel-independent ops, so the shards need
  no halo/collective of their own and GSPMD keeps the activations
  channel-sharded through the following BN/elementwise ops.
- Everything else (norms, biases, small denses, heads) replicated: their
  memory is negligible and replicated operands broadcast against sharded
  activations for free.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 4):
    """Shard the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def _path_names(path) -> list:
    names = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            names.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            names.append(str(p.idx))
    return names


def _tp_spec(path, leaf, model_size: int) -> P:
    names = _path_names(path)

    def ok(axis: int) -> bool:
        """Only shard an axis the model-axis size divides evenly — e.g.
        stage 1 of the CvT has a single head, which stays replicated."""
        return leaf.shape[axis] % model_size == 0 and leaf.shape[axis] > 1

    if "mha" in names:
        if names[-2] in ("query", "key", "value"):
            # kernel (E, H, Dh) / bias (H, Dh): heads sharded
            if leaf.ndim == 3 and ok(1):
                return P(None, "model", None)
            if leaf.ndim == 2 and ok(0):
                return P("model", None)
            return P()
        if names[-2] == "out":
            # kernel (H, Dh, E): heads sharded; bias (E,) replicated
            return P("model", None, None) if leaf.ndim == 3 and ok(0) else P()
    if "mlp" in names and names[-1] == "kernel":
        if "fc1" in names and ok(1):
            return P(None, "model")
        if "fc2" in names and ok(0):
            return P("model", None)
    if "mlp" in names and names[-1] == "bias" and "fc1" in names and ok(0):
        return P("model")
    if names[-1] == "kernel" and leaf.ndim == 4:
        if "embed" in names and ok(3):
            # ConvEmbed / patch-embed conv (kh, kw, cin, cout)
            return P(None, None, None, "model")
        if names[-2] == "conv" and ok(2):
            # depthwise QKV projection (kh, kw, C, 1)
            return P(None, None, "model", None)
    return P()


def cvt_param_sharding(params, mesh: Mesh, tensor_parallel: bool = True):
    """NamedSharding pytree for params (same rules apply to the Adam moment
    pytrees, which mirror params' structure)."""
    model_size = mesh.shape.get("model", 1)
    tp = tensor_parallel and model_size > 1

    def spec(path, leaf):
        p = _tp_spec(path, leaf, model_size) if tp else P()
        return NamedSharding(mesh, p)

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params, mesh: Mesh, tensor_parallel: bool = True):
    """Device-put params according to the rules."""
    shardings = cvt_param_sharding(params, mesh, tensor_parallel)
    return jax.device_put(params, shardings)
