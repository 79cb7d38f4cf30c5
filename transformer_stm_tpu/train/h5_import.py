"""Import reference-trained Keras `.h5` weight files into the JAX pytree.

The reference saves terminal weights with Keras-2 save_weights
(models/CvT(Par).py:489: `cvt_model_weights_{freq}_{proj}_cls{bool}.h5`);
eval rebuilds the architecture and loads by naming convention
(models/CvT_test(Par).py:513).  This module does the same for the new
framework: given such a file and the CvTSpec it encodes, produce
(params, state) for models/cvt.cvt_forward — enabling the logits-parity
check against actually-trained reference weights.

Validated against a *genuine* file produced by importing the reference's
own models/CvT(Par).py (create_cvt_model + save_weights under legacy
Keras 2 — tests/test_reference_parity.py), whose layout is:

  stage{i}_ConvEmbed/stage{i}_ConvEmbed/conv2d_N/{kernel,bias}:0
  stage{i}_transformer/dense_N/...                      <- MLP fc1/fc2
  stage{i}_transformer/stage{i}_transformer/conv_attention_N/
      dense_M/...            <- proj_q, proj_k, proj_v, out (creation order)
      {q,k,v}_proj/depthwise_conv2d_N/depthwise_kernel:0
      {q,k,v}_proj/batch_normalization_N/{gamma,beta,moving_*}:0
      multi_head_attention_N/{query,key,value,attention_output}/...
  stage{i}_transformer/stage{i}_transformer/layer_normalization_N/...
  stage3_transformer/cls_token:0
  layer_normalization_N/... (head), Proc_Dense_{1,2}/, Final_Dense/

Matching strategy: locate each *kernel* by (substring patterns, shape,
Keras natural-name creation order), then take its bias from the SAME h5
group (sibling lookup) — independent bias-by-shape searches can collide
(e.g. stage-3 MLP fc2 bias (256,) vs the attention denses' (256,)).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import CvTSpec


def _load_arrays(path: str) -> Dict[str, np.ndarray]:
    import h5py

    out = {}

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            out[name] = np.asarray(obj)

    with h5py.File(path, "r") as f:
        f.visititems(visit)
    return out


def _natural_key(name: str):
    """Natural sort so dense_2 < dense_10 (Keras auto-names preserve
    creation order only under numeric comparison)."""
    return [int(t) if t.isdigit() else t
            for t in re.split(r"(\d+)", name)]


def _find_name(arrays: Dict[str, np.ndarray], *, contains: List[str],
               shape: Tuple[int, ...], used: set,
               not_contains: Optional[List[str]] = None) -> str:
    """Name of the first unused dataset (natural path order = Keras
    creation order) containing every pattern (case-insensitive) with the
    given shape."""
    for name in sorted(arrays, key=_natural_key):
        if name in used:
            continue
        low = name.lower()
        if all(p.lower() in low for p in contains) and \
                not any(p.lower() in low for p in (not_contains or [])) and \
                tuple(arrays[name].shape) == tuple(shape):
            used.add(name)
            return name
    raise KeyError(
        f"no dataset matching {contains} shape {shape} "
        f"(available: {[(n, arrays[n].shape) for n in sorted(arrays) if n not in used][:8]}...)")


def _find(arrays, **kw) -> str:
    return _find_name(arrays, **kw)


def _sibling(arrays: Dict[str, np.ndarray], kernel_name: str, leaf: str,
             used: set) -> str:
    """Name of the dataset `leaf` in the same group as kernel_name.

    Handles both h5 paths ('group/kernel:0') and TF variable names —
    the variable name's group prefix is everything before the last
    '/'-component."""
    group = kernel_name.rsplit("/", 1)[0]
    for cand in (f"{group}/{leaf}:0", f"{group}/{leaf}"):
        if cand in arrays:
            used.add(cand)
            return cand
    raise KeyError(f"no sibling '{leaf}' next to {kernel_name}")


def _dense(arrays, *, contains, shape, used, not_contains=None):
    """{'kernel','bias'} NAMES, the bias taken from the kernel's group."""
    kname = _find_name(arrays, contains=contains, shape=shape, used=used,
                       not_contains=not_contains)
    return {"kernel": kname, "bias": _sibling(arrays, kname, "bias", used)}


def _norm(arrays, *, contains, shape, used, not_contains=None):
    gname = _find_name(arrays, contains=contains + ["gamma"], shape=shape,
                       used=used, not_contains=not_contains)
    return gname, {"gamma": gname,
                   "beta": _sibling(arrays, gname, "beta", used)}


def map_cvt_names(arrays, spec: CvTSpec):
    """Map any {name: array-like-with-.shape} (h5 datasets OR tf
    Variables) onto (params, state) pytrees OF DATASET NAMES matching
    models/cvt.init_cvt's structure.  Shared by the .h5 importer and the
    reference-model weight exporter (h5_export.py)."""
    used: set = set()
    params = {"stages": []}
    state = {"stages": []}
    in_ch = spec.num_channels
    for i, st in enumerate(spec.stages, start=1):
        g = f"stage{i}_ConvEmbed"
        embed = {"proj": _dense(
            arrays, contains=[g, "kernel"],
            shape=(st.patch_size, st.patch_size, in_ch, st.embed_dim),
            used=used)}
        t = f"stage{i}_transformer"
        d = st.embed_dim

        def proj_parts(tag):
            if st.qkv_method != "dw_bn" or \
                    (tag == "q" and st.qkv_method == "avg"):
                return {}, {}
            kname = _find_name(
                arrays, contains=[t, f"{tag}_proj", "kernel"],
                shape=(st.kernel_size, st.kernel_size, d, 1), used=used)
            _, bn = _norm(arrays, contains=[t, f"{tag}_proj"], shape=(d,),
                          used=used)
            p = {"conv": {"kernel": kname}, "bn": bn}
            s = {"bn": {"mean": _find(arrays,
                                      contains=[t, f"{tag}_proj", "mean"],
                                      shape=(d,), used=used),
                        "var": _find(arrays,
                                     contains=[t, f"{tag}_proj", "var"],
                                     shape=(d,), used=used)}}
            return p, s

        qp, qs = proj_parts("q")
        kp, ks = proj_parts("k")
        vp, vs = proj_parts("v")
        h = st.num_heads
        dh = d // h

        def attn_dense():
            """The block's auto-named (d, d) Dense layers — Keras creation
            order (proj_q, proj_k, proj_v, then the output proj) is the
            natural sort order of the dense/dense_N auto-names."""
            return _dense(arrays, contains=[t, "dense", "kernel"],
                          not_contains=["multi_head"], shape=(d, d),
                          used=used)

        proj_q, proj_k, proj_v, proj_out = (attn_dense() for _ in range(4))

        mha = {}
        for key in ("query", "key", "value"):
            kname = _find_name(arrays, contains=[t, key, "kernel"],
                               not_contains=["output"], shape=(d, h, dh),
                               used=used)
            mha[key] = {"kernel": kname,
                        "bias": _sibling(arrays, kname, "bias", used)}
        oname = _find_name(arrays, contains=[t, "attention_output",
                                             "kernel"],
                           shape=(h, dh, d), used=used)
        mha["out"] = {"kernel": oname,
                      "bias": _sibling(arrays, oname, "bias", used)}

        _, norm1 = _norm(arrays, contains=[t, "layer_normalization"],
                         shape=(d,), used=used)
        block = {
            "norm1": norm1,
            "attn": {"q_proj": qp, "k_proj": kp, "v_proj": vp,
                     "proj_q": proj_q,
                     "proj_k": proj_k,
                     "proj_v": proj_v,
                     "mha": mha,
                     "proj": proj_out},
            "mlp": {"fc1": _dense(arrays, contains=[t, "dense", "kernel"],
                                  shape=(d, d * st.mlp_ratio), used=used),
                    "fc2": _dense(arrays, contains=[t, "dense", "kernel"],
                                  shape=(d * st.mlp_ratio, d), used=used)},
        }
        if st.with_cls_token:
            # stored (1, 1, 1, d); the importer reshapes to (1, 1, d)
            block["cls_token"] = _find(arrays, contains=[t, "cls"],
                                       shape=(1, 1, 1, d), used=used)
        params["stages"].append({"embed": embed, "blocks": [block]})
        state["stages"].append({"blocks": [{"attn": {
            "q_proj": qs, "k_proj": ks, "v_proj": vs}}]})
        in_ch = st.embed_dim

    last = spec.stages[-1].embed_dim
    _, params["head_norm"] = _norm(
        arrays, contains=["layer_normalization"], not_contains=["stage"],
        shape=(last,), used=used)
    if spec.proc_dim > 0:
        params["proc_fc1"] = _dense(
            arrays, contains=["Proc_Dense_1", "kernel"],
            shape=(spec.proc_dim, spec.proc_hidden), used=used)
        params["proc_fc2"] = _dense(
            arrays, contains=["Proc_Dense_2", "kernel"],
            shape=(spec.proc_hidden, spec.proc_hidden), used=used)
        feat = last + spec.proc_hidden
    else:
        feat = last
    params["final"] = _dense(arrays, contains=["Final_Dense", "kernel"],
                             shape=(feat, spec.num_classes), used=used)
    return params, state


def import_cvt_h5(path: str, spec: CvTSpec):
    """-> (params, state) matching models/cvt.init_cvt's structure."""
    import jax
    import jax.numpy as jnp

    arrays = _load_arrays(path)
    names_p, names_s = map_cvt_names(arrays, spec)

    def mat(path_, name):
        a = np.asarray(arrays[name])
        if "cls_token" in jax.tree_util.keystr(path_):
            a = a.reshape(1, 1, -1)
        return jnp.asarray(a)

    return (jax.tree_util.tree_map_with_path(mat, names_p),
            jax.tree_util.tree_map_with_path(mat, names_s))
