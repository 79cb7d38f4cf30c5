"""Import reference-trained Keras `.h5` weight files into the JAX pytree.

The reference saves terminal weights with Keras-2 save_weights
(models/CvT(Par).py:489: `cvt_model_weights_{freq}_{proj}_cls{bool}.h5`);
eval rebuilds the architecture and loads by naming convention
(models/CvT_test(Par).py:513).  This module does the same for the new
framework: given such a file and the CvTSpec it encodes, produce
(params, state) for models/cvt.cvt_forward — enabling the logits-parity
check against actually-trained reference weights.

Robust to naming drift: weights are located per layer group by
(substring-pattern, shape) rather than a fixed flat order.  Handles both
the legacy Keras-2 layout (layer groups with 'weight_names' attrs) and
Keras-3 '.weights.h5' files.
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


def _find(arrays: Dict[str, np.ndarray], *, contains: List[str],
          shape: Tuple[int, ...], used: set,
          not_contains: Optional[List[str]] = None) -> np.ndarray:
    """First unused dataset (natural path order = Keras creation order)
    whose path contains every pattern (case insensitive) and matches the
    shape."""
    for name in sorted(arrays, key=_natural_key):
        if name in used:
            continue
        low = name.lower()
        if all(p.lower() in low for p in contains) and \
                not any(p.lower() in low for p in (not_contains or [])) and \
                arrays[name].shape == tuple(shape):
            used.add(name)
            return arrays[name]
    raise KeyError(
        f"no dataset matching {contains} shape {shape} "
        f"(available: {[ (n, arrays[n].shape) for n in sorted(arrays) if n not in used ][:8]}...)")


def import_cvt_h5(path: str, spec: CvTSpec):
    """-> (params, state) matching models/cvt.init_cvt's structure."""
    import jax.numpy as jnp

    arrays = _load_arrays(path)
    used: set = set()
    params = {"stages": []}
    state = {"stages": []}
    in_ch = spec.num_channels
    for i, st in enumerate(spec.stages, start=1):
        g = f"stage{i}_ConvEmbed"
        embed = {"proj": {
            "kernel": _find(arrays, contains=[g, "kernel"],
                            shape=(st.patch_size, st.patch_size, in_ch,
                                   st.embed_dim), used=used),
            "bias": _find(arrays, contains=[g, "bias"],
                          shape=(st.embed_dim,), used=used),
        }}
        t = f"stage{i}_transformer"
        d = st.embed_dim

        def proj_parts(tag):
            if st.qkv_method != "dw_bn" or \
                    (tag == "q" and st.qkv_method == "avg"):
                return {}, {}
            p = {"conv": {"kernel": _find(
                     arrays, contains=[t, f"{tag}_proj", "kernel"],
                     shape=(st.kernel_size, st.kernel_size, d, 1),
                     used=used)},
                 "bn": {"gamma": _find(arrays,
                                       contains=[t, f"{tag}_proj", "gamma"],
                                       shape=(d,), used=used),
                        "beta": _find(arrays,
                                      contains=[t, f"{tag}_proj", "beta"],
                                      shape=(d,), used=used)}}
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

        def dense_p(din=d, dout=d):
            """Keras auto-names the block's Dense layers (dense, dense_1,
            ...); creation order within the group (proj_q, proj_k, proj_v,
            proj, then the MLP pair) plus shapes disambiguate."""
            return {"kernel": _find(arrays, contains=[t, "kernel"],
                                    not_contains=["attention", "conv"],
                                    shape=(din, dout), used=used),
                    "bias": _find(arrays, contains=[t, "bias"],
                                  not_contains=["attention"],
                                  shape=(dout,), used=used)}

        mha = {}
        for key in ("query", "key", "value"):
            mha[key] = {"kernel": _find(arrays, contains=[t, key, "kernel"],
                                        not_contains=["output"],
                                        shape=(d, h, dh), used=used),
                        "bias": _find(arrays, contains=[t, key, "bias"],
                                      not_contains=["output"],
                                      shape=(h, dh), used=used)}
        mha["out"] = {
            "kernel": _find(arrays, contains=[t, "kernel"],
                            shape=(h, dh, d), used=used),
            "bias": _find(arrays, contains=[t, "attention", "bias"],
                          shape=(d,), used=used)}

        block = {
            "norm1": {"gamma": _find(arrays,
                                     contains=[t, "normalization", "gamma"],
                                     shape=(d,), used=used),
                      "beta": _find(arrays,
                                    contains=[t, "normalization", "beta"],
                                    shape=(d,), used=used)},
            "attn": {"q_proj": qp, "k_proj": kp, "v_proj": vp,
                     "proj_q": dense_p(),
                     "proj_k": dense_p(),
                     "proj_v": dense_p(),
                     "mha": mha,
                     "proj": dense_p()},
            "mlp": {"fc1": dense_p(din=d, dout=d * st.mlp_ratio),
                    "fc2": dense_p(din=d * st.mlp_ratio, dout=d)},
        }
        if st.with_cls_token:
            cls = _find(arrays, contains=[t, "cls"],
                        shape=(1, 1, 1, d), used=used)
            block["cls_token"] = cls.reshape(1, 1, d)
        params["stages"].append({"embed": embed, "blocks": [block]})
        state["stages"].append({"blocks": [{"attn": {
            "q_proj": qs, "k_proj": ks, "v_proj": vs}}]})
        in_ch = st.embed_dim

    last = spec.stages[-1].embed_dim
    params["head_norm"] = {
        "gamma": _find(arrays, contains=["norm", "gamma"], shape=(last,),
                       used=used),
        "beta": _find(arrays, contains=["norm", "beta"], shape=(last,),
                      used=used)}
    if spec.proc_dim > 0:
        params["proc_fc1"] = {
            "kernel": _find(arrays, contains=["Proc_Dense_1", "kernel"],
                            shape=(spec.proc_dim, spec.proc_hidden),
                            used=used),
            "bias": _find(arrays, contains=["Proc_Dense_1", "bias"],
                          shape=(spec.proc_hidden,), used=used)}
        params["proc_fc2"] = {
            "kernel": _find(arrays, contains=["Proc_Dense_2", "kernel"],
                            shape=(spec.proc_hidden, spec.proc_hidden),
                            used=used),
            "bias": _find(arrays, contains=["Proc_Dense_2", "bias"],
                          shape=(spec.proc_hidden,), used=used)}
        feat = last + spec.proc_hidden
    else:
        feat = last
    params["final"] = {
        "kernel": _find(arrays, contains=["Final_Dense", "kernel"],
                        shape=(feat, spec.num_classes), used=used),
        "bias": _find(arrays, contains=["Final_Dense", "bias"],
                      shape=(spec.num_classes,), used=used)}

    import jax
    to_jnp = lambda x: jnp.asarray(x)
    return (jax.tree_util.tree_map(to_jnp, params),
            jax.tree_util.tree_map(to_jnp, state))
