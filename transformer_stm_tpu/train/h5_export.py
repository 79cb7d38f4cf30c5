"""Export trained JAX weights INTO the reference's own Keras model.

The reference evaluates by rebuilding `create_cvt_model` and calling
`model.load_weights(h5)` by naming convention
(models/CvT_test(Par).py:510-513).  This module closes the migration
loop in the other direction: load the reference's actual
models/CvT(Par).py by path, build ITS model, assign our (params, state)
pytree into its variables, and `save_weights` — producing an .h5 the
reference's unmodified eval scripts can load.

Weight correspondence reuses the import mapping (h5_import.map_cvt_names)
applied to {variable.name: variable}: TF variable names carry the same
layer-name/auto-name structure as the save_weights h5 dataset paths, so
the same (substring patterns, shape, creation order) match resolves them.
Round-trip validated in tests/test_reference_parity.py (export -> the
reference model's predictions match cvt_forward to 1e-3 on real SLS
images).
"""

from __future__ import annotations

import importlib.util
from typing import Optional

import numpy as np

from ..config import CvTSpec
from .h5_import import map_cvt_names

REF_CVT = "/root/reference/models/CvT(Par).py"
REF_CVT_IMG = "/root/reference/models/CvT(Img).py"
REF_FFN = "/root/reference/models/FFN(OnlyPar).py"


def load_reference_module(path: str = REF_CVT):
    """Import the reference training script by path (its module level
    reads two xlsx files via pandas; routed through our stdlib codec so
    no openpyxl/xlrd is needed).  The reference is Keras-2 code — force
    legacy Keras before the first TF import (no-op if TF is already in,
    in which case the caller must have set it, as the parity tests do)."""
    import os

    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

    import pandas as pd

    from ..data.xlsx import read_xlsx

    orig = pd.read_excel

    def fake_read_excel(p, *a, **k):
        sheets = read_xlsx(str(p))
        rows = next(iter(sheets.values()))
        return pd.DataFrame(rows[1:], columns=rows[0])

    pd.read_excel = fake_read_excel
    try:
        spec = importlib.util.spec_from_file_location("ref_cvt_par", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        pd.read_excel = orig
    return mod


def configure_reference_module(mod, spec: CvTSpec) -> None:
    """Push our CvTSpec's variant switches and stage dims into the
    reference module's globals (its config surface is module-level
    constants — SURVEY.md §5.6)."""
    method = spec.stages[0].qkv_method
    cls = any(st.with_cls_token for st in spec.stages)
    mod.projection_method = method
    mod.cls_token_switch = cls
    for i, (mst, st) in enumerate(zip(mod.spec["stages"], spec.stages)):
        mst["qkv_method"] = st.qkv_method
        mst["with_cls_token"] = st.with_cls_token
        mst["embed_dim"] = st.embed_dim
        mst["num_heads"] = st.num_heads
        mst["patch_size"] = st.patch_size
        mst["stride"] = st.stride


def export_cvt_reference_h5(params, state, spec: CvTSpec, path: str,
                            mod=None, ref_path: str = None):
    """Write `path` (.h5, legacy Keras-2 save_weights layout) holding our
    weights inside the reference's own model architecture — CvT(Par).py
    for img+par specs, CvT(Img).py (same layer naming, 4-arg builder,
    no proc branch) when spec.proc_dim == 0.

    params/state: pytrees from models/cvt.init_cvt or a loaded
    checkpoint.  Returns the built reference keras model (weights
    assigned) so callers can run additional checks against it.
    """
    import jax

    if mod is None:
        if ref_path is None:
            ref_path = REF_CVT if spec.proc_dim > 0 else REF_CVT_IMG
        mod = load_reference_module(ref_path)
    configure_reference_module(mod, spec)
    if spec.proc_dim > 0:
        model = mod.create_cvt_model(spec.image_height, spec.image_width,
                                     spec.num_channels, spec.proc_dim,
                                     spec.num_classes)
    else:
        model = mod.create_cvt_model(spec.image_height, spec.image_width,
                                     spec.num_channels, spec.num_classes)
    # Qualify each variable with its top-level layer name: save_weights
    # groups datasets per model.layers entry ("stage1_transformer/
    # dense_10/kernel:0"), while tf Variable .name alone drops that
    # prefix ("dense_10/kernel:0") — the import patterns need the stage
    # prefix to disambiguate.
    tf_vars = {}
    seen = set()
    for layer in model.layers:
        for w in layer.weights:
            tf_vars[f"{layer.name}/{w.name}"] = w
            seen.add(id(w))
    for w in model.weights:
        if id(w) not in seen:
            tf_vars[w.name] = w
    assert len(tf_vars) == len(model.weights), \
        "duplicate TF variable names — name-based mapping unsafe"
    names_p, names_s = map_cvt_names(tf_vars, spec)

    def assign(name, leaf):
        var = tf_vars[name]
        a = np.asarray(leaf, np.float32).reshape(var.shape)
        var.assign(a)
        return name

    jax.tree_util.tree_map(assign, names_p, _as_np(params))
    jax.tree_util.tree_map(assign, names_s, _as_np(state))
    model.save_weights(path)
    return model


def export_ffn_reference_h5(params, path: str, mod=None,
                            ref_path: str = REF_FFN):
    """Write `path` holding our FFN weights inside the reference's own
    params-only model (models/FFN(OnlyPar).py create_cvt_model — a plain
    Dense(256,relu)x2 -> Dense(1) despite the name).  Its eval script
    load_weights exactly this file by naming convention
    (models/FFN_test(OnlyPar).py:177, Vit_model_weights_{freq}.h5).

    params: pytree from models/ffn.init_ffn or a loaded checkpoint.
    Returns the built reference keras model with weights assigned."""
    if mod is None:
        mod = load_reference_module(ref_path)
    proc_dim, hidden = np.asarray(params["fc1"]["kernel"]).shape
    num_classes = np.asarray(params["final"]["kernel"]).shape[1]
    model = mod.create_cvt_model(proc_dim, num_classes)
    dense_layers = [l for l in model.layers if l.weights]
    want = [(proc_dim, hidden), (hidden, hidden), (hidden, num_classes)]
    got = [tuple(l.weights[0].shape) for l in dense_layers]
    assert got == want, f"reference FFN layout changed: {got} != {want}"
    for layer, key in zip(dense_layers, ("fc1", "fc2", "final")):
        layer.weights[0].assign(np.asarray(params[key]["kernel"],
                                           np.float32))
        layer.weights[1].assign(np.asarray(params[key]["bias"],
                                           np.float32))
    model.save_weights(path)
    return model


def _as_np(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
