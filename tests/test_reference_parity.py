"""Parity against the reference's ACTUAL code — not a reimplemented twin.

Loads /root/reference/models/CvT(Par).py by path (importlib; the parens in
the filename rule out a normal import), builds its create_cvt_model
(:292-354) under legacy Keras 2 (tf_keras — the API generation the
reference was written for), runs save_weights (:489) to produce a GENUINE
Keras .h5, imports it with train.h5_import, and checks our cvt_forward
matches the real model's logits to <= 1e-3 on real SLS images.

This closes the loop the round-1 twin tests could not: if either the JAX
model or the h5 import heuristics misread the real reference, these tests
fail.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
REF_CVT = os.path.join(REF, "models", "CvT(Par).py")
pytestmark = pytest.mark.skipif(not os.path.exists(REF_CVT),
                                reason="reference not mounted")

tf = pytest.importorskip("tensorflow")
h5py = pytest.importorskip("h5py")


@pytest.fixture(scope="module")
def ref_mod():
    """The reference module, executed as-published.

    Its module level calls pd.read_excel (models/CvT(Par).py:60-61); the
    environment lacks openpyxl, so route those two reads through our
    stdlib xlsx codec — the values land in module globals the model
    builder never touches.
    """
    import pandas as pd
    from transformer_stm_tpu.data.xlsx import read_xlsx

    orig = pd.read_excel

    def fake_read_excel(path, *a, **k):
        sheets = read_xlsx(str(path))
        rows = next(iter(sheets.values()))
        return pd.DataFrame(rows[1:], columns=rows[0])

    pd.read_excel = fake_read_excel
    try:
        spec = importlib.util.spec_from_file_location("ref_cvt_par", REF_CVT)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        pd.read_excel = orig
    assert not isinstance(mod.keras.layers.Dense, type(None))
    return mod


@pytest.fixture(scope="module")
def sls_images():
    """8 real SLS layer images (specimen 0), decoded through the data
    pipeline; falls back to random if the corpus is unavailable."""
    try:
        from transformer_stm_tpu.config import DataConfig
        from transformer_stm_tpu.data.images import decode_corpus
        cfg = DataConfig()
        corpus = decode_corpus(cfg, specimen_indices=[0], verbose=False)
        imgs = np.asarray(corpus[0, :8], np.float32) / 255.0
        return imgs[..., None]
    except Exception:
        rng = np.random.default_rng(0)
        return rng.uniform(0, 1, (8, 128, 128, 1)).astype(np.float32)


def _set_variant(mod, method: str, cls: bool):
    mod.projection_method = method
    mod.cls_token_switch = cls
    for i, st in enumerate(mod.spec["stages"]):
        st["qkv_method"] = method
        st["with_cls_token"] = cls if i == 2 else False


def _parity(mod, sls_images, tmp_path, method: str, cls: bool,
            tol: float = 1e-3):
    from transformer_stm_tpu.config import CvTSpec
    from transformer_stm_tpu.models.cvt import cvt_forward
    from transformer_stm_tpu.train.h5_import import import_cvt_h5

    _set_variant(mod, method, cls)
    model = mod.create_cvt_model(128, 128, 1, 5, 1)
    rng = np.random.default_rng(42)
    proc = rng.standard_normal((len(sls_images), 5)).astype(np.float32)
    ref_out = np.asarray(model([sls_images, proc], training=False)).ravel()

    # genuine save_weights artifact, named per the reference convention
    # (models/CvT(Par).py:489)
    path = str(tmp_path /
               f"cvt_model_weights_50HZ_Bm_{method}_cls{cls}.h5")
    model.save_weights(path)

    spec = CvTSpec().with_projection(method, cls)
    params, state = import_cvt_h5(path, spec)
    out, _ = cvt_forward(params, state, spec, sls_images, proc,
                         train=False)
    ours = np.asarray(out).ravel()
    assert np.max(np.abs(ours - ref_out)) < tol, (
        f"{method}/cls{cls}: max diff {np.max(np.abs(ours - ref_out))}")


def test_reference_uses_legacy_keras(ref_mod):
    """The reference must build under the Keras-2 API family it was
    written for (tf_keras via TF_USE_LEGACY_KERAS, set in conftest)."""
    assert "tf_keras" in type(ref_mod.keras.Model()).__module__ or \
        "keras.engine" in type(ref_mod.keras.Model()).__module__


def test_flagship_parity_vs_real_reference(ref_mod, sls_images, tmp_path):
    """dw_bn + cls token — the flagship config the committed results use."""
    _parity(ref_mod, sls_images, tmp_path, "dw_bn", True)


def test_avg_projection_parity_vs_real_reference(ref_mod, sls_images,
                                                 tmp_path):
    """avg k/v pooling with the q->linear-identity quirk
    (models/CvT(Par).py:127)."""
    _parity(ref_mod, sls_images, tmp_path, "avg", True)


def test_linear_nocls_parity_vs_real_reference(ref_mod, sls_images,
                                               tmp_path):
    """linear (identity) projections + token-mean head
    (models/CvT(Par).py:334-337)."""
    _parity(ref_mod, sls_images, tmp_path, "linear", False)


def test_genuine_h5_roundtrip_param_count(ref_mod, tmp_path):
    """Every parameter of the real model is consumed by the importer:
    total element count of the imported pytree equals count_params plus
    the BatchNorm moving statistics (non-trainable in our state tree)."""
    import jax
    from transformer_stm_tpu.config import CvTSpec
    from transformer_stm_tpu.train.h5_import import import_cvt_h5

    _set_variant(ref_mod, "dw_bn", True)
    model = ref_mod.create_cvt_model(128, 128, 1, 5, 1)
    path = str(tmp_path / "w.h5")
    model.save_weights(path)
    spec = CvTSpec()
    params, state = import_cvt_h5(path, spec)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    n_state = sum(x.size for x in jax.tree_util.tree_leaves(state))
    keras_total = sum(int(np.prod(w.shape)) for w in model.weights)
    assert n_params + n_state == keras_total


def test_export_roundtrip_into_reference_model(ref_mod, sls_images,
                                               tmp_path):
    """Migration loop closure: OUR randomly-initialised weights exported
    into the reference's own create_cvt_model via save_weights; the
    reference model's predictions must match cvt_forward to 1e-3, and the
    written .h5 must re-import bit-identically."""
    import jax

    from transformer_stm_tpu.config import CvTSpec
    from transformer_stm_tpu.models.cvt import cvt_forward, init_cvt
    from transformer_stm_tpu.train.h5_export import export_cvt_reference_h5
    from transformer_stm_tpu.train.h5_import import import_cvt_h5

    spec = CvTSpec().with_projection("dw_bn", True)
    params, state = init_cvt(jax.random.PRNGKey(3), spec)
    # non-trivial BN stats so inference-mode normalisation is exercised
    state = jax.tree_util.tree_map(
        lambda x: x + 0.25 if x.ndim == 1 else x, state)

    path = str(tmp_path / "exported_cvt_model_weights_50HZ_Bm_dw_bn_"
               "clsTrue.h5")
    model = export_cvt_reference_h5(params, state, spec, path, mod=ref_mod)

    rng = np.random.default_rng(7)
    proc = rng.standard_normal((len(sls_images), 5)).astype(np.float32)
    ref_out = np.asarray(model([sls_images, proc],
                               training=False)).ravel()
    ours, _ = cvt_forward(params, state, spec, sls_images, proc,
                          train=False)
    assert np.max(np.abs(np.asarray(ours).ravel() - ref_out)) < 1e-3

    # the h5 on disk round-trips through the importer bit-exactly
    p2, s2 = import_cvt_h5(path, spec)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b))


def test_img_only_export_matches_reference_model(sls_images, tmp_path):
    """Img-only variant (reference models/CvT(Img).py — same layer
    naming, no proc branch): our proc_dim=0 weights exported into ITS
    model must reproduce cvt_forward."""
    import jax

    from transformer_stm_tpu.config import CvTSpec
    from transformer_stm_tpu.models.cvt import cvt_forward, init_cvt
    from transformer_stm_tpu.train.h5_export import export_cvt_reference_h5

    import dataclasses
    spec = dataclasses.replace(
        CvTSpec().with_projection("dw_bn", True), proc_dim=0)
    params, state = init_cvt(jax.random.PRNGKey(5), spec)
    state = jax.tree_util.tree_map(
        lambda x: x + 0.25 if x.ndim == 1 else x, state)

    path = str(tmp_path / "cvt_model_weights_50HZ_Bm_dw_bn_clsTrue.h5")
    model = export_cvt_reference_h5(params, state, spec, path)
    ref_out = np.asarray(model(sls_images, training=False)).ravel()
    ours, _ = cvt_forward(params, state, spec, sls_images, None,
                          train=False)
    assert np.max(np.abs(np.asarray(ours).ravel() - ref_out)) < 1e-3


def test_ffn_export_matches_reference_model(tmp_path):
    """Our FFN weights exported into the reference's params-only model
    (models/FFN(OnlyPar).py create_cvt_model); predictions must agree
    with ffn_forward, and load_weights on a FRESH reference model must
    reproduce them (the exact flow of models/FFN_test(OnlyPar).py:177)."""
    import jax

    from transformer_stm_tpu.models.ffn import ffn_forward, init_ffn
    from transformer_stm_tpu.train.h5_export import (
        REF_FFN, export_ffn_reference_h5, load_reference_module)

    params = init_ffn(jax.random.PRNGKey(11))
    path = str(tmp_path / "Vit_model_weights_50HZ_Bm.h5")
    mod = load_reference_module(REF_FFN)
    model = export_ffn_reference_h5(params, path, mod=mod)

    rng = np.random.default_rng(3)
    proc = rng.standard_normal((64, 5)).astype(np.float32)
    ours = np.asarray(ffn_forward(params, proc)).ravel()
    np.testing.assert_allclose(
        np.asarray(model(proc, training=False)).ravel(), ours,
        rtol=0, atol=1e-5)

    fresh = mod.create_cvt_model(5, 1)
    fresh.load_weights(path)
    np.testing.assert_allclose(
        np.asarray(fresh(proc, training=False)).ravel(), ours,
        rtol=0, atol=1e-5)
