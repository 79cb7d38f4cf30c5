"""Generate cached reference-parity goldens (VERDICT r2 weak #8).

The full TF parity suite (tests/test_reference_parity.py) imports the
reference's actual Keras code and takes minutes per variant — too slow for
the default dev loop.  This script runs that pipeline ONCE per variant at
a reduced width (the reference's `spec` is a module-level dict, so the
same create_cvt_model code path builds a small twin), then commits:

  tests/goldens/ref_parity_{method}_cls{cls}.npz
    - every imported parameter/state leaf (path-keyed),
    - the 8 SLS input images + process params,
    - the reference model's logits,
    - the shrunken stage dims.

tests/test_reference_golden.py replays cvt_forward against these goldens
in seconds with no TensorFlow dependency.  Regenerate whenever the
reference mapping or h5 importer changes:
    python scripts/make_parity_goldens.py
"""

import importlib.util
import os
import sys

sys.path.insert(0, ".")

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

REF_CVT = "/root/reference/models/CvT(Par).py"
GOLDEN_DIR = "tests/goldens"
# shrunken widths: same code path, ~100k params instead of 2.8M
DIMS = (16, 24, 32)
HEADS = (1, 2, 4)


def load_ref_module():
    import pandas as pd
    from transformer_stm_tpu.data.xlsx import read_xlsx

    orig = pd.read_excel

    def fake_read_excel(path, *a, **k):
        sheets = read_xlsx(str(path))
        rows = next(iter(sheets.values()))
        return pd.DataFrame(rows[1:], columns=rows[0])

    pd.read_excel = fake_read_excel
    try:
        spec = importlib.util.spec_from_file_location("ref_cvt_par",
                                                      REF_CVT)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        pd.read_excel = orig
    return mod


def our_spec(method: str, cls: bool):
    import dataclasses

    from transformer_stm_tpu.config import CvTSpec

    base = CvTSpec().with_projection(method, cls)
    stages = tuple(
        dataclasses.replace(st, embed_dim=DIMS[i], num_heads=HEADS[i])
        for i, st in enumerate(base.stages))
    return dataclasses.replace(base, stages=stages)


def main():
    import tempfile

    from transformer_stm_tpu.config import DataConfig
    from transformer_stm_tpu.data.images import decode_corpus
    from transformer_stm_tpu.models.cvt import cvt_forward
    from transformer_stm_tpu.train.h5_import import import_cvt_h5

    mod = load_ref_module()
    corpus = decode_corpus(DataConfig(), specimen_indices=[0],
                           verbose=False)
    images = (np.asarray(corpus[0, :8], np.float32) / 255.0)[..., None]
    proc = np.random.default_rng(42).standard_normal((8, 5)).astype(
        np.float32)

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for method, cls in (("dw_bn", True), ("avg", True), ("linear", False)):
        mod.projection_method = method
        mod.cls_token_switch = cls
        for i, st in enumerate(mod.spec["stages"]):
            st["qkv_method"] = method
            st["with_cls_token"] = cls if i == 2 else False
            st["embed_dim"] = DIMS[i]
            st["num_heads"] = HEADS[i]
        model = mod.create_cvt_model(128, 128, 1, 5, 1)
        ref_out = np.asarray(model([images, proc],
                                   training=False)).ravel()
        with tempfile.TemporaryDirectory() as td:
            h5 = os.path.join(td, "w.h5")
            model.save_weights(h5)
            spec = our_spec(method, cls)
            params, state = import_cvt_h5(h5, spec)
        # sanity: our forward must match before we commit the golden
        out, _ = cvt_forward(params, state, spec, images, proc,
                             train=False)
        diff = float(np.max(np.abs(np.asarray(out).ravel() - ref_out)))
        assert diff < 1e-3, (method, cls, diff)

        payload = {"images": images, "proc": proc, "ref_out": ref_out,
                   "dims": np.asarray(DIMS), "heads": np.asarray(HEADS)}
        for tag, tree in (("p", params), ("s", state)):
            for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
                payload[tag + jax.tree_util.keystr(path)] = \
                    np.asarray(leaf)
        out_p = os.path.join(GOLDEN_DIR,
                             f"ref_parity_{method}_cls{cls}.npz")
        np.savez_compressed(out_p, **payload)
        print(f"{out_p}: {len(payload)} arrays, ref/our max diff "
              f"{diff:.2e}, {os.path.getsize(out_p)//1024} KiB")


if __name__ == "__main__":
    main()
