"""Legacy Keras .h5 weight import: synthesise a file in the Keras-2
save_weights layout (layer-name groups, auto-named sublayers, `:0` suffixes)
from the twin model's weights, import it, and check logits equality."""

import numpy as np
import pytest

import jax

from transformer_stm_tpu.config import CvTSpec, StageSpec
from transformer_stm_tpu.models import cvt_forward

h5py = pytest.importorskip("h5py")
tf = pytest.importorskip("tensorflow")

from transformer_stm_tpu.train.keras_compat import build_twin, twin_to_pytree
from transformer_stm_tpu.train.h5_import import import_cvt_h5

SPEC = CvTSpec(
    stages=(
        StageSpec(embed_dim=16, patch_size=7, stride=4, num_heads=1),
        StageSpec(embed_dim=24, patch_size=3, stride=2, num_heads=2),
        StageSpec(embed_dim=32, patch_size=3, stride=2, num_heads=4,
                  with_cls_token=True),
    ),
    image_height=64, image_width=64,
)


def _write_legacy_h5(path, params, state, spec):
    """Emit the pytree in a Keras-2-style layout with plausibly auto-named
    sublayers (dense, dense_1, ... multi_head_attention, sequential)."""
    dense_counter = [0]

    def next_dense():
        n = dense_counter[0]
        dense_counter[0] += 1
        return "dense" if n == 0 else f"dense_{n}"

    with h5py.File(path, "w") as f:
        for i, (stage, sstate, st) in enumerate(
                zip(params["stages"], state["stages"], spec.stages),
                start=1):
            g = f.create_group(f"stage{i}_ConvEmbed")
            sub = g.create_group("conv2d" if i == 1 else f"conv2d_{i - 1}")
            sub["kernel:0"] = np.asarray(stage["embed"]["proj"]["kernel"])
            sub["bias:0"] = np.asarray(stage["embed"]["proj"]["bias"])

            t = f.create_group(f"stage{i}_transformer")
            blk = stage["blocks"][0]
            bst = sstate["blocks"][0]
            if "cls_token" in blk:
                t["cls_token:0"] = np.asarray(
                    blk["cls_token"]).reshape(1, 1, 1, -1)
            ln = t.create_group(f"layer_normalization_{i}")
            ln["gamma:0"] = np.asarray(blk["norm1"]["gamma"])
            ln["beta:0"] = np.asarray(blk["norm1"]["beta"])
            for tag in ("q", "k", "v"):
                proj = blk["attn"][f"{tag}_proj"]
                if not proj:
                    continue
                pg = t.create_group(f"{tag}_proj")
                pg["depthwise_conv2d/depthwise_kernel:0"] = \
                    np.asarray(proj["conv"]["kernel"])
                bn = pg.create_group("batch_normalization")
                bn["gamma:0"] = np.asarray(proj["bn"]["gamma"])
                bn["beta:0"] = np.asarray(proj["bn"]["beta"])
                bn["moving_mean:0"] = np.asarray(
                    bst["attn"][f"{tag}_proj"]["bn"]["mean"])
                bn["moving_variance:0"] = np.asarray(
                    bst["attn"][f"{tag}_proj"]["bn"]["var"])
            for key in ("proj_q", "proj_k", "proj_v"):
                dg = t.create_group(next_dense())
                dg["kernel:0"] = np.asarray(blk["attn"][key]["kernel"])
                dg["bias:0"] = np.asarray(blk["attn"][key]["bias"])
            mha = t.create_group(f"multi_head_attention_{i}")
            for key in ("query", "key", "value"):
                sg = mha.create_group(key)
                sg["kernel:0"] = np.asarray(blk["attn"]["mha"][key]["kernel"])
                sg["bias:0"] = np.asarray(blk["attn"]["mha"][key]["bias"])
            og = mha.create_group("attention_output")
            og["kernel:0"] = np.asarray(blk["attn"]["mha"]["out"]["kernel"])
            og["bias:0"] = np.asarray(blk["attn"]["mha"]["out"]["bias"])
            dg = t.create_group(next_dense())
            dg["kernel:0"] = np.asarray(blk["attn"]["proj"]["kernel"])
            dg["bias:0"] = np.asarray(blk["attn"]["proj"]["bias"])
            seq = t.create_group("sequential")
            for key in ("fc1", "fc2"):
                dg = seq.create_group(next_dense())
                dg["kernel:0"] = np.asarray(blk["mlp"][key]["kernel"])
                dg["bias:0"] = np.asarray(blk["mlp"][key]["bias"])

        hn = f.create_group("layer_normalization_9")
        hn["gamma:0"] = np.asarray(params["head_norm"]["gamma"])
        hn["beta:0"] = np.asarray(params["head_norm"]["beta"])
        for name, key in (("Proc_Dense_1", "proc_fc1"),
                          ("Proc_Dense_2", "proc_fc2"),
                          ("Final_Dense", "final")):
            if key not in params:
                continue
            dg = f.create_group(name)
            dg["kernel:0"] = np.asarray(params[key]["kernel"])
            dg["bias:0"] = np.asarray(params[key]["bias"])


def test_h5_roundtrip_logits_equal(tmp_path):
    twin = build_twin(SPEC, batch=2, seed=3)
    params, state = twin_to_pytree(twin)
    path = str(tmp_path / "cvt_model_weights_50HZ_Bm_dw_bn_clsTrue.h5")
    _write_legacy_h5(path, params, state, SPEC)

    params2, state2 = import_cvt_h5(path, SPEC)

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32)
    proc = rng.normal(size=(2, 5)).astype(np.float32)
    ref, _ = cvt_forward(params, state, SPEC, imgs, proc, impl="xla")
    got, _ = cvt_forward(params2, state2, SPEC, imgs, proc, impl="xla")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_h5_import_matches_twin_forward(tmp_path):
    """Imported weights reproduce the Keras twin's output <= 1e-3."""
    twin = build_twin(SPEC, batch=2, seed=4)
    params, state = twin_to_pytree(twin)
    path = str(tmp_path / "w.h5")
    _write_legacy_h5(path, params, state, SPEC)
    params2, state2 = import_cvt_h5(path, SPEC)

    rng = np.random.default_rng(1)
    imgs = rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32)
    proc = rng.normal(size=(2, 5)).astype(np.float32)
    ref = np.asarray(twin(imgs, proc, training=False))
    got, _ = cvt_forward(params2, state2, SPEC, imgs, proc, impl="xla")
    assert np.max(np.abs(np.asarray(got) - ref)) < 1e-3
