"""Config system: JSON round-trip, projection/cls switches, weight-name
convention parity with the reference."""

import dataclasses

import pytest

from transformer_stm_tpu.config import (
    CvTSpec, ExperimentConfig, FREQUENCIES, load_config, save_config)


def test_frequencies_match_reference():
    """The exact 20 targets (reference: models/CvT(Par).py:22)."""
    assert len(FREQUENCIES) == 20
    assert FREQUENCIES[0] == "50HZ_Bm"
    assert FREQUENCIES[-1] == "800HZ_Pcv"
    assert "400HZ_μa" in FREQUENCIES


def test_weight_name_convention():
    """cvt_model_weights_{freq}[_{time}]_{proj}_cls{bool} — the "(many)"
    run index goes right after the target (reference:
    models/CvT(Par).py:489, CvT(Par)(many).py:489)."""
    cfg = ExperimentConfig()
    assert cfg.weight_name("50HZ_Bm") == \
        "cvt_model_weights_50HZ_Bm_dw_bn_clsTrue"
    cfg2 = dataclasses.replace(cfg, projection_method="avg", cls_token=False)
    assert cfg2.weight_name("800HZ_Pcv", time=2) == \
        "cvt_model_weights_800HZ_Pcv_2_avg_clsFalse"
    cfg3 = dataclasses.replace(cfg, inputs="par")
    assert cfg3.weight_name("50HZ_Hc") == "Vit_model_weights_50HZ_Hc"


def test_with_projection_switches():
    spec = CvTSpec().with_projection("avg", False)
    assert all(s.qkv_method == "avg" for s in spec.stages)
    assert not any(s.with_cls_token for s in spec.stages)
    spec2 = CvTSpec().with_projection("linear", True)
    assert spec2.stages[-1].with_cls_token
    assert not spec2.stages[0].with_cls_token


def test_json_roundtrip(tmp_path):
    cfg = ExperimentConfig()
    cfg = dataclasses.replace(
        cfg, inputs="img", projection_method="avg",
        frequencies=("50HZ_Bm", "800HZ_Pcv"))
    path = str(tmp_path / "cfg.json")
    save_config(cfg, path)
    back = load_config(path)
    assert back == cfg


def test_variant_dirs():
    """Artifact sub-dirs match the reference layout (models/CvT(Par).py:479
    etc.)."""
    assert ExperimentConfig(inputs="img+par").variant_dir == \
        "Images & Parameters"
    assert ExperimentConfig(inputs="img").variant_dir == "Images"
    assert ExperimentConfig(inputs="par").variant_dir == "Parameters"


def test_prng_impl_knob():
    """TrainConfig.prng_impl is recorded in the config (so checkpoints and
    the (many) determinism story capture the RNG choice) and
    apply_prng_impl() sets the global jax flag."""
    import jax

    from transformer_stm_tpu.config import TrainConfig

    prev = jax.config.jax_default_prng_impl
    try:
        TrainConfig(prng_impl="threefry2x32").apply_prng_impl()
        assert jax.config.jax_default_prng_impl == "threefry2x32"
        TrainConfig().apply_prng_impl()   # production default
        assert jax.config.jax_default_prng_impl == "unsafe_rbg"
    finally:
        jax.config.update("jax_default_prng_impl", prev)
