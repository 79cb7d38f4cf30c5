"""Multi-target vmapped trainer (train.multi): correctness of the
one-dispatch epoch program — per-target isolation, fully-masked-step
gating, determinism, and artifact export compatible with test_target."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from transformer_stm_tpu.config import (
    CvTSpec, DataConfig, ExperimentConfig, StageSpec, TrainConfig)

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")

TINY_MODEL = CvTSpec(
    stages=(
        StageSpec(embed_dim=8, patch_size=7, stride=4, num_heads=1),
        StageSpec(embed_dim=16, patch_size=3, stride=2, num_heads=2,
                  with_cls_token=True),
    ),
    image_height=64, image_width=64,
)


def _cfg(tmp_path, inputs="img+par"):
    return ExperimentConfig(
        inputs=inputs,
        frequencies=("50HZ_Bm", "50HZ_Hc"),
        model=TINY_MODEL,
        data=DataConfig(group_end=2, image_layers=4, image_height=64,
                        image_width=64,
                        cache_dir=str(tmp_path / "cache")),
        train=TrainConfig(epochs=2, batch_size=8, seed=0),
        result_dir=str(tmp_path / "Result"),
    )


def _leaves_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(fa, fb))


def test_multi_two_targets_end_to_end(tmp_path):
    from transformer_stm_tpu.harness import test_target
    from transformer_stm_tpu.train.multi import MultiTargetTrainer

    cfg = _cfg(tmp_path)
    tr = MultiTargetTrainer(cfg, [("50HZ_Bm", 0, None), ("50HZ_Hc", 0, None)])
    tr.fit(epochs=2, verbose=False)
    assert all(len(r) == 2 for r in tr.records)
    assert all(np.isfinite(row[1]) and np.isfinite(row[3])
               for r in tr.records for row in r)
    tr.export(verbose=False)
    # exported artifacts evaluate through the standard single-target path
    res = test_target(cfg, "50HZ_Bm", verbose=False)
    assert np.isfinite(res["r2"])
    assert os.path.exists(res["paths"]["metrics"])


def test_multi_same_target_same_seed_identical(tmp_path):
    """Two vmapped slots of the same target+seed must stay bitwise equal —
    catches any cross-slot leakage in the vmapped step."""
    from transformer_stm_tpu.train.multi import MultiTargetTrainer

    cfg = _cfg(tmp_path)
    tr = MultiTargetTrainer(cfg, [("50HZ_Bm", 0, None), ("50HZ_Bm", 0, 2)])
    tr.fit(epochs=2, verbose=False)
    take = lambda tree, i: jax.tree_util.tree_map(lambda x: x[i], tree)
    assert _leaves_equal(take(tr.params, 0), take(tr.params, 1))
    assert _leaves_equal(take(tr.opt, 0), take(tr.opt, 1))
    assert tr.records[0] == tr.records[1]


def test_multi_masked_step_gating_is_noop(tmp_path):
    """Appending fully-masked steps to every epoch must not change any
    target's params/opt/state — the gating makes pad steps bit-exact
    no-ops (this is what lets targets with different train-set sizes
    share one step count)."""
    from transformer_stm_tpu.train.multi import MultiTargetTrainer

    cfg = _cfg(tmp_path)
    a = MultiTargetTrainer(cfg, [("50HZ_Bm", 0, None)])
    a.fit(epochs=1, verbose=False)
    b = MultiTargetTrainer(cfg, [("50HZ_Bm", 0, None)], extra_steps=3)
    b.fit(epochs=1, verbose=False)
    assert b.steps_per_epoch == a.steps_per_epoch + 3
    assert _leaves_equal(a.params, b.params)
    assert _leaves_equal(a.state, b.state)
    assert _leaves_equal(a.opt, b.opt)
    assert a.records == b.records


def test_multi_resume_roundtrip(tmp_path):
    """save -> load resumes at the same epoch with identical params and
    keeps the per-epoch records."""
    from transformer_stm_tpu.train.multi import MultiTargetTrainer

    cfg = _cfg(tmp_path)
    ck = str(tmp_path / "multick")
    a = MultiTargetTrainer(cfg, [("50HZ_Bm", 0, None)])
    a.fit(epochs=2, checkpoint_dir=ck, checkpoint_every=2, verbose=False)
    b = MultiTargetTrainer(cfg, [("50HZ_Bm", 0, None)])
    assert b.load(ck)
    assert b.epoch == 2
    assert _leaves_equal(a.params, b.params)
    assert [len(r) for r in b.records] == [2]


def test_multi_epochs_per_call_equivalence(tmp_path):
    """Chunked epochs (scan over epochs inside one dispatch) must match
    epoch-at-a-time execution bitwise."""
    from transformer_stm_tpu.train.multi import MultiTargetTrainer

    cfg = _cfg(tmp_path)
    a = MultiTargetTrainer(cfg, [("50HZ_Bm", 0, None)], epochs_per_call=1)
    a.fit(epochs=2, verbose=False)
    b = MultiTargetTrainer(cfg, [("50HZ_Bm", 0, None)], epochs_per_call=2)
    b.fit(epochs=2, verbose=False)
    assert _leaves_equal(a.params, b.params)
    assert np.allclose(np.asarray(a.records[0], np.float64),
                       np.asarray(b.records[0], np.float64), rtol=1e-6)


def test_multi_impl_small_matches_xla(tmp_path):
    """The production run passes impl='small' (whole-KV-in-VMEM kernel);
    its numerics must track the XLA path it replaces."""
    os.environ["TSTM_PALLAS_INTERPRET"] = "1"
    try:
        from transformer_stm_tpu.train.multi import MultiTargetTrainer

        cfg = _cfg(tmp_path)
        ta = MultiTargetTrainer(cfg, [("50HZ_Bm", 0, None)], impl="xla")
        ta.fit(epochs=1, verbose=False)
        tb = MultiTargetTrainer(cfg, [("50HZ_Bm", 0, None)], impl="small")
        tb.fit(epochs=1, verbose=False)
        la = jax.tree_util.tree_leaves(ta.params)
        lb = jax.tree_util.tree_leaves(tb.params)
        for x, y in zip(la, lb):
            np.testing.assert_allclose(np.asarray(x, np.float32),
                                       np.asarray(y, np.float32),
                                       atol=5e-3, rtol=5e-2)
    finally:
        os.environ.pop("TSTM_PALLAS_INTERPRET", None)
