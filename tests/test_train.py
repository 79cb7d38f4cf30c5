"""Training loop: loss improves, seeded determinism, checkpoint/resume,
optimizer/schedule parity (SURVEY.md §4)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_stm_tpu.config import CvTSpec, StageSpec, TrainConfig
from transformer_stm_tpu.train.loop import TrainLoop
from transformer_stm_tpu.train.optimizer import (
    adam_init, adam_update, lr_at_epoch)
from transformer_stm_tpu.train.checkpoint import (
    latest_checkpoint, load_checkpoint, save_checkpoint)

TINY = CvTSpec(
    stages=(
        StageSpec(embed_dim=8, patch_size=7, stride=4, num_heads=1),
        StageSpec(embed_dim=16, patch_size=3, stride=2, num_heads=2),
        StageSpec(embed_dim=16, patch_size=3, stride=2, num_heads=2,
                  with_cls_token=True),
    ),
    image_height=32, image_width=32,
)


def _toy_data(n=64, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 255, (n, 32, 32, 1), dtype=np.uint8)
    proc = rng.normal(size=(n, 5)).astype(np.float32)
    # learnable target: mean pixel + linear in proc
    labels = (images.astype(np.float32).mean((1, 2, 3)) / 255.0
              + proc @ np.arange(1, 6).astype(np.float32))
    return images, proc, labels


def test_loss_decreases():
    images, proc, labels = _toy_data()
    cfg = TrainConfig(epochs=8, batch_size=32, learning_rate=3e-3)
    loop = TrainLoop(TINY, cfg, impl="xla")
    out = loop.fit(images, proc, labels, verbose=False)
    rows = out["records"].rows
    assert rows[-1][1] < rows[0][1] * 0.7, [r[1] for r in rows]


def test_seeded_determinism():
    """Same seed => bitwise-identical params after training (the capability
    the reference's 8x repeat-runs probe by hand, models/CvT(Par)(many).py)."""
    images, proc, labels = _toy_data()
    cfg = TrainConfig(epochs=2, batch_size=32, seed=123)
    out1 = TrainLoop(TINY, cfg, impl="xla").fit(images, proc, labels,
                                               verbose=False)
    out2 = TrainLoop(TINY, cfg, impl="xla").fit(images, proc, labels,
                                               verbose=False)
    for a, b in zip(jax.tree_util.tree_leaves(out1["params"]),
                    jax.tree_util.tree_leaves(out2["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_resume(tmp_path):
    """Train 4 epochs straight == train 2, checkpoint, resume, train 2."""
    images, proc, labels = _toy_data()
    cfg = TrainConfig(epochs=4, batch_size=32, seed=7)

    loop_a = TrainLoop(TINY, cfg, impl="xla")
    out_a = loop_a.fit(images, proc, labels, verbose=False)

    loop_b = TrainLoop(TINY, cfg, impl="xla")
    loop_b.fit(images, proc, labels, epochs=2, verbose=False)
    ck = save_checkpoint(str(tmp_path), loop_b.params, loop_b.state,
                         loop_b.opt, step=loop_b.epoch)
    assert latest_checkpoint(str(tmp_path)) == ck

    loop_c = TrainLoop(TINY, cfg, impl="xla")
    p, s, o, step = load_checkpoint(ck, loop_c.params, loop_c.state,
                                    loop_c.opt)
    loop_c.params, loop_c.state, loop_c.opt, loop_c.epoch = p, s, o, step
    out_c = loop_c.fit(images, proc, labels, verbose=False)

    for a, b in zip(jax.tree_util.tree_leaves(out_a["params"]),
                    jax.tree_util.tree_leaves(out_c["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_lr_schedule_matches_reference():
    """lr *= 0.8 at epochs 50, 100, ... cumulatively
    (models/CvT(Par).py:357-360)."""
    lr = 1e-3
    seq = []
    for epoch in range(151):
        if epoch > 0 and epoch % 50 == 0:
            lr = lr * 0.8
        seq.append(lr)
    for epoch in (0, 1, 49, 50, 99, 100, 150):
        assert lr_at_epoch(1e-3, epoch) == pytest.approx(seq[epoch])


def test_adam_matches_keras():
    """One Adam step vs tf.keras Adam on identical params/grads."""
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    g = rng.normal(size=(4, 3)).astype(np.float32)

    var = tf.Variable(w0)
    opt = tf.keras.optimizers.Adam(learning_rate=1e-3)
    for _ in range(3):
        opt.apply_gradients([(tf.constant(g), var)])
    ref = var.numpy()

    params = {"w": jnp.asarray(w0)}
    state = adam_init(params)
    for _ in range(3):
        params, state = adam_update({"w": jnp.asarray(g)}, state, params,
                                    1e-3)
    np.testing.assert_allclose(np.asarray(params["w"]), ref, atol=1e-6)


def test_predict_padding_consistency():
    """predict() pads the ragged last batch; results must equal per-sample."""
    images, proc, labels = _toy_data(n=40)
    cfg = TrainConfig(epochs=1, batch_size=32)
    loop = TrainLoop(TINY, cfg, impl="xla")
    full = loop.predict(images, proc)          # 40 = 32 + ragged 8
    assert full.shape == (40,)
    again = loop.predict(images[32:], proc[32:])
    np.testing.assert_allclose(full[32:], again, atol=1e-5)


def test_predict_exact_is_f32(tmp_path):
    """predict(exact=True) — the metrics-export eval — must equal a
    float32-configured loop's forward, NOT the bf16-quantized default
    (a bf16-configured loop's default predict returns visibly bf16-grid
    outputs; committed metrics must be true-f32 like the reference's TF
    eval — harness.test_target)."""
    images, proc, labels = _toy_data(n=16)
    bf = TrainLoop(TINY, TrainConfig(epochs=1, batch_size=16,
                                     compute_dtype="bfloat16"), impl="xla")
    f32 = TrainLoop(TINY, TrainConfig(epochs=1, batch_size=16,
                                      compute_dtype="float32"), impl="xla")
    f32.params, f32.state = bf.params, bf.state
    default = bf.predict(images, proc)
    exact = bf.predict(images, proc, exact=True)
    reference = f32.predict(images, proc)
    np.testing.assert_allclose(exact, reference, atol=1e-6)
    # and the default bf16 path really is coarser — the exact knob matters
    assert np.max(np.abs(default - reference)) > 1e-4
