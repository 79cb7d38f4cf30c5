"""Sharded checkpoint save/restore on the 8-virtual-device mesh:
kill-and-resume equivalence, per-process shard files, cross-layout
restore.  (Reference has terminal-only .h5 saves, models/CvT(Par).py:489;
SURVEY.md §5.4 — this is the multi-host-scale equivalent.)"""

import glob
import os

import numpy as np
import pytest

import jax

from transformer_stm_tpu.config import CvTSpec, MeshConfig, StageSpec, TrainConfig
from transformer_stm_tpu.parallel import build_mesh, ShardedTrainer
from transformer_stm_tpu.train.sharded_checkpoint import (
    latest_sharded_checkpoint, restore_sharded_checkpoint,
    save_sharded_checkpoint)

TINY = CvTSpec(
    stages=(
        StageSpec(embed_dim=8, patch_size=7, stride=4, num_heads=1),
        StageSpec(embed_dim=16, patch_size=3, stride=2, num_heads=2),
        StageSpec(embed_dim=16, patch_size=3, stride=2, num_heads=2,
                  with_cls_token=True),
    ),
    image_height=32, image_width=32,
)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 (virtual) devices")


def _toy(n=64, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 255, (n, 32, 32, 1), dtype=np.uint8),
            rng.normal(size=(n, 5)).astype(np.float32),
            rng.normal(size=(n,)).astype(np.float32))


def _leaves_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@needs_8
def test_kill_and_resume_equivalence(tmp_path):
    """train 2 epochs straight == train 1, checkpoint, new trainer, restore,
    train 1 — bitwise on params/opt (same seeds, same shuffle schedule)."""
    images, proc, labels = _toy()
    cfg = TrainConfig(epochs=2, batch_size=32, seed=3)
    mesh = build_mesh(MeshConfig(data=4, model=2))

    ref = ShardedTrainer(TINY, cfg, mesh, impl="xla")
    ref.upload(images, proc, labels)
    ref.train_epoch_device_scan(len(labels), epoch=0)
    ref.train_epoch_device_scan(len(labels), epoch=1)

    t1 = ShardedTrainer(TINY, cfg, mesh, impl="xla")
    t1.upload(images, proc, labels)
    t1.train_epoch_device_scan(len(labels), epoch=0)
    ckdir = str(tmp_path / "ck")
    t1.save(ckdir, epoch=1)
    del t1  # the "kill"

    t2 = ShardedTrainer(TINY, cfg, mesh, impl="xla")
    t2.upload(images, proc, labels)
    epoch = t2.load(ckdir)
    assert epoch == 1
    t2.train_epoch_device_scan(len(labels), epoch=1)

    _leaves_equal(ref.params, t2.params)
    _leaves_equal(ref.opt.mu, t2.opt.mu)
    _leaves_equal(ref.state, t2.state)


@needs_8
def test_shard_files_and_layout(tmp_path):
    """Sharded leaves are written as per-shard slices (no full gather) and
    the manifest records the step."""
    cfg = TrainConfig(batch_size=16, seed=0)
    mesh = build_mesh(MeshConfig(data=4, model=2))
    tr = ShardedTrainer(TINY, cfg, mesh, impl="xla")
    ckdir = str(tmp_path / "ck")
    save_sharded_checkpoint(ckdir, tr.params, tr.state, tr.opt, step=7)

    manifest = latest_sharded_checkpoint(ckdir)
    assert manifest and manifest.endswith("ckpt_000007.manifest.json")
    shard_files = glob.glob(os.path.join(ckdir, "ckpt_000007.shard*.npz"))
    assert len(shard_files) == jax.process_count()  # one file per process
    with np.load(shard_files[0]) as z:
        keys = list(z.files)
    # a TP-sharded MLP kernel appears as >1 distinct slices of one leaf
    mlp = [k for k in keys if "/mlp/" in k and "/fc1/kernel|" in k]
    assert len(set(k.rsplit("|", 1)[0] for k in mlp)) < len(mlp), mlp


@needs_8
def test_restore_onto_different_mesh(tmp_path):
    """A checkpoint saved on a 4x2 mesh restores onto 8x1 (and vice versa)
    via the full-assembly fallback."""
    cfg = TrainConfig(batch_size=16, seed=1)
    mesh_a = build_mesh(MeshConfig(data=4, model=2))
    a = ShardedTrainer(TINY, cfg, mesh_a, impl="xla")
    ckdir = str(tmp_path / "ck")
    a.save(ckdir, epoch=3)

    mesh_b = build_mesh(MeshConfig(data=8, model=1))
    b = ShardedTrainer(TINY, cfg, mesh_b, tensor_parallel=False, impl="xla")
    epoch = b.load(ckdir)
    assert epoch == 3
    _leaves_equal(a.params, b.params)


def test_vit_trainer_checkpoint_and_records(tmp_path):
    """ViTTrainer now checkpoints/resumes and writes a records xlsx
    (VERDICT r1 weak #7)."""
    from transformer_stm_tpu.config import ViTSpec
    from transformer_stm_tpu.data.xlsx import read_table
    from transformer_stm_tpu.train.vit_train import ViTTrainer

    spec = ViTSpec(image_size=32, patch_size=8, depth=1, embed_dim=16,
                   num_heads=2, num_classes=3)
    cfg = TrainConfig(batch_size=8, seed=0, compute_dtype="float32")
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (24, 32, 32, 3)).astype(np.float32)
    labels = rng.integers(0, 3, 24)

    ref = ViTTrainer(spec, cfg)
    ref.train_epoch(images, labels)
    ref.train_epoch(images, labels)

    t1 = ViTTrainer(spec, cfg)
    t1.train_epoch(images, labels)
    ckdir = str(tmp_path / "vit_ck")
    t1.save(ckdir)

    t2 = ViTTrainer(spec, cfg)
    assert t2.load(ckdir)
    assert t2.epoch == 1
    t2.train_epoch(images, labels)
    _leaves_equal(ref.params, t2.params)
    assert len(t2.records) == 2  # restored + new epoch

    rec_path = str(tmp_path / "vit_records.xlsx")
    t2.write_records(rec_path)
    cols, rows = read_table(rec_path)
    assert cols == ["epoch", "loss", "acc", "val_loss", "val_acc", "lr"]
    assert len(rows) == 2 and rows[1][0] == 2
