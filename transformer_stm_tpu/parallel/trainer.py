"""Sharded (multi-chip) training step via jit + GSPMD.

The single-device step (train/loop.py) is reused verbatim: under jit with
sharded inputs, XLA turns the batch-mean gradient into a DP allreduce over
ICI and the TP-annotated matmuls into partial matmuls + collectives.  There
is no separate "distributed trainer algorithm" — that is the point of the
TPU-native design (SURVEY.md §2.3).

BatchNorm note: batch statistics are jnp.means over the batch axis; with the
batch sharded over 'data', GSPMD computes the *global* mean automatically —
synchronised BatchNorm falls out for free (the single-device code passes
axis_name=None).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import CvTSpec, TrainConfig
from ..train.loop import make_train_step, make_eval_step
from ..train.optimizer import AdamState, adam_init
from .sharding import batch_sharding, cvt_param_sharding, replicate


def make_sharded_train_step(spec: CvTSpec, cfg: TrainConfig, mesh: Mesh,
                            params, state, opt: AdamState,
                            tensor_parallel: bool = True,
                            impl: str = "auto", augment=None):
    """Returns (step_fn, sharded (params, state, opt)).

    step_fn(params, state, opt, batch, rng, lr) with batch =
    (images, proc, labels, mask) sharded over 'data'.
    """
    pspec = cvt_param_sharding(params, mesh, tensor_parallel)
    rep = replicate(mesh)
    state_s = jax.tree_util.tree_map(lambda _: rep, state)
    opt_s = AdamState(step=rep,
                      mu=cvt_param_sharding(opt.mu, mesh, tensor_parallel),
                      nu=cvt_param_sharding(opt.nu, mesh, tensor_parallel))

    params = jax.device_put(params, pspec)
    state = jax.device_put(state, state_s)
    opt = jax.device_put(
        opt, AdamState(step=rep, mu=opt_s.mu, nu=opt_s.nu))

    data4 = batch_sharding(mesh, 4)
    data2 = batch_sharding(mesh, 2)
    data1 = batch_sharding(mesh, 1)
    batch_shardings = (data4, data2, data1, data1)

    step = make_train_step(spec, cfg, axis_name=None, impl=impl,
                           augment=augment)
    step = jax.jit(
        step,
        in_shardings=(pspec, state_s, opt_s, batch_shardings, rep, rep),
        out_shardings=(pspec, state_s, opt_s, None),
        donate_argnums=(0, 1, 2),
    )
    return step, (params, state, opt)


class ShardedTrainer:
    """Multi-chip DP(+TP) trainer wrapping the same epoch orchestration as
    train.TrainLoop; batches are globally shuffled then sharded over 'data'."""

    def __init__(self, spec: CvTSpec, cfg: TrainConfig, mesh: Mesh,
                 tensor_parallel: bool = True, impl: str = "auto",
                 augment=None):
        """augment: optional data.augment.AugmentConfig — on-device
        flip/rot90/crop/jitter inside the SAME jitted DP step (BASELINE
        config 4's composition: DP + ICI allreduce + augmentation in one
        program; dryrun_multichip covers it)."""
        from ..models.cvt import init_cvt

        self.spec, self.cfg, self.mesh = spec, cfg, mesh
        self.augment = augment
        key = jax.random.PRNGKey(cfg.seed)
        self.init_key, self.shuffle_key, self.dropout_key = \
            jax.random.split(key, 3)
        params, state = init_cvt(self.init_key, spec)
        opt = adam_init(params)
        self._step, (self.params, self.state, self.opt) = \
            make_sharded_train_step(spec, cfg, mesh, params, state, opt,
                                    tensor_parallel, impl, augment=augment)
        self.eval_step = jax.jit(
            make_eval_step(spec, cfg, impl=impl),
            in_shardings=(cvt_param_sharding(params, mesh, tensor_parallel),
                          jax.tree_util.tree_map(
                              lambda _: replicate(mesh), state),
                          batch_sharding(mesh, 4), batch_sharding(mesh, 2)),
        )

    def upload(self, images, proc, labels):
        """Device-resident dataset for the mesh: replicated across devices
        (uint8 corpus ≈ 0.5 GB — replication avoids a cross-device gather
        per batch; shard over 'data' instead if HBM-bound)."""
        from ..train.loop import make_gather_train_step
        from .sharding import batch_sharding, replicate

        rep = replicate(self.mesh)
        self._data_dev = (
            jax.device_put(jnp.asarray(images), rep),
            jax.device_put(jnp.asarray(proc), rep)
            if proc is not None else None,
            jax.device_put(jnp.asarray(np.asarray(labels, np.float32)),
                           rep),
        )
        if not hasattr(self, "_gstep"):
            self._gstep = jax.jit(
                make_gather_train_step(self.spec, self.cfg, impl="auto",
                                       augment=self.augment),
                donate_argnums=(0, 1, 2))
        return self._data_dev

    def train_epoch_device(self, n: int, epoch: int):
        """One epoch over the uploaded dataset; batch indices sharded over
        'data' so each device gathers + computes its shard (GSPMD turns the
        replicated-data gather into a local slice)."""
        from ..train.optimizer import lr_at_epoch

        cfg = self.cfg
        bs = cfg.batch_size
        lr = jnp.float32(lr_at_epoch(cfg.learning_rate, epoch,
                                     cfg.lr_decay, cfg.lr_decay_every))
        key = jax.random.fold_in(self.shuffle_key, epoch)
        perm = np.asarray(jax.random.permutation(key, n))
        steps_per_epoch = -(-n // bs)
        acc = jnp.zeros((3,), jnp.float32)
        for bi, s in enumerate(range(0, n, bs)):
            idx = perm[s:s + bs]
            real = len(idx)
            if real < bs:
                idx = np.concatenate([idx, np.zeros(bs - real, np.int64)])
            mask = np.zeros(bs, np.float32)
            mask[:real] = 1.0
            step_id = jnp.int32(epoch * steps_per_epoch + bi)
            # idx/mask sharded over 'data' => the gather produces a
            # data-sharded batch and the step runs data-parallel
            data1 = batch_sharding(self.mesh, 1)
            self.params, self.state, self.opt, acc = self._gstep(
                self.params, self.state, self.opt, self._data_dev,
                jax.device_put(jnp.asarray(idx), data1),
                jax.device_put(jnp.asarray(mask), data1), acc,
                self.dropout_key, step_id, lr)
        se, ae, cnt = np.asarray(acc)
        return {"loss": se / cnt, "mae": ae / cnt, "lr": float(lr)}

    def train_epoch_device_scan(self, n: int, epoch: int):
        """The production epoch path on a mesh: ONE compiled XLA program
        (lax.scan over the epoch's steps, train/loop.make_epoch_scan) with
        the per-step batch-index gather sharded over 'data'.  This is what
        real training runs (TrainLoop.fit device_data path), now executed
        under GSPMD: per-device local gathers, gradient allreduce over ICI,
        no per-step dispatch."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..train.loop import make_epoch_scan
        from ..train.optimizer import lr_at_epoch

        cfg = self.cfg
        bs = cfg.batch_size
        lr = jnp.float32(lr_at_epoch(cfg.learning_rate, epoch,
                                     cfg.lr_decay, cfg.lr_decay_every))
        if not hasattr(self, "_escan"):
            # idx/mask (S, B): shard the within-step batch dim over 'data'
            sb = NamedSharding(self.mesh, P(None, "data"))
            self._escan = jax.jit(
                make_epoch_scan(self.spec, self.cfg, impl="auto",
                                augment=self.augment),
                in_shardings=(None, None, None, None, sb, sb, None, None,
                              None),
                donate_argnums=(0, 1, 2))
        key = jax.random.fold_in(self.shuffle_key, epoch)
        perm = np.asarray(jax.random.permutation(key, n))
        idxs, masks = [], []
        for s in range(0, n, bs):
            idx = perm[s:s + bs]
            real = len(idx)
            if real < bs:
                idx = np.concatenate([idx, np.zeros(bs - real, np.int64)])
            mask = np.zeros(bs, np.float32)
            mask[:real] = 1.0
            idxs.append(idx)
            masks.append(mask)
        steps = len(idxs)
        step_ids = jnp.arange(epoch * steps, epoch * steps + steps,
                              dtype=jnp.int32)
        self.params, self.state, self.opt, acc = self._escan(
            self.params, self.state, self.opt, self._data_dev,
            jnp.asarray(np.stack(idxs)), jnp.asarray(np.stack(masks)),
            step_ids, self.dropout_key, lr)
        se, ae, cnt = np.asarray(acc)
        return {"loss": se / cnt, "mae": ae / cnt, "lr": float(lr)}

    def save(self, ckpt_dir: str, epoch: int, metadata=None) -> str:
        """Per-process sharded checkpoint of (params, state, opt) — each
        host writes only its addressable shards (train/sharded_checkpoint).
        """
        from ..train.sharded_checkpoint import save_sharded_checkpoint

        return save_sharded_checkpoint(ckpt_dir, self.params, self.state,
                                       self.opt, epoch, metadata)

    def load(self, ckpt_dir: str) -> Optional[int]:
        """Resume from the latest sharded checkpoint in ckpt_dir, restoring
        shard-by-shard onto this trainer's mesh layout.  Returns the saved
        epoch, or None if no checkpoint exists."""
        from ..train.sharded_checkpoint import (latest_sharded_checkpoint,
                                                restore_sharded_checkpoint)

        manifest = latest_sharded_checkpoint(ckpt_dir)
        if manifest is None:
            return None
        self.params, self.state, self.opt, epoch = \
            restore_sharded_checkpoint(manifest, self.params, self.state,
                                       self.opt)
        return epoch

    def train_epoch(self, images, proc, labels, epoch: int):
        from ..train.optimizer import lr_at_epoch

        cfg = self.cfg
        n = len(labels)
        bs = cfg.batch_size
        lr = lr_at_epoch(cfg.learning_rate, epoch, cfg.lr_decay,
                         cfg.lr_decay_every)
        key = jax.random.fold_in(self.shuffle_key, epoch)
        perm = np.asarray(jax.random.permutation(key, n))
        tot_se = tot_ae = tot_n = 0.0
        for bi, s in enumerate(range(0, n, bs)):
            idx = perm[s:s + bs]
            real = len(idx)
            if real < bs:
                idx = np.concatenate([idx, np.zeros(bs - real, np.int64)])
            mask = np.zeros(bs, np.float32)
            mask[:real] = 1.0
            x = images[idx]
            x = x.astype(np.float32) / 255.0 if x.dtype == np.uint8 else x
            batch = (jnp.asarray(x),
                     jnp.asarray(proc[idx]) if proc is not None else None,
                     jnp.asarray(np.asarray(labels)[idx], np.float32),
                     jnp.asarray(mask))
            rng = jax.random.fold_in(
                jax.random.fold_in(self.dropout_key, epoch), bi)
            self.params, self.state, self.opt, m = self._step(
                self.params, self.state, self.opt, batch, rng,
                jnp.float32(lr))
            tot_se += float(m["se"])
            tot_ae += float(m["ae"])
            tot_n += float(m["n"])
        return {"loss": tot_se / tot_n, "mae": tot_ae / tot_n, "lr": lr}
