"""Jitted training / evaluation loop.

Replaces the reference's model.fit harness (models/CvT(Par).py:464-476):
Adam + MSE loss + MAE metric, per-epoch shuffling, per-epoch validation,
LR x0.8 every 50 epochs, per-epoch records — plus what the reference lacks
(SURVEY.md §5.3-5.4): mid-run checkpointing with resume, seeded determinism,
and optional data-parallel sharding over a device mesh.

TPU-first details:
- one compiled train step reused for every batch: the last partial batch is
  padded to the static batch size and masked in the loss/metrics, so XLA
  compiles exactly one step (no recompiles, bitwise-correct epoch metrics);
- params/opt-state donation keeps HBM flat;
- batches are built on host as one epoch-wide gather then fed
  device_put'ed per step (sharded along 'data' when a mesh is given).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CvTSpec, TrainConfig
from ..models.cvt import cvt_forward
from .optimizer import AdamState, adam_init, adam_update, lr_at_epoch


def _masked_mse_mae(pred, y, mask):
    """Mean over *real* rows only — matches Keras metrics over an epoch when
    the final batch is padded."""
    pred = pred.reshape(-1).astype(jnp.float32)
    y = y.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(mask), 1.0)
    se = jnp.sum(jnp.square(pred - y) * mask)
    ae = jnp.sum(jnp.abs(pred - y) * mask)
    return se / n, ae / n, se, ae


def make_train_step(spec: CvTSpec, cfg: TrainConfig,
                    axis_name: Optional[str] = None,
                    impl: str = "auto", augment=None) -> Callable:
    """Returns step(params, state, opt, batch, rng, lr) ->
    (params, state, opt, metrics).  batch = (images, proc, labels, mask).

    With axis_name set, gradients/metrics are psum'ed across the 'data' mesh
    axis — the ICI allreduce that replaces the reference's absent
    distributed backend (SURVEY.md §2.4).

    augment: optional data.augment.AugmentConfig — on-device flip/rot90/
    crop/jitter fused into the same jitted step (BASELINE config 4; the
    reference's counterpart is the *offline* tools/Rotate.py:4-46).  Each
    step's augmentation key splits off the dropout rng, so DP shards draw
    independent parameters for their rows.
    """
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" \
        else jnp.float32

    def loss_fn(params, state, images, proc, labels, mask, rng):
        if augment is not None:
            from ..data.augment import augment_batch

            r_aug, rng = jax.random.split(rng)
            images = augment_batch(r_aug, images, augment)
        x = images.astype(compute_dtype)
        p = proc.astype(compute_dtype) if proc is not None else None
        out, new_state = cvt_forward(params, state, spec, x, p, train=True,
                                     rng=rng, impl=impl, axis_name=axis_name)
        loss, mae_v, se, ae = _masked_mse_mae(out, labels, mask)
        return loss, (new_state, mae_v, se, ae)

    def step(params, state, opt: AdamState, batch, rng, lr):
        images, proc, labels, mask = batch
        (loss, (new_state, mae_v, se, ae)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, images, proc, labels,
                                   mask, rng)
        if axis_name is not None:
            # psum the *sums* (se/ae/n) so per-shard partial batches report
            # global metrics, then derive global means — a plain pmean of
            # loss/mae would mis-weight shards with masked rows.
            grads = jax.lax.pmean(grads, axis_name)
            se = jax.lax.psum(se, axis_name)
            ae = jax.lax.psum(ae, axis_name)
            mask = jax.lax.psum(jnp.sum(mask), axis_name)
            loss = se / jnp.maximum(mask, 1.0)
            mae_v = ae / jnp.maximum(mask, 1.0)
        params, opt = adam_update(grads, opt, params, lr,
                                  weight_decay=cfg.weight_decay)
        metrics = {"loss": loss, "mae": mae_v, "se": se, "ae": ae,
                   "n": jnp.sum(mask) if axis_name is None else mask}
        return params, state_merge(state, new_state), opt, metrics

    return step


def state_merge(old, new):
    """BatchNorm state update — new state simply replaces old."""
    return new


def make_gather_train_step(spec: CvTSpec, cfg: TrainConfig,
                           impl: str = "auto", augment=None) -> Callable:
    """Device-resident-data variant: the whole train set lives in HBM
    (uint8 images ~0.5 GB for the largest target) and each step gathers its
    batch by indices *inside* jit — no per-step host->device transfer.
    This is the TPU-native input pipeline for datasets that fit in HBM;
    over the tunnelled device it is the difference between ~2 GB/epoch of
    host traffic and ~2 KB.

    step(params, state, opt, data, idx, mask, rng, lr) with
    data = (images_u8 (N,H,W,1), proc (N,P)|None, labels (N,)).
    """
    base = make_train_step(spec, cfg, impl=impl, augment=augment)

    def step(params, state, opt, data, idx, mask, acc, rng_base, step_id,
             lr):
        """acc: (3,) f32 running [sum_se, sum_ae, sum_n] — metrics
        accumulate on device so the host loop never blocks on a fetch;
        the dropout key folds from the global step index inside jit."""
        images, proc, labels = data
        batch = (images[idx].astype(jnp.float32) / 255.0,
                 proc[idx] if proc is not None else None,
                 labels[idx], mask)
        rng = jax.random.fold_in(rng_base, step_id)
        params, state, opt, m = base(params, state, opt, batch, rng, lr)
        acc = acc + jnp.stack([m["se"], m["ae"], m["n"]])
        return params, state, opt, acc

    return step


def make_epoch_scan(spec: CvTSpec, cfg: TrainConfig,
                    impl: str = "auto", augment=None) -> Callable:
    """Whole-epoch training as ONE compiled XLA program: lax.scan over the
    epoch's batch indices with the gather step as body.  On the tunnelled
    device this removes every per-step dispatch (~2.7 ms x 233 steps for
    the flagship target); numerics identical to the per-step gather path
    (same index order, same fold_in(step_id) dropout keys).

    epoch(params, state, opt, data, idx (S, B), mask (S, B),
          step_ids (S,), rng_base, lr) -> (params, state, opt, acc)
    """
    step = make_gather_train_step(spec, cfg, impl=impl, augment=augment)

    def epoch(params, state, opt, data, idx, mask, step_ids, rng_base, lr):
        acc0 = jnp.zeros((3,), jnp.float32)

        def body(carry, xs):
            params, state, opt, acc = carry
            i, m, sid = xs
            params, state, opt, acc = step(
                params, state, opt, data, i, m, acc, rng_base, sid, lr)
            return (params, state, opt, acc), None

        (params, state, opt, acc), _ = jax.lax.scan(
            body, (params, state, opt, acc0), (idx, mask, step_ids))
        return params, state, opt, acc

    return epoch


def make_eval_step(spec: CvTSpec, cfg: TrainConfig,
                   impl: str = "auto", exact: bool = False) -> Callable:
    """exact=True evaluates in float32 end-to-end with float32 matmul
    precision.  On TPU the DEFAULT precision computes f32 dots as a
    single bf16 MXU pass, which systematically degrades final metrics
    vs the reference's true-f32 TF eval (measured on 200HZ_Pcv: R²
    0.9868 default vs 0.9875 exact = the TF number to 8 decimals) —
    metrics exports must use exact; per-epoch validation keeps the
    fast default."""
    compute_dtype = jnp.float32 if exact else (
        jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32)

    def step(params, state, images, proc):
        from contextlib import nullcontext
        x = images.astype(compute_dtype)
        p = proc.astype(compute_dtype) if proc is not None else None
        ctx = jax.default_matmul_precision("float32") if exact \
            else nullcontext()
        with ctx:
            out, _ = cvt_forward(params, state, spec, x, p, train=False,
                                 impl="xla" if exact else impl)
        return out.reshape(-1).astype(jnp.float32)

    return step


class TrainLoop:
    """Single-host training orchestrator (multi-chip via parallel.trainer).

    Usage:
        loop = TrainLoop(spec, cfg)
        result = loop.fit(images, proc, labels, val=(vi, vp, vl))
    images are uint8 (N, H, W, 1); normalization (/255) happens on device
    (models/CvT(Par).py:423 parity).
    """

    def __init__(self, spec: CvTSpec, cfg: TrainConfig, impl: str = "auto",
                 callbacks=None):
        self.spec = spec
        self.cfg = cfg
        self.impl = impl
        self.callbacks = callbacks or []
        key = jax.random.PRNGKey(cfg.seed)
        self.init_key, self.shuffle_key, self.dropout_key = \
            jax.random.split(key, 3)
        from ..models.cvt import init_cvt
        self.params, self.state = init_cvt(self.init_key, spec)
        self.opt = adam_init(self.params)
        self.epoch = 0
        self._step = jax.jit(make_train_step(spec, cfg, impl=impl),
                             donate_argnums=(0, 1, 2))
        self._gather_step = jax.jit(
            make_gather_train_step(spec, cfg, impl=impl),
            donate_argnums=(0, 1, 2))
        self._eval = jax.jit(make_eval_step(spec, cfg, impl=impl))
        eval_step = make_eval_step(spec, cfg, impl=impl)

        def gather_eval(params, state, data, idx):
            images, proc = data
            return eval_step(params, state,
                             images[idx].astype(jnp.float32) / 255.0,
                             proc[idx] if proc is not None else None)

        self._gather_eval = jax.jit(gather_eval)

        def val_metrics(params, state, data, labels, idx, mask):
            """(sum_se, sum_ae, n) for one val batch — stays on device."""
            pred = gather_eval(params, state, data, idx)
            y = labels[idx]
            d = pred - y
            return jnp.stack([jnp.sum(jnp.square(d) * mask),
                              jnp.sum(jnp.abs(d) * mask),
                              jnp.sum(mask)])

        self._val_metrics = jax.jit(val_metrics)
        self._epoch_scan = jax.jit(make_epoch_scan(spec, cfg, impl=impl),
                                   donate_argnums=(0, 1, 2))

    # -- data feeding ------------------------------------------------------

    def _batches(self, n: int, epoch: int):
        """Shuffled batch index arrays; the final partial batch is padded
        (pad rows masked out in loss/metrics).

        Known, deliberate deviation from Keras: the pad rows (duplicates of
        train row 0) still enter the dw_bn BatchNorm *batch statistics* of
        that one final batch per epoch, whereas Keras runs the last batch at
        its true size.  Loss/metrics/gradients mask the pads exactly; only
        the BN normalisation of the ≤127 real rows in the final batch (and
        the running stats) sees them — a static-shape trade XLA needs to
        avoid a per-epoch recompile."""
        bs = self.cfg.batch_size
        key = jax.random.fold_in(self.shuffle_key, epoch)
        perm = np.asarray(jax.random.permutation(key, n))
        for s in range(0, n, bs):
            idx = perm[s:s + bs]
            real = len(idx)
            if real < bs:
                idx = np.concatenate([idx, np.zeros(bs - real, np.int64)])
            mask = np.zeros(bs, np.float32)
            mask[:real] = 1.0
            yield idx, mask

    def _prep(self, images, idx):
        x = images[idx].astype(np.float32) / 255.0 \
            if images.dtype == np.uint8 else images[idx]
        return x

    # -- API ---------------------------------------------------------------

    def fit(self, images, proc, labels, val=None, epochs: Optional[int] = None,
            records=None, verbose: bool = True,
            checkpoint_dir: Optional[str] = None,
            device_data: Optional[bool] = None):
        """Returns dict with final params/state and per-epoch records.

        device_data (default: auto) uploads the whole dataset to HBM once
        (uint8) and gathers batches on device — no per-step host transfer."""
        from .metrics import RecordsWriter
        from .checkpoint import save_checkpoint

        cfg = self.cfg
        n = len(labels)
        epochs = epochs if epochs is not None else cfg.epochs
        records = records if records is not None else RecordsWriter()
        labels = np.asarray(labels, np.float32)
        if device_data is None:
            device_data = (images.dtype == np.uint8
                           and images.nbytes < 4 << 30)

        data_dev = val_dev = None
        if device_data:
            data_dev = (jnp.asarray(images),
                        jnp.asarray(proc) if proc is not None else None,
                        jnp.asarray(labels))
            if val is not None:
                vi, vp, vl = val
                val_dev = (jnp.asarray(vi),
                           jnp.asarray(vp) if vp is not None else None,
                           jnp.asarray(np.asarray(vl, np.float32)))

        for epoch in range(self.epoch, epochs):
            lr = lr_at_epoch(cfg.learning_rate, epoch, cfg.lr_decay,
                             cfg.lr_decay_every)
            t0 = time.time()
            if device_data:
                steps_per_epoch = -(-n // cfg.batch_size)
                lr_dev = jnp.float32(lr)
                idxs, masks = zip(*self._batches(n, epoch))
                idx_m = jnp.asarray(np.stack(idxs))
                mask_m = jnp.asarray(np.stack(masks))
                step_ids = jnp.arange(
                    epoch * steps_per_epoch,
                    epoch * steps_per_epoch + len(idxs), dtype=jnp.int32)
                # one compiled XLA program per epoch (lax.scan over steps)
                self.params, self.state, self.opt, acc = self._epoch_scan(
                    self.params, self.state, self.opt, data_dev,
                    idx_m, mask_m, step_ids, self.dropout_key, lr_dev)
                tot_se, tot_ae, tot_n = np.asarray(acc)
            else:
                tot_se = tot_ae = tot_n = 0.0
                for bi, (idx, mask) in enumerate(self._batches(n, epoch)):
                    rng = jax.random.fold_in(
                        jax.random.fold_in(self.dropout_key, epoch), bi)
                    batch = (jnp.asarray(self._prep(images, idx)),
                             jnp.asarray(proc[idx])
                             if proc is not None else None,
                             jnp.asarray(labels[idx]), jnp.asarray(mask))
                    self.params, self.state, self.opt, m = self._step(
                        self.params, self.state, self.opt, batch, rng,
                        jnp.float32(lr))
                    tot_se += float(m["se"])
                    tot_ae += float(m["ae"])
                    tot_n += float(m["n"])
            loss = tot_se / tot_n
            mae_v = tot_ae / tot_n

            val_loss = val_mae = None
            if val is not None:
                vi, vp, vl = val
                if device_data:
                    val_loss, val_mae = self._val_metrics_device(
                        val_dev, vl)
                else:
                    pred = self.predict(vi, vp)
                    vl = np.asarray(vl, np.float64).ravel()
                    val_loss = float(np.mean((pred - vl) ** 2))
                    val_mae = float(np.mean(np.abs(pred - vl)))

            records.log(epoch, loss, mae_v, val_loss, val_mae, lr)
            if verbose:
                msg = (f"epoch {epoch + 1}/{epochs} loss {loss:.4f} "
                       f"mae {mae_v:.4f}")
                if val_loss is not None:
                    msg += f" val_loss {val_loss:.4f} val_mae {val_mae:.4f}"
                print(msg + f" lr {lr:.2e} ({time.time() - t0:.1f}s)")
            for cb in self.callbacks:
                cb(self, epoch, {"loss": loss, "mae": mae_v,
                                 "val_loss": val_loss, "val_mae": val_mae})

            self.epoch = epoch + 1
            if (checkpoint_dir and cfg.checkpoint_every
                    and (epoch + 1) % cfg.checkpoint_every == 0):
                save_checkpoint(checkpoint_dir, self.params, self.state,
                                self.opt, step=self.epoch)

        return {"params": self.params, "state": self.state,
                "opt": self.opt, "records": records}

    def _val_metrics_device(self, val_dev, vl):
        """Per-epoch validation metrics with device-side accumulation —
        one scalar fetch per epoch instead of one prediction fetch per
        batch."""
        vi_dev, vp_dev, vl_dev = val_dev
        n = len(vl)
        bs = self.cfg.batch_size
        acc = jnp.zeros((3,), jnp.float32)
        for s in range(0, n, bs):
            idx = np.arange(s, min(s + bs, n))
            real = len(idx)
            if real < bs:
                idx = np.concatenate([idx, np.zeros(bs - real, np.int64)])
            mask = np.zeros(bs, np.float32)
            mask[:real] = 1.0
            acc = acc + self._val_metrics(
                self.params, self.state, (vi_dev, vp_dev), vl_dev,
                jnp.asarray(idx), jnp.asarray(mask))
        se, ae, cnt = np.asarray(acc)
        return float(se / cnt), float(ae / cnt)

    def _predict_dev(self, data_dev, n: int):
        """Batched inference over device-resident data."""
        bs = self.cfg.batch_size
        outs = []
        for s in range(0, n, bs):
            idx = np.arange(s, min(s + bs, n))
            real = len(idx)
            if real < bs:
                idx = np.concatenate([idx, np.zeros(bs - real, np.int64)])
            out = self._gather_eval(self.params, self.state, data_dev,
                                    jnp.asarray(idx))
            outs.append(np.asarray(out)[:real])
        return np.concatenate(outs)

    def predict(self, images, proc, batch_size: Optional[int] = None,
                exact: bool = False):
        """Batched inference -> np.float32 (N,).

        exact=True runs the f32/float32-precision eval (metrics exports —
        see make_eval_step; the jitted step is built lazily and cached)."""
        if exact and not hasattr(self, "_eval_exact"):
            self._eval_exact = jax.jit(
                make_eval_step(self.spec, self.cfg, impl=self.impl,
                               exact=True))
        eval_fn = self._eval_exact if exact else self._eval
        bs = batch_size or self.cfg.batch_size
        n = len(images)
        outs = []
        for s in range(0, n, bs):
            idx = np.arange(s, min(s + bs, n))
            real = len(idx)
            if real < bs:  # pad to keep one compiled shape
                idx = np.concatenate([idx, np.zeros(bs - real, np.int64)])
            out = eval_fn(self.params, self.state,
                          jnp.asarray(self._prep(images, idx)),
                          jnp.asarray(proc[idx])
                          if proc is not None else None)
            outs.append(np.asarray(out)[:real])
        return np.concatenate(outs)
