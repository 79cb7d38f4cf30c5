"""ViT classification fine-tune (BASELINE.json config 3: ViT-B/16 fwd+bwd,
AdamW, label smoothing, on an SLS defect/classification dataset).

The CvT regression loop (train/loop.py) covers the reference's own task;
this module covers the plain-ViT classification configs the north star
names.  Same TPU discipline: one compiled step, masked ragged batch,
optional on-device augmentation inside the jitted step, bf16 compute with
f32 params/optimizer.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig, ViTSpec
from ..data.augment import AugmentConfig, augment_batch
from ..models.vit import init_vit, vit_forward
from .optimizer import AdamState, adam_init, adam_update, lr_at_epoch


def softmax_xent(logits, labels, num_classes: int,
                 label_smoothing: float = 0.0):
    """Per-sample cross-entropy with label smoothing; labels int (B,)."""
    logits = logits.astype(jnp.float32)
    off = label_smoothing / num_classes
    on = 1.0 - label_smoothing + off
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    targets = onehot * on + (1.0 - onehot) * off
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(targets * logp, axis=-1)


def make_vit_train_step(spec: ViTSpec, cfg: TrainConfig,
                        augment: Optional[AugmentConfig] = None,
                        impl: str = "auto") -> Callable:
    """step(params, opt, batch, rng, lr) -> (params, opt, metrics);
    batch = (images f32 [0,1], labels int32, mask f32)."""
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" \
        else jnp.float32

    def loss_fn(params, images, labels, mask, rng):
        r_aug, r_drop = jax.random.split(rng)
        x = images
        if augment is not None:
            x = augment_batch(r_aug, x, augment)
        x = x.astype(compute_dtype)
        logits = vit_forward(params, spec, x, train=True, rng=r_drop,
                             impl=impl)
        per = softmax_xent(logits, labels, spec.num_classes,
                           cfg.label_smoothing)
        n = jnp.maximum(jnp.sum(mask), 1.0)
        loss = jnp.sum(per * mask) / n
        acc = jnp.sum((jnp.argmax(logits, -1) == labels) * mask) / n
        return loss, acc

    def step(params, opt: AdamState, batch, rng, lr):
        images, labels, mask = batch
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images, labels, mask, rng)
        params, opt = adam_update(grads, opt, params, lr,
                                  weight_decay=cfg.weight_decay)
        return params, opt, {"loss": loss, "acc": acc}

    return step


class ViTTrainer:
    """Minimal classification fine-tune driver."""

    def __init__(self, spec: ViTSpec, cfg: TrainConfig,
                 augment: Optional[AugmentConfig] = None,
                 impl: str = "auto"):
        self.spec, self.cfg = spec, cfg
        key = jax.random.PRNGKey(cfg.seed)
        self.init_key, self.shuffle_key, self.step_key = \
            jax.random.split(key, 3)
        self.params = init_vit(self.init_key, spec)
        self.opt = adam_init(self.params)
        self._step = jax.jit(make_vit_train_step(spec, cfg, augment, impl),
                             donate_argnums=(0, 1))
        self._fwd = jax.jit(
            lambda p, x: vit_forward(p, spec, x, train=False, impl=impl))
        self.epoch = 0
        # [epoch, loss, acc, val_loss|None, val_acc|None, lr] per epoch
        self.records: list = []

    def save(self, ckpt_dir: str) -> str:
        """Atomic (params, opt, epoch) checkpoint + records sidecar —
        same resume discipline as the CvT loop (train/checkpoint.py)."""
        from .checkpoint import save_checkpoint

        path = save_checkpoint(ckpt_dir, self.params, {}, self.opt,
                               self.epoch, {"records": self.records})
        return path

    def load(self, ckpt_dir: str) -> bool:
        """Resume from the latest checkpoint in ckpt_dir (if any)."""
        import json
        import os

        from .checkpoint import latest_checkpoint, load_checkpoint

        path = latest_checkpoint(ckpt_dir)
        if path is None:
            return False
        self.params, _, self.opt, self.epoch = load_checkpoint(
            path, self.params, {}, self.opt)
        with open(path[:-4] + ".json") as f:
            self.records = json.load(f).get("records", [])
        return True

    def write_records(self, path: str) -> None:
        """Training-curve xlsx in the reference's records schema."""
        from ..data.xlsx import write_xlsx

        rows = [["epoch", "loss", "acc", "val_loss", "val_acc", "lr"]] \
            + self.records
        import os
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        write_xlsx(path, {"Sheet1": rows})

    def train_epoch(self, images, labels, epoch: Optional[int] = None):
        cfg = self.cfg
        epoch = self.epoch if epoch is None else epoch
        n = len(labels)
        bs = cfg.batch_size
        lr = lr_at_epoch(cfg.learning_rate, epoch, cfg.lr_decay,
                         cfg.lr_decay_every)
        perm = np.asarray(jax.random.permutation(
            jax.random.fold_in(self.shuffle_key, epoch), n))
        losses, accs = [], []
        for bi, s in enumerate(range(0, n, bs)):
            idx = perm[s:s + bs]
            real = len(idx)
            if real < bs:
                idx = np.concatenate([idx, np.zeros(bs - real, np.int64)])
            mask = np.zeros(bs, np.float32)
            mask[:real] = 1.0
            x = images[idx]
            if x.dtype == np.uint8:
                x = x.astype(np.float32) / 255.0
            rng = jax.random.fold_in(
                jax.random.fold_in(self.step_key, epoch), bi)
            self.params, self.opt, m = self._step(
                self.params, self.opt,
                (jnp.asarray(x), jnp.asarray(idx_labels(labels, idx)),
                 jnp.asarray(mask)), rng, jnp.float32(lr))
            losses.append(float(m["loss"]))
            accs.append(float(m["acc"]))
        self.epoch = epoch + 1
        m = {"loss": float(np.mean(losses)), "acc": float(np.mean(accs)),
             "lr": lr}
        self.records.append([epoch + 1, m["loss"], m["acc"], None, None,
                             lr])
        return m

    def evaluate(self, images, labels, batch_size: Optional[int] = None):
        """Held-out loss/accuracy (batched inference)."""
        logits = self.predict(images, batch_size)
        labels = np.asarray(labels).astype(np.int64)
        per = np.asarray(softmax_xent(jnp.asarray(logits),
                                      jnp.asarray(labels),
                                      self.spec.num_classes,
                                      self.cfg.label_smoothing))
        acc = float(np.mean(np.argmax(logits, -1) == labels))
        return {"loss": float(per.mean()), "acc": acc}

    def fit(self, images, labels, epochs: int, val_images=None,
            val_labels=None, val_split: float = 0.0,
            checkpoint_dir: Optional[str] = None,
            checkpoint_every: int = 10, verbose: bool = True):
        """Full orchestration: optional holdout split, per-epoch train +
        eval records, periodic checkpoint + resume-from-latest."""
        if val_images is None and val_split > 0.0:
            n = len(labels)
            n_val = max(1, int(n * val_split))
            perm = np.asarray(jax.random.permutation(
                jax.random.fold_in(self.shuffle_key, 0xFFFFFFFF), n))
            val_idx, tr_idx = perm[:n_val], perm[n_val:]
            val_images, val_labels = images[val_idx], \
                np.asarray(labels)[val_idx]
            images, labels = images[tr_idx], np.asarray(labels)[tr_idx]
        if checkpoint_dir:
            self.load(checkpoint_dir)
        while self.epoch < epochs:
            m = self.train_epoch(images, labels)
            if val_images is not None:
                vm = self.evaluate(val_images, val_labels)
                self.records[-1][3] = vm["loss"]
                self.records[-1][4] = vm["acc"]
            if verbose:
                extra = (f" val_loss {self.records[-1][3]:.4f} "
                         f"val_acc {self.records[-1][4]:.4f}"
                         if val_images is not None else "")
                print(f"epoch {self.epoch}/{epochs} loss {m['loss']:.4f} "
                      f"acc {m['acc']:.4f}{extra}", flush=True)
            if checkpoint_dir and (self.epoch % checkpoint_every == 0
                                   or self.epoch >= epochs):
                self.save(checkpoint_dir)
        return self

    def predict(self, images, batch_size: Optional[int] = None):
        bs = batch_size or self.cfg.batch_size
        outs = []
        for s in range(0, len(images), bs):
            x = images[s:s + bs]
            if x.dtype == np.uint8:
                x = x.astype(np.float32) / 255.0
            pad = bs - len(x)
            if pad:
                x = np.concatenate([x, np.zeros((pad,) + x.shape[1:],
                                                x.dtype)])
            logits = np.asarray(self._fwd(self.params, jnp.asarray(x)))
            outs.append(logits[:bs - pad] if pad else logits)
        return np.concatenate(outs)


def idx_labels(labels, idx):
    return np.asarray(labels)[idx].astype(np.int32)
