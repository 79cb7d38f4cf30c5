"""ViT-B/16 fine-tune throughput (BASELINE.json config 3): full fwd+bwd
AdamW train step at 224px on SLS-derived data, single chip.

Data is the real SLS corpus (128px grayscale layer images) resized
on-device to 224px, with 4-way quantile classes derived from the 50HZ_Bm
label column — the content doesn't affect throughput, but the pipeline is
the SLS one.  Reports img/s and ms/step at the given batch; writes
Result/vit_finetune_bench.json.

Run on an idle chip.  Usage: python scripts/bench_vit_finetune.py [batch]
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from transformer_stm_tpu.config import (DataConfig, TrainConfig,
                                        VIT_PRESETS)
from transformer_stm_tpu.models.vit import init_vit
from transformer_stm_tpu.train.optimizer import adam_init
from transformer_stm_tpu.train.vit_train import make_vit_train_step


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spec = dataclasses.replace(VIT_PRESETS["ViT-B/16"], num_channels=1,
                               num_classes=4)
    cfg = TrainConfig(batch_size=batch, compute_dtype="bfloat16",
                      optimizer="adamw", weight_decay=0.05,
                      label_smoothing=0.1, loss="softmax_xent")

    # SLS-derived batch: corpus layers + quantile classes of 50HZ_Bm
    from transformer_stm_tpu.data.images import decode_corpus
    from transformer_stm_tpu.data.labels import (LabelTable, ProcessTable,
                                                 build_target_arrays)
    dc = DataConfig()
    corpus = np.asarray(decode_corpus(dc))          # (N, L, H, W)
    n_spec, L = corpus.shape[0], dc.image_layers
    t = build_target_arrays(dc, "50HZ_Bm", LabelTable.load(dc.excel_labels),
                            ProcessTable.load(dc.excel_process))
    y = np.asarray(t["labels"], np.float32)[::L]
    valid = np.asarray(t["valid_indices"], np.int64)[:len(y)]
    qs = np.quantile(y, [0.25, 0.5, 0.75])
    cls = np.digitize(y, qs).astype(np.int32)       # 4 classes

    rng = np.random.default_rng(0)
    pick = rng.integers(0, len(valid), batch)
    layer = rng.integers(0, L, batch)
    imgs128 = corpus[valid[pick], layer][..., None]  # (B, 128, 128, 1)
    labels = jnp.asarray(cls[pick])
    imgs_dev = jnp.asarray(imgs128, jnp.float32) / 255.0

    params = init_vit(jax.random.PRNGKey(0), spec)
    opt = adam_init(params)
    step = make_vit_train_step(spec, cfg)
    mask = jnp.ones((batch,), jnp.float32)

    def run(n, params, opt, imgs):
        def body(i, carry):
            params, opt, _ = carry
            x = jax.image.resize(
                imgs + jnp.float32(1e-4) * i.astype(jnp.float32),
                (batch, 224, 224, 1), "bilinear")
            params, opt, metrics = step(
                params, opt, (x, labels, mask),
                jax.random.fold_in(jax.random.PRNGKey(1), i),
                jnp.float32(1e-4))
            return params, opt, metrics["loss"]
        return jax.lax.fori_loop(0, n, body,
                                 (params, opt, jnp.float32(0)))[2]

    r = jax.jit(run, static_argnums=0)
    iters = 20
    float(r(iters, params, opt, imgs_dev))
    float(r(1, params, opt, imgs_dev))
    t0 = time.perf_counter(); float(r(1, params, opt, imgs_dev))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter(); float(r(iters, params, opt, imgs_dev))
    t_all = time.perf_counter() - t0
    dt = (t_all - t_one) / (iters - 1)
    ips = batch / dt
    stats = jax.devices()[0].memory_stats() or {}
    out = {"model": "ViT-B/16 @224 (1ch, 4-class)", "batch": batch,
           "ms_per_step": round(dt * 1e3, 2),
           "img_per_s": round(ips, 1),
           "optimizer": "adamw+label_smoothing",
           "hbm_peak_gib": round(
               stats.get("peak_bytes_in_use", 0) / 2**30, 2)}
    with open("Result/vit_finetune_bench.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
