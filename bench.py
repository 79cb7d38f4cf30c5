"""Benchmark: batched inference throughput on the flagship configs.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Headline metric (BASELINE.json north star): 224px images/sec/chip, batched
ViT-S/16 inference in bfloat16 with Pallas kernels, baseline target 10,000.
Supplementary numbers (CvT-128 inference, CvT train step) go to stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_SEC = 10_000.0


_sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def _sync(x):
    """Force completion. On the axon (tunnelled-TPU) platform
    block_until_ready can resolve before execution finishes, so fetch a
    device-reduced scalar — completion of the fetch implies completion of
    everything queued before it, and only 4 bytes cross the tunnel."""
    float(_sum(jax.tree_util.tree_leaves(x)[0]))


def _time_fn(fn, *args, iters=20, warmup=3, vary=None):
    """vary: index of the arg to perturb per iteration (defeats any
    result caching for identical calls)."""
    args = list(args)
    variants = None
    if vary is not None:
        base = args[vary]
        variants = [base + jnp.asarray(i, base.dtype) for i in range(iters)]
        for v in variants:
            v.block_until_ready()
    for w in range(warmup):
        if variants is not None:
            args[vary] = variants[w % iters]
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for i in range(iters):
        if variants is not None:
            args[vary] = variants[i]
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def bench_vit_inference(batch=192, dtype=jnp.bfloat16):
    from transformer_stm_tpu.config import VIT_PRESETS
    from transformer_stm_tpu.models import init_vit, vit_forward

    spec = VIT_PRESETS["ViT-S/16"]
    params = init_vit(jax.random.PRNGKey(0), spec)
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (batch, 224, 224, 3), dtype)

    @jax.jit
    def fn(p, x):
        return vit_forward(p, spec, x, train=False)

    dt = _time_fn(fn, params, images, vary=1)
    return batch / dt


def bench_vit_with_preprocessing(batch=192, dtype=jnp.bfloat16):
    """BASELINE.json config 2: raw uint8 RGB (345x340 melt-pool frames) ->
    fused on-device resize/grayscale/normalize -> ViT-S/16 @224."""
    from transformer_stm_tpu.config import VIT_PRESETS
    from transformer_stm_tpu.data.images import preprocess_images_device
    from transformer_stm_tpu.models import init_vit, vit_forward
    import dataclasses

    spec = dataclasses.replace(VIT_PRESETS["ViT-S/16"], num_channels=1)
    params = init_vit(jax.random.PRNGKey(0), spec)
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    raw = jax.random.randint(jax.random.PRNGKey(1), (batch, 345, 340, 3),
                             0, 255, jnp.uint8)

    @jax.jit
    def fn(p, x):
        img = preprocess_images_device(x, 224, 224, dtype=dtype)
        return vit_forward(p, spec, img, train=False)

    dt = _time_fn(fn, params, raw, vary=1)
    return batch / dt


def bench_cvt_inference(batch=512, dtype=jnp.bfloat16):
    from transformer_stm_tpu.config import CvTSpec
    from transformer_stm_tpu.models import init_cvt, cvt_forward

    spec = CvTSpec()
    params, state = init_cvt(jax.random.PRNGKey(0), spec)
    cast = lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x
    params = jax.tree_util.tree_map(cast, params)
    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (batch, 128, 128, 1), dtype)
    proc = jax.random.uniform(jax.random.PRNGKey(2), (batch, 5), dtype)

    @jax.jit
    def fn(p, s, x, pr):
        out, _ = cvt_forward(p, s, spec, x, pr, train=False)
        return out

    dt = _time_fn(fn, params, state, images, proc, vary=2)
    return batch / dt


def bench_cvt_train_step(batch=128):
    from transformer_stm_tpu.config import CvTSpec, TrainConfig
    from transformer_stm_tpu.models import init_cvt
    from transformer_stm_tpu.train.loop import make_train_step
    from transformer_stm_tpu.train.optimizer import adam_init

    spec = CvTSpec()
    cfg = TrainConfig(batch_size=batch, compute_dtype="bfloat16")
    params, state = init_cvt(jax.random.PRNGKey(0), spec)
    opt = adam_init(params)
    step = jax.jit(make_train_step(spec, cfg))
    batch_data = (
        jax.random.uniform(jax.random.PRNGKey(1), (batch, 128, 128, 1)),
        jax.random.uniform(jax.random.PRNGKey(2), (batch, 5)),
        jax.random.uniform(jax.random.PRNGKey(3), (batch,)),
        jnp.ones((batch,), jnp.float32),
    )
    rng = jax.random.PRNGKey(4)
    lr = jnp.float32(1e-3)

    def fn(p, s, o):
        return step(p, s, o, batch_data, rng, lr)

    # run via apply to keep state threading simple
    # params mutate every step -> no caching possible
    for _ in range(2):
        params, state, opt, m = fn(params, state, opt)
    _sync(m["loss"])
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        params, state, opt, m = fn(params, state, opt)
    _sync(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def main():
    backend = jax.default_backend()
    vit_ips = bench_vit_inference()
    print(f"# backend={backend} devices={jax.devices()}", file=sys.stderr)
    print(f"# ViT-S/16 @224 bf16 inference: {vit_ips:,.0f} img/s",
          file=sys.stderr)
    try:
        prep_ips = bench_vit_with_preprocessing()
        print(f"# ViT-S/16 raw-uint8->fused-preprocess->infer: "
              f"{prep_ips:,.0f} img/s", file=sys.stderr)
        cvt_ips = bench_cvt_inference()
        print(f"# CvT-13 @128 bf16 inference: {cvt_ips:,.0f} img/s",
              file=sys.stderr)
        cvt_train = bench_cvt_train_step()
        print(f"# CvT-13 @128 train step: {cvt_train:,.0f} img/s",
              file=sys.stderr)
    except Exception as e:  # supplementary only
        print(f"# supplementary bench failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "ViT-S/16 224px batched inference throughput",
        "value": round(vit_ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(vit_ips / BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
