"""High-res stretch config (BASELINE config 5): CvT at 384/512px through
the Pallas attention kernels — forward throughput, train-step throughput,
and HBM high-water mark on the real TPU.

The 384px CvT has 96x96 = 9,216 stage-1 tokens: the XLA path's f32 score
matrix is 9216^2 * 4 = 340 MB *per image in the batch*, which is why the
flash kernels are load-bearing here rather than an optimisation.

Writes Result/highres_bench.json.  Usage: python scripts/bench_highres.py
[size] [batch]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from transformer_stm_tpu.config import TrainConfig, cvt_highres_spec
from transformer_stm_tpu.models.cvt import init_cvt
from transformer_stm_tpu.train.loop import make_train_step
from transformer_stm_tpu.train.optimizer import adam_init


def timed_scanned(run_n, *args, iters=10):
    float(run_n(iters, *args))
    float(run_n(1, *args))
    t0 = time.perf_counter()
    float(run_n(1, *args))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run_n(iters, *args))
    t_all = time.perf_counter() - t0
    return (t_all - t_one) / (iters - 1)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spec = cvt_highres_spec(size)
    cfg = TrainConfig(batch_size=batch, compute_dtype="bfloat16")
    params, state = init_cvt(jax.random.PRNGKey(0), spec)
    opt = adam_init(params)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (batch, size, size, 1)),
                         jnp.bfloat16)
    proc = jnp.asarray(rng.normal(size=(batch, 5)), jnp.bfloat16)
    labels = jnp.asarray(rng.normal(size=(batch,)), jnp.float32)
    mask = jnp.ones((batch,), jnp.float32)

    from transformer_stm_tpu.models.cvt import cvt_forward

    def fwd_many(n, x):
        def body(i, acc):
            out, _ = cvt_forward(params, state, spec,
                                 x + jnp.bfloat16(1e-3) * i.astype(x.dtype),
                                 proc, train=False, impl="auto")
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    dt_f = timed_scanned(jax.jit(fwd_many, static_argnums=0), images)
    fwd_ips = batch / dt_f
    print(f"{size}px forward: {dt_f*1e3:.1f} ms/batch{batch} = "
          f"{fwd_ips:,.0f} img/s", flush=True)

    step = make_train_step(spec, cfg, impl="auto")

    def train_many(n, p, s, o):
        def body(i, carry):
            p, s, o, _ = carry
            b = (images + jnp.bfloat16(1e-3) * i.astype(images.dtype),
                 proc, labels, mask)
            return step(p, s, o, b, jax.random.fold_in(
                jax.random.PRNGKey(1), i), jnp.float32(1e-3))
        zero = {k: jnp.float32(0) for k in
                ("loss", "mae", "se", "ae", "n")}
        p, s, o, m = jax.lax.fori_loop(0, n, body, (p, s, o, zero))
        return m["loss"]

    dt_t = timed_scanned(jax.jit(train_many, static_argnums=0),
                         params, state, opt)
    train_ips = batch / dt_t
    print(f"{size}px train step: {dt_t*1e3:.1f} ms/batch{batch} = "
          f"{train_ips:,.0f} img/s", flush=True)

    stats = jax.devices()[0].memory_stats() or {}
    hbm_peak = stats.get("peak_bytes_in_use", 0) / 2**30
    out = {"size": size, "batch": batch,
           "forward_img_per_s": round(fwd_ips, 1),
           "train_img_per_s": round(train_ips, 1),
           "hbm_peak_gib": round(hbm_peak, 2),
           "tokens_stage1": (size // 4) ** 2}
    with open(f"Result/highres_bench_{size}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
