"""ViT-S/16 @224 inference throughput A/B on the real TPU: attention impl
(xla-materialised scores vs attention_small) x batch size.

Round-2 analysis (RESULTS.md): at 197 tokens the XLA path writes+reads the
f32 (B, H, 197, 197) score tensor to HBM every layer — ~600 MB per
batch-256 layer pass, ~20 ms of the ~40 ms forward.  attention_small keeps
scores in VMEM; this probe measures whether it wins at 197 tokens (the
round-2 sweep's small-shape entries were dispatch-noise).  Run on an idle
chip.  Writes Result/vit_infer_probe.json.

Usage: python scripts/probe_vit_infer.py [iters]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from transformer_stm_tpu.config import VIT_PRESETS
from transformer_stm_tpu.models import init_vit, vit_forward


def timed(fn, x, params, iters, min_window=0.5):
    def run(n, x, p):
        def body(i, acc):
            e = jnp.asarray(1e-3, x.dtype) * i.astype(x.dtype)
            return acc + jnp.sum(fn(x + e, p).astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    r = jax.jit(run, static_argnums=0)
    while True:
        float(r(iters, x, params))
        float(r(1, x, params))
        t0 = time.perf_counter(); float(r(1, x, params))
        t_one = time.perf_counter() - t0
        t0 = time.perf_counter(); float(r(iters, x, params))
        t_all = time.perf_counter() - t0
        if t_all - t_one >= min_window or iters >= 2560:
            return max((t_all - t_one) / (iters - 1), 1e-9)
        iters *= 4


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    spec = VIT_PRESETS["ViT-S/16"]
    params = init_vit(jax.random.PRNGKey(0), spec)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params)

    out = {}
    for batch in (192, 384, 768):
        images = jax.random.uniform(jax.random.PRNGKey(1),
                                    (batch, 224, 224, 3), jnp.bfloat16)
        row = {}
        for attn in ("xla", "small", "fused"):
            def fn(x, p, attn=attn):
                if attn == "fused":
                    return vit_forward(p, spec, x, train=False, impl="fused")
                return vit_forward(p, spec, x, train=False, impl=attn,
                                   mlp_impl="pallas")
            try:
                dt = timed(fn, images, params, iters)
                row[attn] = round(batch / dt, 1)
            except Exception as e:
                row[attn] = f"ERR:{type(e).__name__}: {e}"
            print(f"B={batch} attn={attn}: {row[attn]} img/s", flush=True)
        out[f"B{batch}"] = row
    with open("Result/vit_infer_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
