"""Fused-layer kernel timing on the real TPU: per-kernel (attention layer
vs LN+MLP) and end-to-end ViT-S/16 @224 throughput across batch and
image-block sizes.  Run on an idle chip.  Writes
Result/fused_layer_probe.json.

Usage: python scripts/probe_fused_layer.py [iters]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from transformer_stm_tpu.config import VIT_PRESETS
from transformer_stm_tpu.kernels.fused_layer import (attn_layer_infer,
                                                     ln_mlp_infer)
from transformer_stm_tpu.models import init_vit, vit_forward


def timed(fn, x, *consts, iters=100, min_window=0.4):
    def run(n, x, *c):
        def body(i, acc):
            e = jnp.asarray(1e-3, x.dtype) * i.astype(x.dtype)
            return acc + jnp.sum(fn(x + e, *c).astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    r = jax.jit(run, static_argnums=0)
    while True:
        float(r(iters, x, *consts))
        float(r(1, x, *consts))
        t0 = time.perf_counter(); float(r(1, x, *consts))
        t_one = time.perf_counter() - t0
        t0 = time.perf_counter(); float(r(iters, x, *consts))
        t_all = time.perf_counter() - t0
        if t_all - t_one >= min_window or iters >= 6400:
            return max((t_all - t_one) / (iters - 1), 1e-9)
        iters *= 4


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spec = VIT_PRESETS["ViT-S/16"]
    params = init_vit(jax.random.PRNGKey(0), spec)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), params)
    blk = params["blocks"][0]
    out = {}

    # per-kernel: one layer at B=384 folded rows (t_pad 200)
    b, t_pad, e = 384, 200, spec.embed_dim
    rows = jax.random.normal(jax.random.PRNGKey(2),
                             (b * t_pad, e), jnp.bfloat16)
    for bi in (4, 8):
        try:
            dt_a = timed(lambda x, bl: attn_layer_infer(
                x, bl["norm1"], bl["attn"], t_pad=t_pad, t_real=197,
                bi=bi), rows, blk, iters=iters)
            out[f"attn_layer_ms_B384_bi{bi}"] = round(dt_a * 1e3, 3)
        except Exception as ex:
            out[f"attn_layer_ms_B384_bi{bi}"] = f"ERR:{type(ex).__name__}"
        print(f"attn bi={bi}: {out[f'attn_layer_ms_B384_bi{bi}']}",
              flush=True)
    dt_m = timed(lambda x, bl: ln_mlp_infer(x, bl["norm2"], bl["mlp"]),
                 rows, blk, iters=iters)
    out["ln_mlp_ms_B384"] = round(dt_m * 1e3, 3)
    print(f"mlp: {out['ln_mlp_ms_B384']}", flush=True)

    # end-to-end fused vs composable-xla
    for batch in (192, 384, 768):
        images = jax.random.uniform(jax.random.PRNGKey(1),
                                    (batch, 224, 224, 3), jnp.bfloat16)
        for name, kw in (("fused", dict(impl="fused")),
                         ("fused2", dict(impl="fused2")),
                         ("xla", dict(impl="xla", mlp_impl="pallas"))):
            def fn(x, p, kw=kw):
                return vit_forward(p, spec, x, train=False, **kw)
            try:
                dt = timed(fn, images, params, iters=max(20, iters // 4))
                out[f"vit_{name}_B{batch}"] = round(batch / dt, 1)
            except Exception as ex:
                out[f"vit_{name}_B{batch}"] = f"ERR:{type(ex).__name__}"
            print(f"B={batch} {name}: {out[f'vit_{name}_B{batch}']}",
                  flush=True)

    with open("Result/fused_layer_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
