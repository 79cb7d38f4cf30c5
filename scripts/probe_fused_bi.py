"""Image-block (bi) sweep for the fused2 ViT layer kernel on the real TPU.

The auto chooser admits bi in (8, 4, 2, 1) against a 16M scoped-VMEM
budget; with TSTM_FUSED_V2_VMEM_LIMIT raised, bigger blocks (bi=16)
become compilable — this probe measures whether they beat the shipped
bi=8 headline (11,270 img/s, Result/fused_layer_probe.json) or whether
the extra VMEM residency hurts pipelining.  Each (bi, B) config runs in
a SUBPROCESS so a Mosaic compile failure or worker fault cannot kill the
sweep (the T=12 width probe crashed the worker this way).

Runs the same folded-token forward as models/vit.py::_vit_forward_fused
but drives vit_layer_infer with an explicit bi/mlp_chunks instead of the
chooser.  Scanned timing (fori_loop, varied inputs, scalar fetch) per
CLAUDE.md tunnel rules.

Usage: python scripts/probe_fused_bi.py [iters]
Writes Result/fused_bi_probe.json.
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, ".")

CHILD = r"""
import sys, time
sys.path.insert(0, ".")
bi, B, mlp_chunks, iters = (int(a) for a in sys.argv[1:5])

import jax
import jax.numpy as jnp
from transformer_stm_tpu.config import VIT_PRESETS
from transformer_stm_tpu.models import init_vit
from transformer_stm_tpu.models.vit import patchify
from transformer_stm_tpu.ops.common import layer_norm
from transformer_stm_tpu.ops.common import dense
from transformer_stm_tpu.kernels.fused_layer import vit_layer_infer

spec = VIT_PRESETS["ViT-S/16"]
params = init_vit(jax.random.PRNGKey(0), spec)
params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

def fwd(p, images):
    x = patchify(images, spec.patch_size)
    x = dense(p["patch_embed"], x)
    b, n_p, e = x.shape
    cls = jnp.broadcast_to(p["cls_token"].astype(x.dtype), (b, 1, e))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_embed"].astype(x.dtype)
    t = n_p + 1
    t_pad = ((t + 7) // 8) * 8
    x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    x = x.reshape(b * t_pad, e)
    for blk in p["blocks"]:
        x = vit_layer_infer(x, blk["norm1"], blk["attn"], blk["norm2"],
                            blk["mlp"], t_pad=t_pad, t_real=t, bi=bi,
                            mlp_chunks=mlp_chunks)
    x_cls = x.reshape(b, t_pad, e)[:, :1, :]
    x_cls = layer_norm(p["head_norm"], x_cls, eps=1e-6)
    return dense(p["head"], x_cls[:, 0, :])

def run(n, x, p):
    def body(i, acc):
        e = jnp.asarray(1e-3, x.dtype) * i.astype(x.dtype)
        return acc + jnp.sum(fwd(p, x + e).astype(jnp.float32))
    return jax.lax.fori_loop(0, n, body, jnp.float32(0))

x = jax.random.uniform(jax.random.PRNGKey(1), (B, 224, 224, 3),
                       jnp.bfloat16)
r = jax.jit(run, static_argnums=0)
float(r(iters, x, params)); float(r(1, x, params))
t0 = time.perf_counter(); float(r(1, x, params))
t_one = time.perf_counter() - t0
t0 = time.perf_counter(); float(r(iters, x, params))
t_all = time.perf_counter() - t0
per = max((t_all - t_one) / (iters - 1), 1e-9)
print("RESULT", B / per)
"""


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    out = {}
    for bi, mlp_chunks in ((8, 2), (16, 4), (16, 8), (24, 6)):
        for B in (384, 768):
            env = dict(os.environ)
            if bi > 16:
                env["TSTM_FUSED_V2_VMEM_LIMIT"] = str(100 << 20)
            elif bi > 8:
                env["TSTM_FUSED_V2_VMEM_LIMIT"] = str(64 << 20)
            key = f"bi{bi}_mc{mlp_chunks}_B{B}"
            try:
                p = subprocess.run(
                    [sys.executable, "-c", CHILD, str(bi), str(B),
                     str(mlp_chunks), str(iters)],
                    capture_output=True, text=True, timeout=600, env=env)
                line = [l for l in p.stdout.splitlines()
                        if l.startswith("RESULT")]
                if p.returncode == 0 and line:
                    out[key] = round(float(line[0].split()[1]), 1)
                else:
                    tail = (p.stderr or p.stdout).strip().splitlines()[-1:]
                    out[key] = f"ERR rc={p.returncode}: " + " ".join(tail)[:160]
            except subprocess.TimeoutExpired:
                out[key] = "ERR timeout"
            print(key, out[key], flush=True)
    with open("Result/fused_bi_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
