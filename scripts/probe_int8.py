"""ViT-S/16 @224 int8 fused-layer A/B on the real TPU.

fused2 (bf16 projections) is the shipped 11,270 img/s headline path;
fused2_int8 (kernels/fused_layer.py::vit_layer_infer_int8) moves all six
projections — ~85% of layer FLOPs — onto the MXU's double-rate int8 path
with per-channel weight scales and per-token dynamic activation scales.
This probe measures both at B in {192, 384, 768} and records the int8
path's numeric drift vs fused2 on the same inputs.

Each config runs in a SUBPROCESS so a Mosaic compile failure or worker
fault cannot kill the sweep (probe_fused_bi.py pattern).  Scanned timing
(fori_loop, varied inputs, scalar fetch) per CLAUDE.md tunnel rules.
Run on an idle chip.

Usage: python scripts/probe_int8.py [iters]
Writes Result/int8_probe.json.
"""

import json
import subprocess
import sys

sys.path.insert(0, ".")

CHILD = r"""
import sys, time
sys.path.insert(0, ".")
impl, B, iters = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

import jax
import jax.numpy as jnp
from transformer_stm_tpu.config import VIT_PRESETS
from transformer_stm_tpu.models import init_vit, vit_forward

spec = VIT_PRESETS["ViT-S/16"]
params = init_vit(jax.random.PRNGKey(0), spec)
params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
images = jax.random.uniform(jax.random.PRNGKey(1), (B, 224, 224, 3),
                            jnp.bfloat16)

def fn(x, p):
    return vit_forward(p, spec, x, train=False, impl=impl)

def run(n, x, p):
    def body(i, acc):
        e = jnp.asarray(1e-3, x.dtype) * i.astype(x.dtype)
        return acc + jnp.sum(fn(x + e, p).astype(jnp.float32))
    return jax.lax.fori_loop(0, n, body, jnp.float32(0))

r = jax.jit(run, static_argnums=0)
float(r(iters, images, params)); float(r(1, images, params))
t0 = time.perf_counter(); float(r(1, images, params))
t_one = time.perf_counter() - t0
t0 = time.perf_counter(); float(r(iters, images, params))
t_all = time.perf_counter() - t0
dt = max((t_all - t_one) / (iters - 1), 1e-9)
print(f"RESULT {B / dt:.1f}")
"""

DRIFT = r"""
import sys
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from transformer_stm_tpu.config import VIT_PRESETS
from transformer_stm_tpu.models import init_vit, vit_forward

spec = VIT_PRESETS["ViT-S/16"]
params = init_vit(jax.random.PRNGKey(0), spec)
params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
images = jax.random.uniform(jax.random.PRNGKey(1), (64, 224, 224, 3),
                            jnp.bfloat16)
ref = np.asarray(vit_forward(params, spec, images, train=False,
                             impl="fused2").astype(jnp.float32))
got = np.asarray(vit_forward(params, spec, images, train=False,
                             impl="fused2_int8").astype(jnp.float32))
scale = max(abs(float(ref.max())), abs(float(ref.min())), 1e-9)
print(f"RESULT {float(np.max(np.abs(got - ref))) / scale:.5f} "
      f"{float(np.corrcoef(ref.ravel(), got.ravel())[0, 1]):.6f}")
"""


def _child(code, *args, timeout=900):
    proc = subprocess.run([sys.executable, "-c", code, *map(str, args)],
                          capture_output=True, text=True, timeout=timeout)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return line.split()[1:]
    tail = (proc.stderr or proc.stdout).strip().splitlines()
    return [f"ERR:rc={proc.returncode}:{tail[-1][:120] if tail else ''}"]


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    out = {}
    for batch in (192, 384, 768):
        for impl in ("fused2", "fused2_int8"):
            try:
                (val,) = _child(CHILD, impl, batch, iters)
                out[f"{impl}_B{batch}"] = (float(val) if not
                                           val.startswith("ERR") else val)
            except subprocess.TimeoutExpired:
                out[f"{impl}_B{batch}"] = "ERR:timeout"
            print(f"B={batch} {impl}: {out[f'{impl}_B{batch}']} img/s",
                  flush=True)
    try:
        drift = _child(DRIFT)
        if not drift[0].startswith("ERR"):
            out["int8_max_rel_drift_vs_fused2"] = float(drift[0])
            out["int8_corr_vs_fused2"] = float(drift[1])
        else:
            out["int8_drift"] = drift[0]
    except subprocess.TimeoutExpired:
        out["int8_drift"] = "ERR:timeout"
    with open("Result/int8_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
