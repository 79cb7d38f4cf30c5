"""On-TPU validation of the fused inference-layer kernels (fused_layer.py):
Mosaic-compiled numerics vs the composable XLA path, f32 tight / bf16
loose, plus odd batch (bi=1) and the ViT-B widths.  Run on an idle chip
before flipping routing; prints PASS/FAIL per case.

Usage: python scripts/validate_fused_layer_tpu.py
"""

import dataclasses
import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from transformer_stm_tpu.config import VIT_PRESETS
from transformer_stm_tpu.models import init_vit, vit_forward


def check(name, spec, batch, dtype, atol, impl="fused"):
    params = init_vit(jax.random.PRNGKey(0), spec)
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
    img = jax.random.uniform(jax.random.PRNGKey(1),
                             (batch, spec.image_size, spec.image_size,
                              spec.num_channels), dtype)
    ref = jax.jit(lambda x, p: vit_forward(p, spec, x, train=False,
                                           impl="xla", mlp_impl="xla"))(
        img, params).astype(jnp.float32)
    got = jax.jit(lambda x, p: vit_forward(p, spec, x, train=False,
                                           impl=impl))(
        img, params).astype(jnp.float32)
    diff = float(jnp.max(jnp.abs(ref - got)))
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    ok = diff <= atol * max(1.0, scale)
    print(f"{'PASS' if ok else 'FAIL'} {name} [{impl}]: "
          f"max|diff|={diff:.2e} (ref scale {scale:.2e}, atol {atol})",
          flush=True)
    return ok


def main():
    s = VIT_PRESETS["ViT-S/16"]
    s_shallow = dataclasses.replace(s, depth=4)
    b = VIT_PRESETS["ViT-B/16"]
    b_shallow = dataclasses.replace(b, depth=2)
    ok = True
    # f32: in-kernel MXU matmuls are single-pass bf16 (the fused path is
    # the bf16 throughput kernel; auto-routing excludes f32 inputs), so
    # expect bf16-class error, not 1e-4
    ok &= check("ViT-S d4 f32 B8", s_shallow, 8, jnp.float32, 2e-2)
    ok &= check("ViT-S d4 bf16 B8", s_shallow, 8, jnp.bfloat16, 5e-2)
    ok &= check("ViT-S d4 bf16 B3 (bi=1)", s_shallow, 3, jnp.bfloat16, 5e-2)
    ok &= check("ViT-S full bf16 B16", s, 16, jnp.bfloat16, 1e-1)
    ok &= check("ViT-B d2 bf16 B8", b_shallow, 8, jnp.bfloat16, 5e-2)
    ti = VIT_PRESETS.get("ViT-Ti/16")
    if ti is not None:
        # E=192: blocks hit the lane dim == array dim Mosaic path
        ok &= check("ViT-Ti d2 bf16 B8",
                    dataclasses.replace(ti, depth=2), 8, jnp.bfloat16,
                    5e-2)
    # merged single-kernel layer (impl='fused2')
    ok &= check("ViT-S d4 bf16 B8", s_shallow, 8, jnp.bfloat16, 5e-2,
                impl="fused2")
    ok &= check("ViT-S full bf16 B16", s, 16, jnp.bfloat16, 1e-1,
                impl="fused2")
    ok &= check("ViT-B d2 bf16 B8", b_shallow, 8, jnp.bfloat16, 5e-2,
                impl="fused2")
    print("ALL PASS" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
