"""TPU-only validation of the fused train-MLP kernel (Mosaic path).

The CPU suite runs the kernel through the Pallas interpreter, which lacks
the TPU core PRNG — so the dropout path (per-block SMEM seed rows, fwd/bwd
mask agreement) can only be proven on hardware.  Checks:

1. rate=0, multi-block, vmapped: grads == XLA reference per slot (the
   advisor-r2 high finding regime: per-block weight-grad slots must be
   exact under vmap's prepended grid axis).
2. rate>0: masks must NOT be block-periodic (x=const -> consecutive
   256-row output blocks must differ; the old program_id-seeded kernel
   reused one mask per call under vmap).
3. rate>0: extract the kernel's actual masks with a debug pallas_call that
   replays the same seed table + draw order, then check (a) the fused
   forward equals an XLA reconstruction with those masks BIT-EXACTLY, and
   (b) every gradient of the custom bwd matches jax.grad of the
   reconstruction.  (A directional finite-difference check is NOT usable
   here: the f32 loss sum over ~34k terms carries ~1e-2 rounding noise,
   far above the FD signal.)

Usage: python scripts/validate_fused_mlp_tpu.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from transformer_stm_tpu.kernels.fused_mlp import (_gelu_exact,
                                                   make_fused_mlp_train)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    T, n, d, hd = 3, 700, 48, 96   # 3 token blocks of 256 after padding
    x = jnp.asarray(rng.standard_normal((T, n, d)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((T, d, hd)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((T, hd)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((T, hd, d)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((T, d)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((T, n, d)), jnp.float32)
    seeds = jnp.asarray(rng.integers(0, 2**31 - 1, (T, 2)), jnp.int32)

    # -- 1. rate=0 vmapped multi-block grads vs XLA ------------------------
    f0 = make_fused_mlp_train(0.0)

    def loss_fused(x, w1, b1, w2, b2, seed, gg):
        return jnp.sum(f0(x, w1, b1, w2, b2, seed) * gg)

    def loss_ref(x, w1, b1, w2, b2, gg):
        return jnp.sum((_gelu_exact(x @ w1 + b1) @ w2 + b2) * gg)

    gf = jax.jit(jax.vmap(jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))))(
        x, w1, b1, w2, b2, seeds, g)
    gr = jax.jit(jax.vmap(jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))))(
        x, w1, b1, w2, b2, g)
    for name, a, b in zip("x w1 b1 w2 b2".split(), gf, gr):
        err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
        print(f"rate=0 vmap grad d{name}: rel err {err:.2e}")
        # f32 matmuls take different MXU rounding paths in Mosaic vs XLA
        # (~1e-3 relative); the old uninit-accumulator bug produced O(1)
        # errors, far beyond this gate
        assert err < 3e-3, (name, err)

    # -- 2. dropout masks are per-block distinct ---------------------------
    fd = make_fused_mlp_train(0.5)
    xc = jnp.ones((512, d), jnp.float32)  # 2 blocks, constant input
    y = np.asarray(fd(xc, w1[0], b1[0], w2[0], b2[0], seeds[0]))
    same = np.allclose(y[:256], y[256:])
    print(f"block0 == block1 under const input: {same}")
    assert not same, "dropout masks are block-periodic"
    # vmapped: per-slot seeds must decorrelate slots
    yv = np.asarray(jax.vmap(fd, in_axes=(None, 0, 0, 0, 0, 0))(
        xc, w1, b1, w2, b2, seeds))
    assert not np.allclose(yv[0], yv[1]), "slots share dropout masks"
    # determinism given the seed
    y2 = np.asarray(fd(xc, w1[0], b1[0], w2[0], b2[0], seeds[0]))
    assert np.array_equal(y, y2), "dropout not deterministic given seed"
    print("per-block + per-slot masks distinct, deterministic given seed")

    # -- 3. rate>0 fwd/bwd vs XLA reconstruction with extracted masks ------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from transformer_stm_tpu.kernels.fused_mlp import (_keep_mask,
                                                       _seed_table,
                                                       _train_dims)

    rate = 0.5

    def check_reconstruction(n2, d2, hd2, tag):
        """Extract the kernel's masks for this shape's actual block
        partition (bn comes from _train_dims, so the 1024-row production
        blocks are covered too), reconstruct in XLA, compare fwd + grads."""
        r2 = np.random.default_rng(hash(tag) % 2**31)
        x2 = jnp.asarray(r2.standard_normal((n2, d2)), jnp.float32)
        w1_ = jnp.asarray(r2.standard_normal((d2, hd2)) * 0.1, jnp.float32)
        b1_ = jnp.asarray(r2.standard_normal((hd2,)) * 0.1, jnp.float32)
        w2_ = jnp.asarray(r2.standard_normal((hd2, d2)) * 0.1, jnp.float32)
        b2_ = jnp.asarray(r2.standard_normal((d2,)) * 0.1, jnp.float32)
        g2 = jnp.asarray(r2.standard_normal((n2, d2)), jnp.float32)
        sd = jnp.asarray(r2.integers(0, 2**31 - 1, (2,)), jnp.int32)
        _, _, _, _, bn, n_pad, d_pad, hd_pad, out_pad = _train_dims(
            x2, w1_, w2_)
        nb = n_pad // bn
        fd2 = make_fused_mlp_train(rate)

        def mask_kernel(seed_ref, m1_ref, m2_ref):
            pltpu.prng_seed(seed_ref[0, 0, 0], seed_ref[0, 0, 1])
            m1_ref[:] = _keep_mask(pltpu.prng_random_bits((bn, hd_pad)),
                                   rate)
            m2_ref[:] = _keep_mask(pltpu.prng_random_bits((bn, out_pad)),
                                   rate)

        m1, m2 = pl.pallas_call(
            mask_kernel, grid=(nb,),
            in_specs=[pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=[pl.BlockSpec((bn, hd_pad), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((bn, out_pad), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((n_pad, hd_pad), jnp.float32),
                       jax.ShapeDtypeStruct((n_pad, out_pad), jnp.float32)],
        )(_seed_table(sd, nb))

        def recon(xx, a1, c1, a2, c2):
            xf = jnp.pad(xx, ((0, n_pad - n2), (0, d_pad - d2)))
            a1p = jnp.pad(a1, ((0, d_pad - d2), (0, hd_pad - hd2)))
            c1p = jnp.pad(c1, (0, hd_pad - hd2))
            a2p = jnp.pad(a2, ((0, hd_pad - hd2), (0, out_pad - d2)))
            c2p = jnp.pad(c2, (0, out_pad - d2))
            h = _gelu_exact(xf @ a1p + c1p) * m1
            return ((h @ a2p + c2p) * m2)[:n2, :d2]

        y_kern = fd2(x2, w1_, b1_, w2_, b2_, sd)
        y_rec = recon(x2, w1_, b1_, w2_, b2_)
        dmax = float(jnp.max(jnp.abs(y_kern - y_rec)))
        print(f"[{tag} bn={bn}] dropout fwd vs mask-reconstruction: "
              f"max diff {dmax:.2e}")
        assert dmax == 0.0, dmax

        def loss_k(*a):
            return jnp.sum(fd2(*a, sd) * g2)

        def loss_r(*a):
            return jnp.sum(recon(*a) * g2)

        gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(
            x2, w1_, b1_, w2_, b2_)
        gr3 = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(
            x2, w1_, b1_, w2_, b2_)
        for name, a, b in zip("x w1 b1 w2 b2".split(), gk, gr3):
            err = float(jnp.max(jnp.abs(a - b))
                        / (jnp.max(jnp.abs(b)) + 1e-9))
            print(f"[{tag}] dropout grad d{name}: rel err {err:.2e}")
            assert err < 3e-3, (tag, name, err)

    check_reconstruction(700, 48, 96, "3x256-blocks")
    check_reconstruction(3000, 64, 96, "1024-blocks")
    print("OK: fused train MLP validated on TPU")


if __name__ == "__main__":
    main()
