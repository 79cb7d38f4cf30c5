"""Component timing for the multi-target trainer: isolates model fwd+bwd
(vmapped vs not), corpus gather, and the epoch shuffle sort.
Usage: python scripts/probe_components.py [T] [impl]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from transformer_stm_tpu.config import CvTSpec, TrainConfig
from transformer_stm_tpu.models.cvt import cvt_forward, init_cvt
from transformer_stm_tpu.train.optimizer import adam_init, adam_update

T = int(sys.argv[1]) if len(sys.argv) > 1 else 4
impl = sys.argv[2] if len(sys.argv) > 2 else "xla"
B = 128
spec = CvTSpec()
cfg = TrainConfig(compute_dtype="bfloat16")


def timeit(f, *args, n=6):
    r = f(*args)
    jax.block_until_ready(r)
    # tunnel-safe sync: fetch a scalar
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    s = jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.ravel(x)[:1].astype(jnp.float32)),
        r, jnp.float32(0))
    float(s)
    return (time.time() - t0) / n


def step_factory(remat):
    def loss_fn(p, st, imgs, proc, yy, rng):
        out, new_state = cvt_forward(p, st, spec,
                                     imgs.astype(jnp.bfloat16),
                                     proc.astype(jnp.bfloat16),
                                     train=True, rng=rng, impl=impl,
                                     remat=remat)
        return jnp.mean((out.reshape(-1) - yy) ** 2), new_state

    def step(p, st, o, imgs, proc, yy, rng):
        (l, new_state), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, st, imgs, proc, yy, rng)
        p2, o2 = adam_update(g, o, p, 1e-3)
        return p2, new_state, o2, l
    return step


key = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)

# single-model baseline
p1, s1 = init_cvt(key, spec)
o1 = adam_init(p1)
imgs1 = jnp.asarray(rng.random((B, 128, 128, 1)), jnp.float32)
proc1 = jnp.asarray(rng.standard_normal((B, 5)), jnp.float32)
y1 = jnp.asarray(rng.standard_normal((B,)), jnp.float32)

for remat in (False, True):
    f1 = jax.jit(step_factory(remat))
    dt = timeit(f1, p1, s1, o1, imgs1, proc1, y1, key)
    print(f"single step  remat={remat}: {dt*1e3:7.1f} ms "
          f"({B/dt:,.0f} img/s)", flush=True)

# vmapped multi-model
stack = lambda tree: jax.tree_util.tree_map(
    lambda x: jnp.stack([x] * T), tree)
pT, sT, oT = stack(p1), stack(s1), stack(o1)
imgsT = jnp.asarray(rng.random((T, B, 128, 128, 1)), jnp.float32)
procT = jnp.asarray(rng.standard_normal((T, B, 5)), jnp.float32)
yT = jnp.asarray(rng.standard_normal((T, B)), jnp.float32)
keysT = jax.random.split(key, T)

for remat in (False, True):
    fT = jax.jit(jax.vmap(step_factory(remat)))
    try:
        dt = timeit(fT, pT, sT, oT, imgsT, procT, yT, keysT)
        print(f"vmap-{T} step remat={remat}: {dt*1e3:7.1f} ms "
              f"({T*B/dt:,.0f} img/s aggregate)", flush=True)
    except Exception as e:
        print(f"vmap-{T} remat={remat} FAILED: {type(e).__name__} "
              f"{str(e)[:200]}", flush=True)

# gather + sort costs
corpus = jnp.asarray(rng.integers(0, 255, (40000, 128, 128, 1), np.uint8))
rows = jnp.asarray(rng.integers(0, 40000, (T, B)), jnp.int32)


@jax.jit
def gather(rows):
    return corpus[rows].astype(jnp.float32) / 255.0


dt = timeit(gather, rows)
print(f"corpus gather (T={T}, B={B}): {dt*1e3:7.1f} ms", flush=True)

keys = jax.random.split(key, T)
train_rows = jnp.asarray(rng.integers(0, 40000, (T, 30200)), jnp.int32)
n_train = jnp.asarray([30200] * T, jnp.int32)


@jax.jit
def shuffle(keys, train_rows, n_train):
    def one(key, rows, n):
        r = jax.random.uniform(key, (30200,))
        r = jnp.where(jnp.arange(30200) < n, r, 2.0)
        return rows[jnp.argsort(r)]
    return jax.vmap(one)(keys, train_rows, n_train)


dt = timeit(shuffle, keys, train_rows, n_train)
print(f"epoch shuffle sort (T={T} x 30200): {dt*1e3:7.1f} ms", flush=True)
