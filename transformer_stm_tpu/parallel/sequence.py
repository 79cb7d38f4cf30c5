"""Sequence parallelism (SP) for long-token configs (SURVEY.md §2.3, §5.7).

The reference *shrinks* sequences via its conv pyramid instead of sharding
them (max 1,025 tokens); the 384/512px stretch configs (BASELINE.json
config 5) push past one chip's comfort.  Strategy here:

- queries sharded along the sequence over the mesh's 'data' axis
  (shard_map), K/V all-gathered over ICI, local compute via the Pallas
  flash kernel — the standard all-gather SP that is optimal while
  seq_len * head_dim * 2 bytes fits HBM;
- a ring variant (K/V blocks ppermuted around the ring, O(seq/n) memory
  per chip) for when even gathered K/V is too large.

Both are collectives-over-mesh formulations: XLA lowers the all_gather /
ppermute onto ICI; no NCCL-style backend exists or is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _local_attention(q, k, v):
    """Backend-appropriate softmax(qk^T)v on local shards."""
    from ..ops.attention import _attention_core

    return _attention_core(q, k, v, impl="auto")


def sp_attention(q, k, v, mesh: Mesh, axis: str = "data"):
    """All-gather sequence parallelism.

    q, k, v: (B, T, H, Dh) logically; sharded (or shardable) along T over
    `axis`.  Each device holds T/n query rows, gathers full K/V, and
    computes its output shard locally — output stays T-sharded.
    """

    def local(q_shard, k_shard, v_shard):
        k_full = jax.lax.all_gather(k_shard, axis, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v_shard, axis, axis=1, tiled=True)
        return _local_attention(q_shard, k_full, v_full)

    spec = P(None, axis, None, None)
    return jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec)(q, k, v)


def ring_attention(q, k, v, mesh: Mesh, axis: str = "data"):
    """Ring sequence parallelism: K/V shards rotate around the ring via
    ppermute while a running (max, denom) softmax accumulates — O(T/n)
    memory per device, bandwidth-optimal on a ring ICI."""

    def local(q_shard, k_shard, v_shard):
        n = jax.lax.psum(1, axis)
        qf = q_shard.astype(jnp.float32)
        scale = 1.0 / jnp.sqrt(jnp.asarray(q_shard.shape[-1], jnp.float32))

        def step(carry, _):
            acc, m_prev, l_prev, k_cur, v_cur = carry
            s = jnp.einsum("bthd,bshd->bhts", qf * scale,
                           k_cur.astype(jnp.float32))
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jnp.einsum("bhts,bshd->bthd", p,
                            v_cur.astype(jnp.float32))
            # acc is (B, T, H, Dh); softmax stats are (B, H, T, 1)
            acc = acc * alpha.transpose(0, 2, 1, 3) + pv
            perm = [(i, (i + 1) % n) for i in range(n)]
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            return (acc, m_new, l_new, k_nxt, v_nxt), None

        b, t, h, dh = q_shard.shape
        # scan carries must be marked device-varying under shard_map
        # (JAX >= 0.9 varying-manual-axes check)
        mark = lambda x: jax.lax.pcast(x, (axis,), to="varying")
        acc0 = mark(jnp.zeros((b, t, h, dh), jnp.float32))
        m0 = mark(jnp.full((b, h, t, 1), -1e30, jnp.float32))
        l0 = mark(jnp.zeros((b, h, t, 1), jnp.float32))
        (acc, _, l, _, _), _ = jax.lax.scan(
            step, (acc0, m0, l0, k_shard, v_shard), None, length=n)
        out = acc / l.transpose(0, 2, 1, 3)
        return out.astype(q_shard.dtype)

    spec = P(None, axis, None, None)
    return jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec)(q, k, v)
