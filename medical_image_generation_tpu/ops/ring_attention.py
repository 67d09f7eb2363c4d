"""Ring attention: sequence-parallel full attention over the device mesh.

The 3D "long sequence" problem (SURVEY.md §5): a 64^3 latent grid is 262k
tokens — too many for one chip's attention. Ring attention shards the token
axis across mesh devices; each device holds its Q/K/V shard, computes
blockwise attention against its resident K/V, then rotates the K/V shards
around the ring with ``ppermute`` while folding results into an online
softmax — full (exact) attention with per-device memory O(S/n) and
communication overlapped along the ICI ring.

This is a *new capability* relative to the reference (which flattens and
attends on one GPU, autoencoderkl_with_strides.py:295-298). Implementation
uses XLA collectives under ``shard_map``; per-shard math reuses the same
online-softmax recurrence as the Pallas flash kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.7 canonical location
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

NEG_INF = -1e30


def _local_block(q, k, v, scale):
    """(BQ, D) x (BK, D): returns (scores-max m, exp-sum l, weighted acc)."""
    s = scale * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    acc = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return m, l, acc


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis_name: str = "model",
    scale: Optional[float] = None,
) -> jax.Array:
    """Exact full attention with the sequence axis sharded over `axis_name`.

    q/k/v: (B, S, H, D) logically; S must divide by the axis size. Returns
    (B, S, H, D) with the same sharding. No masking (image token grids).
    """
    B, S, H, D = q.shape
    if scale is None:
        scale = D**-0.5
    n = mesh.shape[axis_name]
    assert S % n == 0, f"sequence {S} not divisible by {axis_name}={n}"

    def local_fn(q_loc, k_loc, v_loc):
        # shapes: (B, S/n, H, D)
        b, s_loc, h, d = q_loc.shape
        qf = q_loc.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(b * h, s_loc, d)

        def fold(carry, kv):
            m_prev, l_prev, acc = carry
            k_blk, v_blk = kv  # (B, S/n, H, D)
            kf = k_blk.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(b * h, s_loc, d)
            vf = v_blk.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(b * h, s_loc, d)
            m_cur, l_cur, acc_cur = jax.vmap(
                functools.partial(_local_block, scale=scale)
            )(qf, kf, vf)
            m_new = jnp.maximum(m_prev, m_cur)
            c_prev = jnp.exp(m_prev - m_new)
            c_cur = jnp.exp(m_cur - m_new)
            l_new = l_prev * c_prev + l_cur * c_cur
            acc_new = acc * c_prev + acc_cur * c_cur
            return (m_new, l_new, acc_new), None

        m0 = jnp.full((b * h, s_loc, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((b * h, s_loc, 1), jnp.float32)
        acc0 = jnp.zeros((b * h, s_loc, d), jnp.float32)
        # mark the init carries as device-varying so the fori_loop carry
        # types match (the folded outputs vary across the mesh axis)
        if hasattr(jax.lax, "pcast"):
            m0, l0, acc0 = (
                jax.lax.pcast(x, (axis_name,), to="varying") for x in (m0, l0, acc0)
            )
        elif hasattr(jax.lax, "pvary"):  # pragma: no cover - older jax
            m0, l0, acc0 = (jax.lax.pvary(x, (axis_name,)) for x in (m0, l0, acc0))

        size = jax.lax.axis_size(axis_name)
        perm = [(i, (i + 1) % size) for i in range(size)]

        def ring_step(i, state):
            carry, k_cur, v_cur = state
            carry, _ = fold(carry, (k_cur, v_cur))
            k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
            return carry, k_nxt, v_nxt

        (m, l, acc), _, _ = jax.lax.fori_loop(
            0, size, ring_step, ((m0, l0, acc0), k_loc, v_loc)
        )
        out = (acc / l).reshape(b, h, s_loc, d).transpose(0, 2, 1, 3)
        return out.astype(q_loc.dtype)

    spec = P(None, axis_name, None, None)
    fn = shard_map(
        local_fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )
    return fn(q, k, v)
