"""Ring attention: exact sequence-parallel attention over an ICI ring.

The reference handles its longest sequence (the DiT's ~17.8k tokens)
with single-GPU full attention + CPU offload (video_inference.py:28-30
— it trades speed for memory). The TPU-native scaling design
(SURVEY.md §5 long-context): shard the sequence across a mesh axis and
rotate k/v shards around the ring with `ppermute`, merging partial
softmax results with the same online rescaling the flash kernel uses.
Attention stays EXACT — each q shard eventually sees every k/v shard —
while per-chip memory and FLOPs drop by the ring size, and the
neighbor-exchange collective rides ICI concurrently with compute.

Layout: [B, H, T, D] with T sharded. Use `ring_attention_sharded` for
the shard_map-wrapped entry point, or call `ring_attention` directly
inside your own shard_map/pjit region.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _local_block(q, k, v, scale, m, l, acc):
    """One online-softmax accumulation step against a k/v shard."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc * alpha + jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32)
    return m_new, l, acc


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   axis_name: str, scale: Optional[float] = None
                   ) -> jnp.ndarray:
    """Per-shard [B,H,Tl,D] q/k/v (T sharded over `axis_name`) ->
    per-shard [B,H,Tl,D] output of EXACT full attention over the global
    sequence. Call inside shard_map/pjit with a live `axis_name`."""
    B, H, Tl, D = q.shape
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    m0 = jnp.full((B, H, Tl, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, H, Tl, 1), jnp.float32)
    acc0 = jnp.zeros((B, H, Tl, D), jnp.float32)

    def body(carry, _):
        k_cur, v_cur, m, l, acc = carry
        m, l, acc = _local_block(q, k_cur, v_cur, scale, m, l, acc)
        # rotate k/v to the next chip; XLA overlaps the ppermute DMA
        # with the next iteration's matmuls
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, m, l, acc), None

    (_, _, _, l, acc), _ = jax.lax.scan(
        body, (k, v, m0, l0, acc0), None, length=n)
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention_sharded(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           mesh: Mesh, axis: str = "data",
                           scale: Optional[float] = None) -> jnp.ndarray:
    """shard_map wrapper: [B,H,T,D] global arrays, T split over mesh
    axis `axis` (T must divide evenly). Replicated B/H/D."""
    try:
        from jax import shard_map              # jax >= 0.7
        kw = {"check_vma": False}
    except ImportError:
        from jax.experimental.shard_map import shard_map
        kw = {"check_rep": False}
    spec = P(None, None, axis, None)
    fn = shard_map(
        functools.partial(ring_attention, axis_name=axis, scale=scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, **kw)
    return fn(q, k, v)
