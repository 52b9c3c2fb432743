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


def _local_block(q, k, v, scale, m, l, acc, col_mask=None):
    """One online-softmax accumulation step against a k/v shard."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if col_mask is not None:
        s = jnp.where(col_mask[None, None, None, :], s, NEG_INF)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc * alpha + jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32)
    return m_new, l, acc


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   axis_name: str, scale: Optional[float] = None,
                   kv_len: Optional[int] = None) -> jnp.ndarray:
    """Per-shard [B,H,Tl,D] q/k/v (T sharded over `axis_name`) ->
    per-shard [B,H,Tl,D] output of EXACT full attention over the global
    sequence. Call inside shard_map/pjit with a live `axis_name`.
    `kv_len`: real (unpadded) global kv length — keys at global column
    >= kv_len are masked out of every softmax."""
    B, H, Tl, D = q.shape
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    m0 = jnp.full((B, H, Tl, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, H, Tl, 1), jnp.float32)
    acc0 = jnp.zeros((B, H, Tl, D), jnp.float32)

    def body(carry, step):
        k_cur, v_cur, m, l, acc = carry
        col_mask = None
        if kv_len is not None:
            # after `step` rotations this chip holds the shard that
            # originated on chip (idx - step) mod n
            src = jax.lax.rem(idx - step + n, n)
            cols = src * Tl + jnp.arange(Tl)
            col_mask = cols < kv_len
        m, l, acc = _local_block(q, k_cur, v_cur, scale, m, l, acc,
                                 col_mask)
        # rotate k/v to the next chip; XLA overlaps the ppermute DMA
        # with the next iteration's matmuls
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, m, l, acc), None

    (_, _, _, l, acc), _ = jax.lax.scan(
        body, (k, v, m0, l0, acc0), jnp.arange(n))
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention_sharded(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           mesh: Mesh, axis: str = "data",
                           scale: Optional[float] = None) -> jnp.ndarray:
    """shard_map wrapper: [B,H,T,D] global arrays, T split over mesh
    axis `axis`. T that doesn't divide the ring size is zero-padded and
    the pad columns masked out of every softmax."""
    try:
        from jax import shard_map              # jax >= 0.7
        kw = {"check_vma": False}
    except ImportError:
        from jax.experimental.shard_map import shard_map
        kw = {"check_rep": False}
    n = mesh.shape[axis]
    T = q.shape[2]
    Tp = ((T + n - 1) // n) * n
    kv_len = T if Tp != T else None
    if Tp != T:
        pad = ((0, 0), (0, 0), (0, Tp - T), (0, 0))
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    spec = P(None, None, axis, None)
    fn = shard_map(
        functools.partial(ring_attention, axis_name=axis, scale=scale,
                          kv_len=kv_len),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, **kw)
    out = fn(q, k, v)
    return out[:, :, :T] if Tp != T else out
