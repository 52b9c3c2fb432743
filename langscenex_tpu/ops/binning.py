"""Tile binning: duplicate splats into (tile, depth)-sorted pair lists.

Replaces the reference's duplicateWithKeys + cub RadixSort + identifyTileRanges
(cuda_rasterizer/rasterizer_impl.cu:70-130,285-328) with a static-shape XLA
formulation that mirrors the CUDA structure: an exclusive scan of per-splat
tile counts gives each splat's write offset (InclusiveSum parity), pairs are
run-length-expanded into a fixed ``max_pairs`` buffer (scatter + cummax — the
XLA idiom for variable-length runs), and the buffer is lexicographically
sorted by (tile_id, depth) with ``lax.sort(num_keys=2)``. Per-tile ranges
come from ``searchsorted``.

The pair buffer is the ONLY static capacity: a splat may touch arbitrarily
many tiles (a screen-covering splat contributes its full tile count, exactly
like CUDA) — the sort domain is ``max_pairs``, never P*K. An earlier [P,K]
formulation made the sort domain scale with the largest splat's tile count,
which blew up to ~100M-element sorts on scenes with transiently-huge splats;
truncating instead chopped splats mid-rect, and the resulting hard edge
pushed scale gradients UP (grow-to-cover), a positive feedback loop that
stalled reference-scale training.

Everything is integer bookkeeping under ``stop_gradient`` — gradients flow
through the blend, not the binning (same as CUDA).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import ProcessedSplats


class TileLists(NamedTuple):
    point_list: jnp.ndarray    # [A] splat ids in (tile, depth) order
    tile_starts: jnp.ndarray   # [n_tiles] int32 start index into point_list
    tile_counts: jnp.ndarray   # [n_tiles] int32
    num_pairs: jnp.ndarray     # [] int32 total demanded pairs (may exceed A)
    overflowed: jnp.ndarray    # [] bool: num_pairs > max_pairs (truncated)
    k_overflowed: jnp.ndarray = None  # [] bool: always False (kept for compat)


def build_tile_lists_depth_presort(proc: ProcessedSplats, grid_x: int,
                                   grid_y: int,
                                   max_tiles_per_splat: int = 32,
                                   max_pairs: int | None = None) -> TileLists:
    """Same contract as :func:`build_tile_lists`, different sort split.

    Sort the SPLATS by depth first (a [P] sort, ~16x smaller than the
    pair domain), expand runs in depth order, then STABLE-sort pairs by
    tile id alone — stability preserves the depth order within each tile,
    so the big [A] sort carries 1 key + 1 payload instead of 2 keys +
    1 payload. Equivalent output up to depth-tie ordering (CUDA's radix
    order on ties is implementation-defined too, rasterizer_impl.cu:310).

    Overflow semantics differ from the default builder in WHICH pairs are
    dropped when num_pairs > A (nearest-depth splats survive here — a
    strictly better truncation policy than trailing-id), so `overflowed`
    still reports identically and growth logic is unchanged.
    """
    n_tiles = grid_x * grid_y
    P = proc.depth.shape[0]
    A = max_pairs if max_pairs is not None else P * max_tiles_per_splat
    A = min(A, P * n_tiles)

    tt0 = jax.lax.stop_gradient(proc.tiles_touched)      # [P], 0 for culled
    depth0 = jax.lax.stop_gradient(proc.depth)
    # depth-order the splats; culled splats sink to the end
    dkey = jnp.where(tt0 > 0, depth0, jnp.inf)
    _, perm = jax.lax.sort((dkey, jnp.arange(P, dtype=jnp.int32)),
                           num_keys=1)
    tt = tt0[perm]
    offsets = jnp.cumsum(tt) - tt
    num_pairs = offsets[-1] + tt[-1]

    ar = jnp.arange(A, dtype=jnp.int32)
    ids = jnp.arange(P, dtype=jnp.int32)
    pos = jnp.where(tt > 0, offsets, A)
    seed_id = jnp.zeros((A,), jnp.int32).at[pos].max(ids, mode='drop')
    sid = jax.lax.cummax(seed_id, axis=0)                # into SORTED order
    seed_off = jnp.zeros((A,), jnp.int32).at[pos].max(offsets, mode='drop')
    k_in = ar - jax.lax.cummax(seed_off, axis=0)

    orig = perm[sid]                                     # original splat id
    rect_w = jnp.maximum(proc.rect_max[:, 0] - proc.rect_min[:, 0], 1)
    rw = rect_w[orig]
    tile_x = proc.rect_min[orig, 0] + k_in % rw
    tile_y = proc.rect_min[orig, 1] + k_in // rw
    valid = ar < jnp.minimum(num_pairs, A)
    tile_id = tile_y * grid_x + tile_x

    key_tile = jnp.where(valid, tile_id, n_tiles).astype(jnp.int32)
    # stable single-key sort: depth order within each tile is preserved
    sorted_tile, point_list = jax.lax.sort((key_tile, orig), num_keys=1,
                                           is_stable=True)

    overflowed = num_pairs > A
    tile_starts = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32),
        side='left').astype(jnp.int32)
    tile_ends = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32),
        side='right').astype(jnp.int32)
    return TileLists(point_list=point_list, tile_starts=tile_starts,
                     tile_counts=tile_ends - tile_starts,
                     num_pairs=num_pairs, overflowed=overflowed,
                     k_overflowed=jnp.zeros((), bool))


def build_tile_lists(proc: ProcessedSplats, grid_x: int, grid_y: int,
                     max_tiles_per_splat: int = 32,
                     max_pairs: int | None = None) -> TileLists:
    """Build depth-sorted per-tile splat lists.

    ``max_pairs`` sizes the pair buffer (default: P * max_tiles_per_splat,
    the legacy sizing — ``max_tiles_per_splat`` no longer bounds any
    single splat, it only feeds this default). When the scene demands more
    pairs than the buffer holds, whole trailing splats (by id) are dropped
    plus at most one split mid-rect, and ``overflowed`` reports it so the
    caller can grow the cap; ``num_pairs`` is the TRUE demand, so growth
    can jump straight to it.
    """
    n_tiles = grid_x * grid_y
    P = proc.depth.shape[0]
    A = max_pairs if max_pairs is not None else P * max_tiles_per_splat
    A = min(A, P * n_tiles)

    # exclusive scan of true tile counts -> per-splat write offsets
    # (rasterizer_impl.cu:299 InclusiveSum)
    tt = jax.lax.stop_gradient(proc.tiles_touched)     # [P], 0 for culled
    offsets = jnp.cumsum(tt) - tt
    num_pairs = offsets[-1] + tt[-1]

    # run-length expansion: slot -> owning splat id / run start offset.
    # Seed each run's first slot, fill with a running max (offsets and ids
    # are both monotone, so cummax recovers the owner everywhere).
    ar = jnp.arange(A, dtype=jnp.int32)
    ids = jnp.arange(P, dtype=jnp.int32)
    pos = jnp.where(tt > 0, offsets, A)                # empty runs: dropped
    seed_id = jnp.zeros((A,), jnp.int32).at[pos].max(ids, mode='drop')
    sid = jax.lax.cummax(seed_id, axis=0)              # [A] splat per slot
    seed_off = jnp.zeros((A,), jnp.int32).at[pos].max(offsets, mode='drop')
    k_in = ar - jax.lax.cummax(seed_off, axis=0)       # index within rect

    # decode row-major rect enumeration -> tile id
    rect_w = jnp.maximum(proc.rect_max[:, 0] - proc.rect_min[:, 0], 1)
    rw = rect_w[sid]
    tile_x = proc.rect_min[sid, 0] + k_in % rw
    tile_y = proc.rect_min[sid, 1] + k_in // rw
    valid = ar < jnp.minimum(num_pairs, A)
    tile_id = tile_y * grid_x + tile_x                  # [A]

    key_tile = jnp.where(valid, tile_id, n_tiles).astype(jnp.int32)
    key_depth = jax.lax.stop_gradient(proc.depth)[sid]
    sorted_tile, _, point_list = jax.lax.sort(
        (key_tile, key_depth, sid), num_keys=2)

    overflowed = num_pairs > A
    tile_starts = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32),
        side='left').astype(jnp.int32)
    tile_ends = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32),
        side='right').astype(jnp.int32)
    return TileLists(point_list=point_list, tile_starts=tile_starts,
                     tile_counts=tile_ends - tile_starts,
                     num_pairs=num_pairs, overflowed=overflowed,
                     k_overflowed=jnp.zeros((), bool))
