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
    num_pairs: jnp.ndarray     # [] int32 total demanded pairs (may exceed A;
                               #    saturated at int32 max — see _demand)
    overflowed: jnp.ndarray    # [] bool: demand > max_pairs (truncated)
    k_overflowed: jnp.ndarray = None  # [] bool: always False (kept for compat)
    perm: jnp.ndarray = None   # [P] depth order (rank -> original splat id);
                               #    set only by the depth_presort builder with
                               #    return_ranks=True, where point_list holds
                               #    depth RANKS instead of original ids


def _demand(tt: jnp.ndarray, A: int):
    """(num_pairs int32 saturated, overflowed bool) from per-splat tile
    counts. The total is accumulated in f32 (exact to ~2^24, then ~1e-7
    relative — plenty for a threshold): an int32 cumsum would WRAP past
    2^31 demanded pairs (2M-splat capacity x ~1.4k tiles exceeds it), and
    a wrapped-negative num_pairs would read as "no overflow" — silent
    permanent truncation with adaptive growth never firing."""
    total_f = jnp.sum(tt.astype(jnp.float32))
    overflowed = total_f > A
    num_pairs = jnp.minimum(total_f, float(2 ** 31 - 1)).astype(jnp.int32)
    return num_pairs, overflowed


def _expand_runs(tt: jnp.ndarray, A: int):
    """Run-length expansion of per-splat tile counts into the [A] pair
    buffer: slot -> (owning splat index, index within its rect, valid).

    Seed each run's first slot, fill with a running max (offsets and ids
    are both monotone, so cummax recovers the owner everywhere). Offsets
    at/past A — including any int32-wrapped NEGATIVE offsets deep in a
    pathological cumsum — are dropped from the seed scatter."""
    P = tt.shape[0]
    offsets = jnp.cumsum(tt) - tt                      # exclusive scan
    ar = jnp.arange(A, dtype=jnp.int32)
    ids = jnp.arange(P, dtype=jnp.int32)
    in_buf = (tt > 0) & (offsets >= 0) & (offsets < A)
    pos = jnp.where(in_buf, offsets, A)                # A == dropped
    seed_id = jnp.zeros((A,), jnp.int32).at[pos].max(ids, mode='drop')
    owner = jax.lax.cummax(seed_id, axis=0)            # [A] splat per slot
    seed_off = jnp.zeros((A,), jnp.int32).at[pos].max(offsets, mode='drop')
    k_in = ar - jax.lax.cummax(seed_off, axis=0)       # index within rect
    # slots at/past the total demand are invalid; saturate the comparison
    # through the f32 demand path (offsets[-1]+tt[-1] can wrap)
    num_pairs, _ = _demand(tt, A)
    valid = ar < jnp.minimum(num_pairs, A)
    return owner, k_in, valid


def _decode_tiles(proc: ProcessedSplats, orig: jnp.ndarray,
                  k_in: jnp.ndarray, valid: jnp.ndarray,
                  grid_x: int, n_tiles: int):
    """Row-major rect enumeration -> per-slot tile id (invalid slots get
    the n_tiles sentinel, sorting to the end)."""
    rect_w = jnp.maximum(proc.rect_max[:, 0] - proc.rect_min[:, 0], 1)
    rw = rect_w[orig]
    tile_x = proc.rect_min[orig, 0] + k_in % rw
    tile_y = proc.rect_min[orig, 1] + k_in // rw
    tile_id = tile_y * grid_x + tile_x
    return jnp.where(valid, tile_id, n_tiles).astype(jnp.int32)


def _tile_ranges(sorted_tile: jnp.ndarray, n_tiles: int):
    tile_starts = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32),
        side='left').astype(jnp.int32)
    tile_ends = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32),
        side='right').astype(jnp.int32)
    return tile_starts, tile_ends - tile_starts


def build_tile_lists(proc: ProcessedSplats, grid_x: int, grid_y: int,
                     max_tiles_per_splat: int = 32,
                     max_pairs: int | None = None) -> TileLists:
    """Build depth-sorted per-tile splat lists.

    ``max_pairs`` sizes the pair buffer (default: P * max_tiles_per_splat,
    the legacy sizing — ``max_tiles_per_splat`` no longer bounds any
    single splat, it only feeds this default). When the scene demands more
    pairs than the buffer holds, whole trailing splats (by id) are dropped
    plus at most one split mid-rect, and ``overflowed`` reports it so the
    caller can grow the cap; ``num_pairs`` is the TRUE demand (saturated
    at int32 max), so growth can jump straight to it.
    """
    n_tiles = grid_x * grid_y
    P = proc.depth.shape[0]
    A = max_pairs if max_pairs is not None else P * max_tiles_per_splat
    A = min(A, P * n_tiles)

    # exclusive scan of true tile counts -> per-splat write offsets
    # (rasterizer_impl.cu:299 InclusiveSum), expanded into the buffer
    tt = jax.lax.stop_gradient(proc.tiles_touched)     # [P], 0 for culled
    sid, k_in, valid = _expand_runs(tt, A)
    key_tile = _decode_tiles(proc, sid, k_in, valid, grid_x, n_tiles)

    key_depth = jax.lax.stop_gradient(proc.depth)[sid]
    sorted_tile, _, point_list = jax.lax.sort(
        (key_tile, key_depth, sid), num_keys=2)

    num_pairs, overflowed = _demand(tt, A)
    tile_starts, tile_counts = _tile_ranges(sorted_tile, n_tiles)
    return TileLists(point_list=point_list, tile_starts=tile_starts,
                     tile_counts=tile_counts,
                     num_pairs=num_pairs, overflowed=overflowed,
                     k_overflowed=jnp.zeros((), bool))


def build_tile_lists_depth_presort(proc: ProcessedSplats, grid_x: int,
                                   grid_y: int,
                                   max_tiles_per_splat: int = 32,
                                   max_pairs: int | None = None,
                                   return_ranks: bool = False) -> TileLists:
    """Same contract as :func:`build_tile_lists`, different sort split.

    Sort the SPLATS by depth first (a [P] sort, ~16x smaller than the
    pair domain), expand runs in depth order, then STABLE-sort pairs by
    tile id alone — stability preserves the depth order within each tile,
    so the big [A] sort carries 1 key + 1 payload instead of 2 keys +
    1 payload. Equivalent output up to depth-tie ordering (CUDA's radix
    order on ties is implementation-defined too, rasterizer_impl.cu:310).

    Overflow semantics differ from the default builder in WHICH pairs are
    dropped when demand > A (nearest-depth splats survive here — a
    strictly better truncation policy than trailing-id), so `overflowed`
    still reports identically and growth logic is unchanged.

    ``return_ranks=True``: ``point_list`` holds depth RANKS and ``perm``
    maps rank -> original id. Within every tile the ranks are then
    MONOTONICALLY INCREASING (stable tile sort of an already-rank-ordered
    stream), so a blend payload table permuted into depth order is read
    with locally coherent, ascending row indices — the A-row payload
    gather (the measured transaction-bound cost, KERNELS.md §6) becomes
    near-sequential instead of random.
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
    sid, k_in, valid = _expand_runs(tt, A)
    orig = perm[sid]                                     # original splat id
    key_tile = _decode_tiles(proc, orig, k_in, valid, grid_x, n_tiles)

    # stable single-key sort: depth order within each tile is preserved
    payload = sid if return_ranks else orig
    sorted_tile, point_list = jax.lax.sort((key_tile, payload), num_keys=1,
                                           is_stable=True)

    num_pairs, overflowed = _demand(tt, A)
    tile_starts, tile_counts = _tile_ranges(sorted_tile, n_tiles)
    return TileLists(point_list=point_list, tile_starts=tile_starts,
                     tile_counts=tile_counts,
                     num_pairs=num_pairs, overflowed=overflowed,
                     k_overflowed=jnp.zeros((), bool),
                     perm=perm if return_ranks else None)
