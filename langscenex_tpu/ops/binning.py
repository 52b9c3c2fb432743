"""Tile binning: duplicate splats into (tile, depth)-sorted pair lists.

Replaces the reference's duplicateWithKeys + cub RadixSort + identifyTileRanges
(cuda_rasterizer/rasterizer_impl.cu:70-130,285-328) with a static-shape XLA
formulation: enumerate up to K tiles per splat, lexicographically sort the
[P*K] pair list by (tile_id, depth) with ``lax.sort(num_keys=2)``, and read
per-tile ranges with ``searchsorted``. Everything is integer bookkeeping and
runs under ``stop_gradient`` — gradients flow through the blend, not the
binning (same as CUDA).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import ProcessedSplats


class TileLists(NamedTuple):
    point_list: jnp.ndarray    # [P*K] splat ids in (tile, depth) order
    tile_starts: jnp.ndarray   # [n_tiles] int32 start index into point_list
    tile_counts: jnp.ndarray   # [n_tiles] int32
    num_pairs: jnp.ndarray     # [] int32 total valid pairs
    overflowed: jnp.ndarray    # [] bool: K or max_pairs truncated
    k_overflowed: jnp.ndarray = None  # [] bool: K alone truncated


def build_tile_lists(proc: ProcessedSplats, grid_x: int, grid_y: int,
                     max_tiles_per_splat: int = 32,
                     max_pairs: int | None = None) -> TileLists:
    """Build depth-sorted per-tile splat lists.

    ``max_tiles_per_splat`` (K) bounds the duplication statically; splats
    whose tile rect exceeds K tiles are truncated in row-major rect order
    (``overflowed`` reports if that happened — raise K if so).

    ``max_pairs`` optionally caps the SORTED pair list: invalid pairs
    sort to the end (tile key = n_tiles), so slicing the first
    ``max_pairs`` entries keeps every valid pair as long as
    num_pairs <= max_pairs (``overflowed`` reports otherwise). All
    downstream pair-domain work (range lookup, aligned layout, payload
    gather, blend DMA) scales with this capacity, not with P*K — at the
    bench scene (100k splats, 941k pairs of 1.6M capacity) capping is a
    measured end-to-end win (experiments/ab_forward3.py).
    """
    K = max_tiles_per_splat
    n_tiles = grid_x * grid_y
    P = proc.depth.shape[0]

    rect_w = jnp.maximum(proc.rect_max[:, 0] - proc.rect_min[:, 0], 1)
    k = jnp.arange(K, dtype=jnp.int32)
    # row-major enumeration of the rect: k -> (kx, ky)
    kx = k[None, :] % rect_w[:, None]
    ky = k[None, :] // rect_w[:, None]
    tile_x = proc.rect_min[:, 0:1] + kx
    tile_y = proc.rect_min[:, 1:2] + ky
    valid = (k[None, :] < proc.tiles_touched[:, None]) & proc.visible[:, None]
    tile_id = tile_y * grid_x + tile_x                      # [P,K]

    key_tile = jnp.where(valid, tile_id, n_tiles).reshape(-1).astype(jnp.int32)
    key_depth = jnp.broadcast_to(proc.depth[:, None], (P, K)).reshape(-1)
    splat_id = jnp.broadcast_to(
        jnp.arange(P, dtype=jnp.int32)[:, None], (P, K)).reshape(-1)

    key_tile = jax.lax.stop_gradient(key_tile)
    key_depth = jax.lax.stop_gradient(key_depth)
    sorted_tile, _, point_list = jax.lax.sort(
        (key_tile, key_depth, splat_id), num_keys=2)

    num_pairs = jnp.sum(valid.astype(jnp.int32))
    k_overflowed = jnp.any(proc.tiles_touched > K)
    overflowed = k_overflowed
    if max_pairs is not None and max_pairs < sorted_tile.shape[0]:
        sorted_tile = sorted_tile[:max_pairs]
        point_list = point_list[:max_pairs]
        overflowed = overflowed | (num_pairs > max_pairs)

    tile_starts = jnp.searchsorted(sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32),
                                   side='left').astype(jnp.int32)
    tile_ends = jnp.searchsorted(sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32),
                                 side='right').astype(jnp.int32)
    return TileLists(point_list=point_list, tile_starts=tile_starts,
                     tile_counts=tile_ends - tile_starts,
                     num_pairs=num_pairs, overflowed=overflowed,
                     k_overflowed=k_overflowed)
