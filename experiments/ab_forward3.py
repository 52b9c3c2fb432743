"""Forward A/B round 3: one-cummax pair map, pair cap, packed sort."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _camera, _scene
from langscenex_tpu.ops import binning as bn
from langscenex_tpu.ops import rasterize_pallas as rp
from langscenex_tpu.ops.rasterize import rasterize, RasterConfig


def timed(name, make_out, args, n=30):
    try:
        def body(*a):
            def step(carry, _):
                out = make_out(a[0] + carry * 1e-30, *a[1:])
                return jnp.sum(out[0]).astype(jnp.float32), None
            return jax.lax.scan(step, jnp.zeros(()), None, length=n)[0]
        jfn = jax.jit(body)
        float(jfn(*args))
        t0 = time.perf_counter()
        float(jfn(*args))
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{name:36s} {dt:7.2f} ms   ({1e3/dt:6.1f} fps)", flush=True)
    except Exception as e:
        print(f"{name:36s} FAILED {type(e).__name__} {str(e)[:90]}",
              flush=True)


def one_cummax_build(lists, n_tiles):
    """slot->tile via ONE cummax; per-slot values by gathers from the
    [n_tiles] tables (vs three full-length segment cummaxes)."""
    list_len = lists.point_list.shape[0]
    A = rp.aligned_capacity(list_len, n_tiles)
    counts = lists.tile_counts
    aligned_counts = ((counts + 127) // 128) * 128
    starts = jnp.concatenate([
        jnp.zeros(1, jnp.int32),
        jnp.cumsum(aligned_counts)[:-1].astype(jnp.int32)])
    slot = jnp.arange(A, dtype=jnp.int32)
    init = jnp.full((A,), jnp.iinfo(jnp.int32).min, jnp.int32)
    markers = init.at[jnp.clip(starts, 0, A - 1)].max(
        jnp.arange(n_tiles, dtype=jnp.int32))
    tile_of = jnp.maximum(jax.lax.cummax(markers, axis=0), 0)
    astart_of = jnp.take(starts, tile_of)
    tstart_of = jnp.take(lists.tile_starts, tile_of)
    tend_of = tstart_of + jnp.take(counts, tile_of)
    rank = slot - astart_of
    src = tstart_of + rank
    valid = src < tend_of
    src = jnp.where(valid, src, list_len)
    ids = jnp.where(valid,
                    jnp.take(lists.point_list, jnp.minimum(src, list_len - 1),
                             mode='clip'),
                    -1)
    return rp.AlignedPairs(src=src, ids=ids, starts=starts, counts=counts)


def packed_sort_build(proc, grid_x, grid_y, max_tiles_per_splat=32,
                      max_pairs=None):
    K = max_tiles_per_splat
    n_tiles = grid_x * grid_y
    P = proc.depth.shape[0]
    rect_w = jnp.maximum(proc.rect_max[:, 0] - proc.rect_min[:, 0], 1)
    k = jnp.arange(K, dtype=jnp.int32)
    kx = k[None, :] % rect_w[:, None]
    ky = k[None, :] // rect_w[:, None]
    tile_x = proc.rect_min[:, 0:1] + kx
    tile_y = proc.rect_min[:, 1:2] + ky
    valid = (k[None, :] < proc.tiles_touched[:, None]) & proc.visible[:, None]
    tile_id = tile_y * grid_x + tile_x
    key_tile = jnp.where(valid, tile_id, n_tiles).reshape(-1)
    depth = jnp.broadcast_to(proc.depth[:, None], (P, K)).reshape(-1)
    bits = jax.lax.bitcast_convert_type(
        jnp.maximum(depth, 0.0), jnp.uint32)
    key = (key_tile.astype(jnp.uint32) * jnp.uint32(1 << 23)
           + bits // jnp.uint32(512))
    key = jax.lax.stop_gradient(key)
    splat_id = jnp.broadcast_to(
        jnp.arange(P, dtype=jnp.int32)[:, None], (P, K)).reshape(-1)
    sorted_key, point_list = jax.lax.sort((key, splat_id), num_keys=1)
    num_pairs = jnp.sum(valid.astype(jnp.int32))
    overflowed = jnp.any(proc.tiles_touched > K)
    if max_pairs is not None and max_pairs < sorted_key.shape[0]:
        sorted_key = sorted_key[:max_pairs]
        point_list = point_list[:max_pairs]
        overflowed = overflowed | (num_pairs > max_pairs)
    sorted_tile = (sorted_key // jnp.uint32(1 << 23)).astype(jnp.int32)
    tile_starts = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32),
        side='left').astype(jnp.int32)
    tile_ends = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32),
        side='right').astype(jnp.int32)
    return bn.TileLists(point_list=point_list, tile_starts=tile_starts,
                        tile_counts=tile_ends - tile_starts,
                        num_pairs=num_pairs, overflowed=overflowed)


def main():
    P = 100_000
    cam = _camera(720, 480)
    means, scales, quats, opac, shs, lang, inst = map(jnp.asarray, _scene(P))
    args = (means, scales, quats, opac, shs, lang, inst)

    def make_fwd(cfg):
        def fwd(means, scales, quats, opac, shs, lang, inst):
            out = rasterize(means, scales, quats, opac, cam, jnp.zeros(3),
                            shs=shs, sh_degree=3, language_feature=lang,
                            instance_feature=inst, cfg=cfg)
            return out.color, out.final_T
        return fwd

    cfg0 = RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16,
                        chunk=128, max_splats_per_tile=1024)
    cfg_cap = RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16,
                           max_pairs=1 << 20, chunk=128,
                           max_splats_per_tile=1024)

    timed("V0 baseline", make_fwd(cfg0), args)

    orig_ap = rp.build_aligned_pairs
    rp.build_aligned_pairs = one_cummax_build
    timed("V5 one-cummax map", make_fwd(cfg0), args)
    timed("V5 + pair cap 1M", make_fwd(cfg_cap), args)

    orig_bt = bn.build_tile_lists
    import langscenex_tpu.ops.rasterize as rz
    bn.build_tile_lists = packed_sort_build
    rz.build_tile_lists = packed_sort_build
    timed("V5 + cap + packed u32 sort", make_fwd(cfg_cap), args)
    rp.build_aligned_pairs = orig_ap
    timed("V0map + cap + packed sort", make_fwd(cfg_cap), args)
    bn.build_tile_lists = orig_bt
    rz.build_tile_lists = orig_bt


if __name__ == "__main__":
    main()
