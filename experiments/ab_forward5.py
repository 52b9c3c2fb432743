"""Marginal-cost breakdown: replace each stage with a free stand-in.

The stand-ins produce WRONG images but identical shapes/dataflow, so the
fps delta vs V0 is the true fused marginal cost of the replaced stage
(stage-sum timings materialize intermediates and mis-attribute)."""
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
        print(f"{name:30s} {dt:7.2f} ms   ({1e3/dt:6.1f} fps)", flush=True)
    except Exception as e:
        print(f"{name:30s} FAILED {type(e).__name__} {str(e)[:90]}",
              flush=True)


def nomap_build(lists, n_tiles):
    """Free stand-in for the aligned pair map (wrong mapping)."""
    list_len = lists.point_list.shape[0]
    A = rp.aligned_capacity(list_len, n_tiles)
    counts = lists.tile_counts
    aligned_counts = ((counts + 127) // 128) * 128
    starts = jnp.concatenate([
        jnp.zeros(1, jnp.int32),
        jnp.cumsum(aligned_counts)[:-1].astype(jnp.int32)])
    slot = jnp.arange(A, dtype=jnp.int32)
    src = jnp.minimum(slot, list_len - 1)
    ids = jnp.take(lists.point_list, src)
    return rp.AlignedPairs(src=src, ids=ids, starts=starts, counts=counts)


def nosort_build(proc, grid_x, grid_y, max_tiles_per_splat=32,
                 max_pairs=None):
    """Free stand-in for the (tile,depth) sort (wrong ordering)."""
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
    splat_id = jnp.broadcast_to(
        jnp.arange(P, dtype=jnp.int32)[:, None], (P, K)).reshape(-1)
    sorted_tile = jax.lax.stop_gradient(key_tile)   # unsorted!
    tile_starts = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32),
        side='left').astype(jnp.int32)
    tile_ends = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32),
        side='right').astype(jnp.int32)
    return bn.TileLists(point_list=splat_id, tile_starts=tile_starts,
                        tile_counts=tile_ends - tile_starts,
                        num_pairs=jnp.sum(valid.astype(jnp.int32)),
                        overflowed=jnp.any(proc.tiles_touched > K))


_orig_blend = rp.blend_tiles_pallas


def nogather_blend(lists, mean2d, conic, opacity, channels, grid_x, grid_y,
                   cfg, mean2d_abs_hook=None):
    """Stand-in staging: constant payload rows (no random-row gather)."""
    n_tiles = grid_x * grid_y
    P = mean2d.shape[0]
    C = channels.shape[1]
    ap = rp.build_aligned_pairs(lists, n_tiles)
    A = ap.src.shape[0]
    payload = jnp.concatenate(
        [mean2d, conic, opacity.reshape(-1, 1), channels,
         jnp.zeros((P, rp.ROWS - 6 - C))], axis=1)
    payload = jax.lax.optimization_barrier(payload)
    row = jnp.sum(payload, axis=0) / P                      # [24]
    pay_t = jax.lax.optimization_barrier(
        jnp.broadcast_to(row[:, None], (rp.ROWS, A)))
    hook = jnp.zeros((A, 2), jnp.float32)
    img, obs = rp.blend_pairs(pay_t, hook, ap.starts, ap.counts,
                              grid_x, n_tiles)
    accum = img[:, :C, :]
    T = img[:, 16, :]
    observe = jnp.zeros((P,), jnp.int32)
    return accum, T, observe


def main():
    P = 100_000
    cam = _camera(720, 480)
    means, scales, quats, opac, shs, lang, inst = map(jnp.asarray, _scene(P))
    args = (means, scales, quats, opac, shs, lang, inst)
    cfg = RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16,
                       chunk=128, max_splats_per_tile=1024)

    def fwd(means, scales, quats, opac, shs, lang, inst):
        out = rasterize(means, scales, quats, opac, cam, jnp.zeros(3),
                        shs=shs, sh_degree=3, language_feature=lang,
                        instance_feature=inst, cfg=cfg)
        return out.color, out.final_T

    timed("V0 baseline", fwd, args)

    orig_ap = rp.build_aligned_pairs
    rp.build_aligned_pairs = nomap_build
    timed("minus pair-map", fwd, args)
    rp.build_aligned_pairs = orig_ap

    orig_bt = bn.build_tile_lists
    import langscenex_tpu.ops.rasterize as rz
    bn.build_tile_lists = nosort_build
    rz.build_tile_lists = nosort_build
    timed("minus sort", fwd, args)
    bn.build_tile_lists = orig_bt
    rz.build_tile_lists = orig_bt

    orig_blend = rz.blend_tiles_pallas if hasattr(rz, 'blend_tiles_pallas') \
        else None
    rp.blend_tiles_pallas = nogather_blend
    import importlib
    timed("minus payload gather", fwd, args)
    rp.blend_tiles_pallas = _orig_blend


if __name__ == "__main__":
    main()
