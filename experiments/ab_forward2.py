"""Round-2 forward A/B: kernel-only floor + packed-key sort variant."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _camera, _scene
from langscenex_tpu.ops import binning as bn
from langscenex_tpu.ops import rasterize_pallas as rp
from langscenex_tpu.ops.projection import preprocess
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
        print(f"{name:34s} {dt:7.2f} ms   ({1e3/dt:6.1f} fps)", flush=True)
    except Exception as e:
        print(f"{name:34s} FAILED {type(e).__name__} {str(e)[:100]}",
              flush=True)


def packed_sort_build(proc, grid_x, grid_y, max_tiles_per_splat=32):
    """Single f64 key (tile*2^32 + sortable-depth-bits) + one value."""
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
    # single 32-bit key: tile (9 bits for 360 tiles) << 23 | top 23 bits
    # of the positive-float depth pattern (IEEE bits of depth>0 sort like
    # the float; bottom 9 bits dropped -> depth ties only within ~2^-14
    # relative depth, deterministic order via stable sort on key)
    bits = jax.lax.bitcast_convert_type(
        jnp.maximum(depth, 0.0), jnp.uint32)
    key = ((key_tile.astype(jnp.uint32) << 23)
           | jax.lax.shift_right_logical(bits, 9))
    key = jax.lax.stop_gradient(key)
    splat_id = jnp.broadcast_to(
        jnp.arange(P, dtype=jnp.int32)[:, None], (P, K)).reshape(-1)
    sorted_key, point_list = jax.lax.sort((key, splat_id), num_keys=1)
    sorted_tile = jax.lax.shift_right_logical(sorted_key, 23).astype(jnp.int32)
    tile_starts = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32),
        side='left').astype(jnp.int32)
    tile_ends = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32),
        side='right').astype(jnp.int32)
    return bn.TileLists(point_list=point_list, tile_starts=tile_starts,
                        tile_counts=tile_ends - tile_starts,
                        num_pairs=jnp.sum(valid.astype(jnp.int32)),
                        overflowed=jnp.any(proc.tiles_touched > K))


def main():
    P = 100_000
    W, H = 720, 480
    cam = _camera(W, H)
    cfg = RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16,
                       chunk=128, max_splats_per_tile=1024)
    grid_x, grid_y = (W + 127) // 128, (H + 7) // 8
    n_tiles = grid_x * grid_y
    means, scales, quats, opac, shs, lang, inst = map(jnp.asarray, _scene(P))
    args = (means, scales, quats, opac, shs, lang, inst)

    def fwd(means, scales, quats, opac, shs, lang, inst):
        out = rasterize(means, scales, quats, opac, cam, jnp.zeros(3),
                        shs=shs, sh_degree=3, language_feature=lang,
                        instance_feature=inst, cfg=cfg)
        return out.color, out.final_T

    timed("V0 baseline (reverted)", fwd, args)

    # kernel-only: precompute pay_t/starts/counts once, time blend_pairs
    p = preprocess(means, scales, quats, cam, shs=shs, sh_degree=3,
                   tile_w=128, tile_h=8)
    lists = bn.build_tile_lists(p, grid_x, grid_y, 16)
    ap = rp.build_aligned_pairs(lists, n_tiles)
    op = jnp.where(p.visible, opac.reshape(-1), 0.0)
    channels = jnp.concatenate([p.rgb, lang, inst], axis=-1)
    C = channels.shape[1]
    payload = jnp.concatenate(
        [p.mean2d, p.conic, op.reshape(-1, 1), channels,
         jnp.zeros((P, rp.ROWS - 6 - C))], axis=1)
    payload = jnp.concatenate([payload, jnp.zeros((1, rp.ROWS))], axis=0)
    slot_splat = jnp.where(ap.ids < 0, P, ap.ids)
    pay_t = jax.lax.transpose(jnp.take(payload, slot_splat, axis=0), (1, 0))
    pay_t = jax.device_put(pay_t)
    starts, counts = ap.starts, ap.counts

    def blend_only(pay_t):
        img, obs = rp.blend_pairs(pay_t, jnp.zeros((pay_t.shape[1], 2)),
                                  starts, counts, grid_x, n_tiles)
        return (jnp.sum(img[:, :3]),)

    timed("blend kernel only", blend_only, (pay_t,))

    # packed-key sort variant inside the full forward
    orig = bn.build_tile_lists
    bn.build_tile_lists = packed_sort_build
    import langscenex_tpu.ops.rasterize as rz
    rz.build_tile_lists = packed_sort_build
    timed("V3 packed u32 single-key sort", fwd, args)
    bn.build_tile_lists = orig
    rz.build_tile_lists = orig


if __name__ == "__main__":
    main()
