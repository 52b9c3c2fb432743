"""A/B full-forward timings for build_aligned_pairs variants on the chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _camera, _scene
from langscenex_tpu.ops import rasterize_pallas as rp
from langscenex_tpu.ops.rasterize import rasterize, RasterConfig


def timed(name, fn, args, n=30):
    def step(carry, _):
        a0 = args[0] + carry * 1e-30
        out = fn(a0, *args[1:])
        return jnp.sum(out[0]), None
    jfn = jax.jit(lambda: jax.lax.scan(step, jnp.zeros(()), None, length=n)[0])
    float(jfn())
    t0 = time.perf_counter()
    float(jfn())
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:28s} {dt:7.2f} ms   ({1e3/dt:6.1f} fps)", flush=True)


def seg_lookup_build(lists, n_tiles):
    """Round-1 variant: per-slot cummax segment lookups."""
    list_len = lists.point_list.shape[0]
    A = rp.aligned_capacity(list_len, n_tiles)
    counts = lists.tile_counts
    aligned_counts = ((counts + 127) // 128) * 128
    starts = jnp.concatenate([
        jnp.zeros(1, jnp.int32),
        jnp.cumsum(aligned_counts)[:-1].astype(jnp.int32)])
    slot = jnp.arange(A, dtype=jnp.int32)
    astart_of = rp._segment_lookup(starts, starts, A)
    tstart_of = rp._segment_lookup(starts, lists.tile_starts, A)
    tend_of = rp._segment_lookup(starts, lists.tile_starts + counts, A)
    rank = slot - astart_of
    src = tstart_of + rank
    valid = src < tend_of
    src = jnp.where(valid, src, list_len)
    ids = jnp.where(valid,
                    jnp.take(lists.point_list, jnp.minimum(src, list_len - 1),
                             mode='clip'),
                    -1)
    return rp.AlignedPairs(src=src, ids=ids, starts=starts, counts=counts)


def chunk_build_barrier(lists, n_tiles):
    ap = rp.build_aligned_pairs(lists, n_tiles)
    src, ids = jax.lax.optimization_barrier((ap.src, ap.ids))
    return rp.AlignedPairs(src=src, ids=ids, starts=ap.starts,
                           counts=ap.counts)


def main():
    P = 100_000
    cam = _camera(720, 480)
    cfg = RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16,
                       chunk=128, max_splats_per_tile=1024)
    means, scales, quats, opac, shs, lang, inst = map(jnp.asarray, _scene(P))
    args = (means, scales, quats, opac, shs, lang, inst)

    def fwd(means, scales, quats, opac, shs, lang, inst):
        out = rasterize(means, scales, quats, opac, cam, jnp.zeros(3),
                        shs=shs, sh_degree=3, language_feature=lang,
                        instance_feature=inst, cfg=cfg)
        return out.color, out.final_T

    orig_build = rp.build_aligned_pairs

    rp_build_current = orig_build
    timed("V1 chunk-cummax (current)", fwd, args)

    rp.build_aligned_pairs = seg_lookup_build
    # rebind inside blend wrapper: blend_tiles_pallas closes over module attr
    timed("V0 per-slot cummax (r1)", fwd, args)

    rp.build_aligned_pairs = chunk_build_barrier
    import langscenex_tpu.ops.rasterize_pallas as _m
    def chunk_barrier2(lists, n_tiles):
        ap = rp_build_current(lists, n_tiles)
        src, ids = jax.lax.optimization_barrier((ap.src, ap.ids))
        return rp.AlignedPairs(src=src, ids=ids, starts=ap.starts,
                               counts=ap.counts)
    rp.build_aligned_pairs = chunk_barrier2
    timed("V2 chunk-cummax + barrier", fwd, args)

    rp.build_aligned_pairs = orig_build


if __name__ == "__main__":
    main()
