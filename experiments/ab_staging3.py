"""Round-3 staging fix candidate: PIN THE GATHER INDEX.

ab_gather2.py measured the isolated row gather at 3.1 ms for 640k x 24
f32 (205 M rows/s) — yet the in-graph "+payload gather" stage costs
11.4 ms (ab_staging2.py). The index feeding the gather is itself a
gather-of-cummax-maps chain (build_aligned_pairs), and XLA fuses that
chain INTO the payload gather (recomputed per consumer; the existing
optimization_barriers pin only the payload table and the gather OUTPUT).
Variants: barrier the slot->splat index array (and the slot->src map)
before the row gather, at K1 16 and 8.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _camera, _scene
from langscenex_tpu.ops.rasterize import RasterConfig, rasterize, preprocess
from langscenex_tpu.ops.binning import CullSpec, build_tile_lists
from langscenex_tpu.ops import rasterize_pallas as rp

P = 100_000
CAM = _camera(720, 480)
BASE = dict(tile_w=32, tile_h=32, chunk=128, max_splats_per_tile=1024)


def timed(name, fn, args, n=20, reps=3):
    def body(*a):
        def step(carry, _):
            out = fn(a[0] + carry * 1e-30, *a[1:])
            return jnp.sum(out).astype(jnp.float32), None
        return jax.lax.scan(step, jnp.zeros(()), None, length=n)[0]
    jfn = jax.jit(body)
    float(jfn(*args))
    dts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jfn(*args))
        dts.append((time.perf_counter() - t0) / n * 1e3)
    dt = min(dts)
    print(f"{name:52s} {dt:7.2f} ms   ({1e3/dt:6.1f} fps)", flush=True)
    return dt


def full_fn(cfg):
    def f(means, scales, quats, opac, shs, lang, inst):
        out = rasterize(means, scales, quats, opac, CAM, jnp.zeros(3),
                        shs=shs, sh_degree=3, language_feature=lang,
                        instance_feature=inst, cfg=cfg)
        return out.color
    return f


def main():
    args = tuple(map(jnp.asarray, _scene(P)))
    orig_bap = rp.build_aligned_pairs

    def bap_barrier(lists, n_tiles):
        ap = orig_bap(lists, n_tiles)
        src, ids = jax.lax.optimization_barrier((ap.src, ap.ids))
        return rp.AlignedPairs(src=src, ids=ids, starts=ap.starts,
                               counts=ap.counts)

    for k1 in (16, 8):
        cfg = RasterConfig(max_tiles_per_splat=k1, max_pairs=640_000,
                           **BASE)
        rp.build_aligned_pairs = orig_bap
        base = timed(f"K1={k1} baseline", full_fn(cfg), args)
        base_c = jax.jit(full_fn(cfg))(*args)
        rp.build_aligned_pairs = bap_barrier
        ms = timed(f"K1={k1} + index barrier", full_fn(cfg), args)
        c = jax.jit(full_fn(cfg))(*args)
        gap = float(jnp.abs(c - base_c).max())
        print(f"    bit gap vs baseline: {gap:.2e}", flush=True)
    rp.build_aligned_pairs = orig_bap


if __name__ == "__main__":
    main()
