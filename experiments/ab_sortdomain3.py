"""A/B round 3 (device): sort-based tier registers + cap sizing.

Round 2 findings: exact tiers regressed 13.0 -> 19.1 ms because
lax.top_k at B_max=40960 costs ~6 ms (vs ~0.5 ms for a full [P]
variadic sort); key_only regressed everywhere (the post-sort sid
gather is transaction-bound and breaks the sort fusion) — retired.
This round: (a) exact tiers with the sort-based register
(binning._enumerate_two_tier B_max>1024 path), (b) cap sizing — the
align-free staging gathers payload rows for EVERY slot up to max_pairs,
so cap 640k -> 540k (1.12x the 484k culled demand) should shave ~0.5 ms
of gather + sort tail.

Run: cd /root/repo && python experiments/ab_sortdomain3.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from __graft_entry__ import _camera, _scene
from langscenex_tpu.ops.rasterize import RasterConfig, rasterize


def bench_cfg(tag, cfg, cam, args, n=20):
    means, scales, quats, opac, shs, lang, inst = args

    def fn(means, scales, quats, opac, shs, lang, inst):
        out = rasterize(means, scales, quats, opac, cam,
                        jnp.zeros(3), shs=shs, sh_degree=3,
                        language_feature=lang, instance_feature=inst,
                        cfg=cfg)
        return (out.color, out.language, out.instance, out.final_T,
                out.pairs_overflowed)

    def body(*a):
        def step(carry, _):
            out = fn(a[0] + carry * 1e-30, *a[1:])
            return jnp.sum(out[0]), None
        return jax.lax.scan(step, jnp.zeros(()), None, length=n)[0]

    jfn = jax.jit(body)
    float(jfn(*args))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(*args))
        dts.append((time.perf_counter() - t0) / n)
    dt = min(dts)
    out = jax.jit(fn)(*args)
    print(f"{tag:44s}: {dt*1e3:6.2f} ms  {1/dt:6.1f} fps  "
          f"ovf={bool(out[4])}", flush=True)
    return dt, out[0]


def main():
    cam = _camera(720, 480)
    args = tuple(map(jnp.asarray, _scene(100_000)))
    base = dict(tile_w=32, tile_h=32, chunk=128, max_splats_per_tile=1024)
    EXACT_TIERS = ((40960, 8), (7168, 16), (1536, 32))

    configs = [
        ("G2 k8 EXACT tiers rank sort-reg 640k", RasterConfig(
            max_tiles_per_splat=8, big_splats=64, extra_tiers=EXACT_TIERS,
            rank_key_sort=True, max_pairs=640_000, **base)),
        ("G3 = G2 + cap 540k", RasterConfig(
            max_tiles_per_splat=8, big_splats=64, extra_tiers=EXACT_TIERS,
            rank_key_sort=True, max_pairs=540_000, **base)),
        ("D2 k8 tiers(8k x8)(1k x16) rank 540k", RasterConfig(
            max_tiles_per_splat=8, extra_tiers=((8192, 8), (1024, 16)),
            rank_key_sort=True, max_pairs=540_000, **base)),
        ("B2 k16 rank 540k", RasterConfig(
            max_tiles_per_splat=16, rank_key_sort=True,
            max_pairs=540_000, **base)),
    ]
    ref = None
    for tag, cfg in configs:
        dt, img = bench_cfg(tag, cfg, cam, args)
        if ref is None:
            ref = img
        else:
            print(f"    max|render - G2| = "
                  f"{float(jnp.max(jnp.abs(img - ref))):.3e}", flush=True)


if __name__ == "__main__":
    main()
