"""A/B round 2 (device): exact tiers + key-only rank sort.

Round 1 (ab_sortdomain.py): rank_key 67.4 -> 70.3 fps bit-identical;
k8 + undersized tiers 76.6 fps but k_overflowed (truncating). The AABB
tile-count tail of the bench scene (CPU-measured): tt>8 = 40194,
tt>16 = 6991, tt>32 = 1372, tt>64 = 20, max 81. This round sizes tiers
EXACTLY to that tail and adds the key_only sort (1-operand sort, sid
recovered from the rank bits — binning.build_tile_lists docstring).

Run: cd /root/repo && python experiments/ab_sortdomain2.py
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
    ovf = bool(out[4])
    print(f"{tag:40s}: {dt*1e3:6.2f} ms  {1/dt:6.1f} fps  "
          f"ovf={ovf}", flush=True)
    return dt, out[0]


def main():
    cam = _camera(720, 480)
    args = tuple(map(jnp.asarray, _scene(100_000)))
    base = dict(tile_w=32, tile_h=32, chunk=128, max_splats_per_tile=1024,
                max_pairs=640_000)
    EXACT_TIERS = ((40960, 8), (7168, 16), (1536, 32))

    configs = [
        ("G k8 EXACT tiers rank", RasterConfig(
            max_tiles_per_splat=8, big_splats=64,
            extra_tiers=EXACT_TIERS, rank_key_sort=True, **base)),
        ("H = G + key_only", RasterConfig(
            max_tiles_per_splat=8, big_splats=64,
            extra_tiers=EXACT_TIERS, rank_key_sort=True,
            key_only_sort=True, **base)),
        ("I k16 rank key_only (r3-workload)", RasterConfig(
            max_tiles_per_splat=16, rank_key_sort=True,
            key_only_sort=True, **base)),
        ("J k8 small-tiers rank key_only", RasterConfig(
            max_tiles_per_splat=8, extra_tiers=((8192, 8), (1024, 16)),
            rank_key_sort=True, key_only_sort=True, **base)),
    ]
    ref = None
    for tag, cfg in configs:
        dt, img = bench_cfg(tag, cfg, cam, args)
        if ref is None:
            ref = img
        else:
            print(f"    max|render - G| = "
                  f"{float(jnp.max(jnp.abs(img - ref))):.3e}", flush=True)


if __name__ == "__main__":
    main()
