"""A/B (device): sort-domain shrinkers on the bench forward.

KERNELS.md 12b: the 14.9 ms forward spends 6.9 ms sorting a 1.68M-key
3-stream enumeration domain (P*K1 + B*K2 slots) for 484k real pairs.
Round-4 landed two untimed levers:
  - rank_key_sort: 1 packed int32 key + sid (2 streams, not 3)
  - extra_tiers: mid enumeration tiers so K1 can shrink exactly
This times the full bench forward (entry() scene, all channels) across
the config matrix and prints fps + k_overflowed per config.

Run: cd /root/repo && timeout 590 python experiments/ab_sortdomain.py
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

    # exactness probe: single forward, fetch overflow flags
    out = jax.jit(fn)(*args)
    ovf = bool(out[4])
    ref = out[0]
    print(f"{tag:44s}: {dt*1e3:6.2f} ms  {1/dt:6.1f} fps  "
          f"pairs_ovf={ovf}", flush=True)
    return dt, ref


def main():
    cam = _camera(720, 480)
    args = tuple(map(jnp.asarray, _scene(100_000)))
    base = dict(tile_w=32, tile_h=32, chunk=128, max_splats_per_tile=1024,
                max_pairs=640_000)

    configs = [
        ("A k16 2key (r3 bench)", RasterConfig(
            max_tiles_per_splat=16, **base)),
        ("B k16 rank_key", RasterConfig(
            max_tiles_per_splat=16, rank_key_sort=True, **base)),
        ("C k8 tiers(8k x8)(1k x16)", RasterConfig(
            max_tiles_per_splat=8, extra_tiers=((8192, 8), (1024, 16)),
            **base)),
        ("D k8 tiers + rank_key", RasterConfig(
            max_tiles_per_splat=8, extra_tiers=((8192, 8), (1024, 16)),
            rank_key_sort=True, **base)),
        ("E k6 tiers(16k x6)(2k x12)(256 x24) rank", RasterConfig(
            max_tiles_per_splat=6,
            extra_tiers=((16384, 6), (2048, 12), (256, 24)),
            rank_key_sort=True, **base)),
        ("F k8 tiers(8k x8)(1k x16) pack2key", RasterConfig(
            max_tiles_per_splat=8, extra_tiers=((8192, 8), (1024, 16)),
            packed_sort=True, **base)),
    ]
    results = {}
    ref_img = None
    for tag, cfg in configs:
        dt, img = bench_cfg(tag, cfg, cam, args)
        results[tag] = dt
        if ref_img is None:
            ref_img = img
        else:
            diff = float(jnp.max(jnp.abs(img - ref_img)))
            print(f"    max|render - A| = {diff:.3e}", flush=True)


if __name__ == "__main__":
    main()
