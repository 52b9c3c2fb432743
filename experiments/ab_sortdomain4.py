"""A/B round 4 (device): exact-config candidates at k16/k12 + error label.

Round 3: D2 (k8 + small tiers + rank + cap540k) = 80.1 fps truncating;
exact k8 tiers cost more in register overhead than they save (the fat
tt>8 = 40k tail forces B_max = 40960). This round measures the exact
configs whose registers stay small — K1 at/above the tail knee — and
quantifies D2's truncation error (PSNR vs the exact render) so the
published number pair is honestly labeled.

Run: cd /root/repo && python experiments/ab_sortdomain4.py
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
    print(f"{tag:46s}: {dt*1e3:6.2f} ms  {1/dt:6.1f} fps  "
          f"ovf={bool(out[4])}", flush=True)
    return dt, out[0]


def main():
    cam = _camera(720, 480)
    args = tuple(map(jnp.asarray, _scene(100_000)))
    base = dict(tile_w=32, tile_h=32, chunk=128, max_splats_per_tile=1024,
                max_pairs=540_000)

    configs = [
        ("X k16 tiers(7168 x16)(1536 x32) b64 rank", RasterConfig(
            max_tiles_per_splat=16, big_splats=64,
            extra_tiers=((7168, 16), (1536, 32)),
            rank_key_sort=True, **base)),
        ("Y k12 tiers(14336 x12)(4096 x24) b384 rank", RasterConfig(
            max_tiles_per_splat=12, big_splats=384,
            extra_tiers=((14336, 12), (4096, 24)),
            rank_key_sort=True, **base)),
        ("D2 k8 tiers(8k x8)(1k x16) rank (trunc)", RasterConfig(
            max_tiles_per_splat=8, extra_tiers=((8192, 8), (1024, 16)),
            rank_key_sort=True, **base)),
    ]
    ref = None
    for tag, cfg in configs:
        dt, img = bench_cfg(tag, cfg, cam, args)
        if ref is None:
            ref = img                                # X = exact reference
        else:
            mse = float(jnp.mean((img - ref) ** 2))
            psnr = -10.0 * (jnp.log10(jnp.maximum(mse, 1e-12)))
            print(f"    vs exact: max|d| = "
                  f"{float(jnp.max(jnp.abs(img - ref))):.3e}  "
                  f"PSNR {float(psnr):.1f} dB", flush=True)


if __name__ == "__main__":
    main()
