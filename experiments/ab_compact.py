"""A/B (device): Pallas stream compaction before the binning sort.

KERNELS.md §14 footnote: the exact config's remaining forward budget is
the 1.78M-slot rank-key sort (~4.9 ms) for <= 540k valid pairs — 70% of
the sort moves sentinels. ops/compaction.py compacts the (key, sid)
streams to the budget domain in ~2 linear passes (sequential-grid
cursor + overlap-write DMA) so the sort runs on 557k slots instead.

This times the full bench forward (entry() exact scene, all channels)
with compact_sort on/off and checks bit-identity of the rendered
outputs on device.

Run: cd /root/repo && nohup python experiments/ab_compact.py > /tmp/ab_compact.log 2>&1 &
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _camera, _scene
from langscenex_tpu.ops.rasterize import RasterConfig, rasterize


def bench_cfg(tag, cfg, cam, args, n=20):
    def fn(means, scales, quats, opac, shs, lang, inst):
        out = rasterize(means, scales, quats, opac, cam,
                        jnp.zeros(3), shs=shs, sh_degree=3,
                        language_feature=lang, instance_feature=inst,
                        cfg=cfg)
        return (out.color, out.language, out.instance, out.final_T,
                out.pairs_overflowed, out.k_overflowed)

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
    kovf = bool(out[5])
    print(f"{tag:34s}: {dt*1e3:6.2f} ms  {1/dt:6.1f} fps  "
          f"pairs_ovf={ovf} k_ovf={kovf}", flush=True)
    return dt, out


def main():
    print("devices:", jax.devices(), flush=True)
    P = 100_000
    cam = _camera(720, 480)
    base = RasterConfig(tile_w=32, tile_h=32, max_tiles_per_splat=16,
                        chunk=128, max_splats_per_tile=1024,
                        big_splats=64,
                        extra_tiers=((7168, 16), (1536, 32)),
                        rank_key_sort=True, max_pairs=540_000)
    args = tuple(map(jnp.asarray, _scene(P)))

    dt_a, out_a = bench_cfg("A: exact rank-key (r4 headline)", base, cam, args)
    cfgc = dataclasses.replace(base, compact_sort=True)
    dt_b, out_b = bench_cfg("B: A + pallas compact_sort", cfgc, cam, args)

    for name, i in (("color", 0), ("language", 1), ("instance", 2),
                    ("final_T", 3)):
        a, b = np.asarray(out_a[i]), np.asarray(out_b[i])
        bit = np.array_equal(a, b)
        mad = float(np.max(np.abs(a - b)))
        print(f"  {name:10s}: bit_identical={bit} max_abs_diff={mad:.3e}",
              flush=True)
    print(f"speedup: {dt_a/dt_b:.3f}x  ({dt_a*1e3:.2f} -> {dt_b*1e3:.2f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
