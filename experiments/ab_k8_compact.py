"""A/B (device): K1=8 + exact fat mid-tiers UNDER compaction.

r4's exact K1=8 config (G) lost to top_k register cost (19 ms) and the
sort-based registers were never re-timed end-to-end; with compaction
the enumeration/cull domain (1.31M vs 1.78M slots) is now a real term.
Run: nohup python experiments/ab_k8_compact.py > /tmp/ab_k8.log 2>&1 &
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _camera, _scene
from langscenex_tpu.ops.rasterize import RasterConfig
from experiments.ab_compact import bench_cfg


def main():
    print("devices:", jax.devices(), flush=True)
    cam = _camera(720, 480)
    args = tuple(map(jnp.asarray, _scene(100_000)))
    a = RasterConfig(tile_w=32, tile_h=32, max_tiles_per_splat=16,
                     chunk=128, max_splats_per_tile=1024, big_splats=64,
                     extra_tiers=((7168, 16), (1536, 32)),
                     rank_key_sort=True, max_pairs=520_000,
                     compact_sort=True, pallas_sort=True)
    c = RasterConfig(tile_w=32, tile_h=32, max_tiles_per_splat=8,
                     chunk=128, max_splats_per_tile=1024, big_splats=64,
                     extra_tiers=((40960, 8), (7168, 16), (1536, 32)),
                     rank_key_sort=True, max_pairs=520_000,
                     compact_sort=True, pallas_sort=True)
    dt_a, out_a = bench_cfg("A: K1=16 (current exact)", a, cam, args)
    dt_c, out_c = bench_cfg("C: K1=8 + (40960,8) mid tier", c, cam, args)
    for name, i in (("color", 0), ("final_T", 3)):
        print(f"  {name}: bit_identical="
              f"{np.array_equal(np.asarray(out_a[i]), np.asarray(out_c[i]))}",
              flush=True)
    print(f"C vs A: {dt_a/dt_c:.3f}x ({dt_a*1e3:.2f} -> {dt_c*1e3:.2f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
