"""A/B (device): compaction kernel tuning on the exact bench forward.

Round-5 follow-ups to ab_sortengine (12.78 ms): (a) the in-row
partition now sorts by KEY directly (2 streams through the bitonic
instead of 3 — order within the valid prefix is free since the global
sort follows), (b) chunk size 256 rows (half the grid steps / DMA
issues). Run: nohup python experiments/ab_compact2.py > /tmp/ab_compact2.log 2>&1 &
"""
import dataclasses
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _camera, _scene
from langscenex_tpu.ops.rasterize import RasterConfig
from langscenex_tpu.ops import compaction
from experiments.ab_compact import bench_cfg


def main():
    print("devices:", jax.devices(), flush=True)
    P = 100_000
    cam = _camera(720, 480)
    cfg = RasterConfig(tile_w=32, tile_h=32, max_tiles_per_splat=16,
                       chunk=128, max_splats_per_tile=1024,
                       big_splats=64,
                       extra_tiers=((7168, 16), (1536, 32)),
                       rank_key_sort=True, max_pairs=520_000,
                       compact_sort=True, pallas_sort=True)
    args = tuple(map(jnp.asarray, _scene(P)))

    dt_a, out_a = bench_cfg("A: 2-stream partition, CH=128", cfg, cam, args)

    compaction.CH_ROWS = 256
    compaction.OB_ROWS = 256 + 4
    dt_b, out_b = bench_cfg("B: A + CH_ROWS=256", cfg, cam, args)
    compaction.CH_ROWS = 128
    compaction.OB_ROWS = 128 + 4

    for name, i in (("color", 0), ("final_T", 3)):
        a, b = np.asarray(out_a[i]), np.asarray(out_b[i])
        print(f"  {name:10s}: bit_identical={np.array_equal(a, b)}",
              flush=True)
    print(f"B vs A: {dt_a/dt_b:.3f}x  ({dt_a*1e3:.2f} -> {dt_b*1e3:.2f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
