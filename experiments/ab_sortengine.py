"""A/B (device): Pallas bitonic sort engine on the compacted domain.

After compaction (ab_compact.py: 14.41 -> 13.06 ms) the sort still runs
through lax.sort on the 557k-slot compacted stream. This times the
bitonic engine (ops/sort_engine.py) against it at max_pairs=520,000
(nsort = 2^19; demand is 484k, so still exact and uncapped) and checks
bit-identity of the rendered outputs.

Run: cd /root/repo && nohup python experiments/ab_sortengine.py > /tmp/ab_sortengine.log 2>&1 &
"""
import dataclasses
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
    P = 100_000
    cam = _camera(720, 480)
    base = RasterConfig(tile_w=32, tile_h=32, max_tiles_per_splat=16,
                        chunk=128, max_splats_per_tile=1024,
                        big_splats=64,
                        extra_tiers=((7168, 16), (1536, 32)),
                        rank_key_sort=True, max_pairs=520_000,
                        compact_sort=True)
    args = tuple(map(jnp.asarray, _scene(P)))

    dt_a, out_a = bench_cfg("A: compact + lax.sort (520k)", base, cam, args)
    cfgb = dataclasses.replace(base, pallas_sort=True)
    dt_b, out_b = bench_cfg("B: compact + bitonic engine (2^19)", cfgb,
                            cam, args)

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
