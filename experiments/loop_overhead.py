"""Real train() LOOP rate vs bare-step rate (the full-schedule run
measured 0.82 it/s while the jitted step rated 4.87 it/s — per-iteration
tiny H2D transfers on the tunneled backend). Uses the train_rate scene.

Run:  cd /root/repo && timeout 590 python experiments/loop_overhead.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

sys.argv = ["loop_overhead"]
from experiments.train_rate import make_scene, P, W, H  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from langscenex_tpu.ops.rasterize import RasterConfig  # noqa: E402
from langscenex_tpu.scene.gaussians import create_from_points  # noqa: E402
from langscenex_tpu.train.field import GaussianFieldTrainer  # noqa: E402
from langscenex_tpu.utils.config import OptimizationConfig  # noqa: E402


def main():
    pts, cols, cams = make_scene()
    rcfg = RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16,
                        chunk=128, max_splats_per_tile=1024,
                        big_splats=2048)    # pre-sized: no growth recompiles
    splats = create_from_points(pts, cols, capacity=1 << 18)
    cfg = OptimizationConfig(multi_view_sample_num=102_400,
                             loss_obj_3d=True, grouping_loss=True)
    tr = GaussianFieldTrainer(cams, splats, cfg, scene_extent=4.0,
                              sh_degree_max=3, rcfg=rcfg)
    times = {}

    def cb(it, state, m):
        times[it] = time.perf_counter()

    # warm through iter 40 (compile + any adaptive growth), measure
    # 41-99; stay below densify_from_iter=500 and the it=100 sh bump
    tr.train(iterations=99, callback=cb)
    dt = (times[99] - times[41]) / 58
    print(f"real-loop geometry rate: {1.0/dt:5.2f} it/s "
          f"({dt*1e3:.0f} ms/it)", flush=True)


if __name__ == "__main__":
    main()
