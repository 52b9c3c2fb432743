"""Real field-training step rates on one chip (200k splats, 720x480) with
the round-2 defaults: 32x32 tiles + exact conic tile-cull, comparing the
trainer's initial 8x-capacity cap against a demand-sized cap (the steady
state _maybe_shrink_pair_cap converges to)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from langscenex_tpu.ops.rasterize import RasterConfig
from langscenex_tpu.scene.gaussians import create_from_points
from langscenex_tpu.train.field import GaussianFieldTrainer, phase_flags
from langscenex_tpu.utils.config import OptimizationConfig

from train_rate import make_scene, rate


def main():
    pts, cols, cams = make_scene()
    # measure culled demand once through the trainer's own metrics
    splats = create_from_points(pts, cols, capacity=1 << 18)
    cfg = OptimizationConfig(multi_view_sample_num=102_400,
                             loss_obj_3d=True, grouping_loss=True)
    tr = GaussianFieldTrainer(cams, splats, cfg, scene_extent=4.0,
                              sh_degree_max=0)
    flags = phase_flags(100, tr.cfg)
    step = tr._get_step(flags)
    batch = tr._camera_batch(0, flags)
    s, m = step(tr.state, batch, jax.random.PRNGKey(0), sh_degree=0)
    tr.state = s
    demand = float(m['num_pairs'])
    print(f"culled pair demand (32x32 defaults): {int(demand)}", flush=True)
    cap = ((int(demand * 1.5) + 127) // 128) * 128

    for name, mp in (("8x-capacity cap", None), (f"sized cap {cap}", cap)):
        rcfg = RasterConfig(max_tiles_per_splat=16, chunk=128,
                            max_splats_per_tile=1024, max_pairs=mp)
        splats = create_from_points(pts, cols, capacity=1 << 18)
        tr = GaussianFieldTrainer(cams, splats, cfg, scene_extent=4.0,
                                  sh_degree_max=0, rcfg=rcfg)
        for phase_it, label in ((600, "geometry+single+multi"),
                                (100, "geometry"),
                                (2000, "language")):
            r = rate(tr, phase_it)
            print(f"[{name}] {label:24s} {r:6.2f} it/s", flush=True)


if __name__ == "__main__":
    main()
