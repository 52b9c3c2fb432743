"""A/B the binning config on the full-scale synthetic scene (/tmp/ffs):
step rate + pair-overflow for (K, max_pairs) combinations, geometry and
language phases. Picks the trainer default for reference-scale scenes.

Run after experiments/field_full_schedule.py has built /tmp/ffs.
"""
import sys
import time

import jax
import jax.numpy as jnp

from langscenex_tpu.ops.rasterize import RasterConfig
from langscenex_tpu.scene.dataset_readers import load_scene
from langscenex_tpu.scene.gaussians import create_from_points
from langscenex_tpu.train.field import GaussianFieldTrainer, phase_flags
from langscenex_tpu.utils.config import OptimizationConfig


def rate(tr, it, n=12):
    flags = phase_flags(it, tr.cfg)
    step = tr._get_step(flags)
    batch = tr._camera_batch(0, flags)
    key = jax.random.PRNGKey(0)
    s, m = step(tr.state, batch, key, sh_degree=0)
    float(jnp.sum(s.splats.xyz[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        s, m = step(s, batch, key, sh_degree=0)
    float(jnp.sum(s.splats.xyz[0]))
    dt = (time.perf_counter() - t0) / n
    ovf = float(m.get("pair_overflow", -1))
    tr.state = s
    return 1.0 / dt, ovf


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ffs"
    info = load_scene(root, kind="cut3r")
    cfg = OptimizationConfig()
    for K, mp, label in ((32, None, "K=32 cap=8xcap (trainer default)"),
                         (16, None, "K=16 cap=8xcap"),
                         (16, 8 << 20, "K=16 cap=8M"),
                         (32, 8 << 20, "K=32 cap=8M"),
                         (16, 4 << 20, "K=16 cap=4M")):
        rcfg = RasterConfig(max_tiles_per_splat=K, max_pairs=mp)
        splats = create_from_points(info.points, info.colors, 0)
        tr = GaussianFieldTrainer(info.cameras, splats, cfg,
                                  scene_extent=info.nerf_norm_radius,
                                  sh_degree_max=0, rcfg=rcfg)
        for it, name in ((100, "geometry"), (2000, "language")):
            r, ovf = rate(tr, it)
            print(f"[{label:34s}] {name:9s} {r:5.2f} it/s "
                  f"overflow={ovf:.0f}", flush=True)


if __name__ == "__main__":
    main()
