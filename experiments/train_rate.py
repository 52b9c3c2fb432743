"""Real field-training step rates on one chip (200k splats, 720x480),
with and without the max_pairs training knob."""
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from langscenex_tpu.ops.rasterize import RasterConfig
from langscenex_tpu.scene.cameras import Camera, rgb_to_gray
from langscenex_tpu.scene.gaussians import create_from_points
from langscenex_tpu.train.field import GaussianFieldTrainer, phase_flags
from langscenex_tpu.utils.config import OptimizationConfig
from langscenex_tpu.ops.transforms import focal2fov, fov2focal

W, H = 720, 480
P = 200_000


def make_scene():
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-2, 2, P), rng.uniform(-1.5, 1.5, P),
                    rng.uniform(2, 10, P)], -1).astype(np.float32)
    cols = rng.uniform(0, 1, (P, 3)).astype(np.float32)
    cams = []
    fovx = 1.0
    fovy = focal2fov(fov2focal(fovx, W), H)
    for i in range(4):
        ang = (i - 2) * 0.1
        Rz = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                       [-np.sin(ang), 0, np.cos(ang)]])
        C = Rz @ np.array([0, 0, -4.0])
        Rw2c = Rz.T
        T = -Rw2c @ C
        c = Camera(uid=i, colmap_id=i, R=Rw2c.T, T=T, fovx=fovx, fovy=fovy,
                   width=W, height=H, image_name=f"{i:04d}")
        c.image = rng.uniform(0, 1, (3, H, W)).astype(np.float32)
        c.image_gray = rgb_to_gray(c.image)
        c.nearest_id = [(i + 1) % 4]
        cams.append(c)
    return pts, cols, cams


def rate(tr, it, n=20):
    """The step donates its state buffers: always chain through the
    returned state and update tr.state at the end."""
    flags = phase_flags(it, tr.cfg)
    step = tr._get_step(flags)
    batch = tr._camera_batch(0, flags)
    key = jax.random.PRNGKey(0)
    s, _ = step(tr.state, batch, key, sh_degree=0)   # compile + warm
    float(jnp.sum(s.splats.xyz[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        s, m = step(s, batch, key, sh_degree=0)
    float(jnp.sum(s.splats.xyz[0]))                  # true fence (fetch)
    dt = (time.perf_counter() - t0) / n
    tr.state = s
    return 1.0 / dt


def main():
    pts, cols, cams = make_scene()
    for name, mp in (("default", None), ("max_pairs=2M", 2 << 20)):
        rcfg = RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16,
                            chunk=128, max_splats_per_tile=1024,
                            max_pairs=mp)
        splats = create_from_points(pts, cols, capacity=1 << 18)
        cfg = OptimizationConfig(multi_view_sample_num=102_400,
                                 loss_obj_3d=True, grouping_loss=True)
        tr = GaussianFieldTrainer(cams, splats, cfg, scene_extent=4.0,
                                  sh_degree_max=0, rcfg=rcfg)
        for phase_it, label in ((600, "geometry+single+multi"),
                                (100, "geometry"),
                                (2000, "language")):
            r = rate(tr, phase_it)
            print(f"[{name}] {label:24s} {r:6.2f} it/s", flush=True)


if __name__ == "__main__":
    main()
