"""Decompose the multiview training step (the slowest phase: ~1.1 it/s
at 200k splats vs 4.1 geometry): how much is the 2nd render vs the
geo reprojection vs the 102k x 49 patch-NCC gathers?"""
import time

import jax
import jax.numpy as jnp

import langscenex_tpu.train.multiview as mv
import langscenex_tpu.train.field as field
from langscenex_tpu.scene.gaussians import create_from_points
from langscenex_tpu.train.field import GaussianFieldTrainer
from langscenex_tpu.utils.config import OptimizationConfig
from train_rate import make_scene, rate, RasterConfig


def main():
    pts, cols, cams = make_scene()
    cfg = OptimizationConfig(
        iterations=20000, max_geo_iter=20000,
        single_view_weight_from_iter=30000, multi_view_weight_from_iter=7000,
        lang_loss_start_iter=100000, densify_from_iter=100000,
        optim_pose=False, loss_obj_3d=False, grouping_loss=False)
    rcfg = RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16,
                        chunk=128, max_splats_per_tile=2048)
    splats = create_from_points(pts, cols, capacity=len(pts))
    tr = GaussianFieldTrainer(cams, splats, cfg, scene_extent=4.0,
                              sh_degree_max=0, rcfg=rcfg)
    it_mv = 8000

    orig = mv.multi_view_loss

    print(f"full multiview        {rate(tr, it_mv):6.2f} it/s", flush=True)

    def no_ncc(*a, **k):
        k['compute_ncc'] = False
        return orig(*a, **k)

    mv.multi_view_loss = no_ncc
    field.multi_view_loss = no_ncc
    print(f"minus patch-NCC       {rate(tr, it_mv):6.2f} it/s", flush=True)

    def no_mv(key, plane_depth, *a, **k):
        z = jnp.zeros(())
        # keep a data dependence on both renders' outputs
        z = z + 0.0 * (jnp.sum(plane_depth) + jnp.sum(a[2]))
        return mv.MultiViewOut(geo_loss=z, ncc_loss=z,
                               n_valid=jnp.zeros((), jnp.int32))

    mv.multi_view_loss = no_mv
    field.multi_view_loss = no_mv
    print(f"minus all mv math     {rate(tr, it_mv):6.2f} it/s", flush=True)

    mv.multi_view_loss = orig
    field.multi_view_loss = orig
    print(f"geometry (no mv)      {rate(tr, 500):6.2f} it/s", flush=True)


if __name__ == "__main__":
    main()
