"""train_rate.py trimmed to the default config (no max_pairs variant)."""
from train_rate import *  # noqa


def main():
    pts, cols, cams = make_scene()
    rcfg = RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16,
                        chunk=128, max_splats_per_tile=1024, max_pairs=None)
    splats = create_from_points(pts, cols, capacity=1 << 18)
    cfg = OptimizationConfig(multi_view_sample_num=102_400,
                             loss_obj_3d=True, grouping_loss=True)
    tr = GaussianFieldTrainer(cams, splats, cfg, scene_extent=4.0,
                              sh_degree_max=0, rcfg=rcfg)
    for phase_it, label in ((600, "geometry+single+multi"),
                            (100, "geometry"),
                            (2000, "language")):
        r = rate(tr, phase_it)
        print(f"[default] {label:24s} {r:6.2f} it/s", flush=True)


if __name__ == "__main__":
    main()
