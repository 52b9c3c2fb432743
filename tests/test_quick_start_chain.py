"""Full-chain smoke test: quick_start.main with --tiny drives every stage
through the real CLI code path (VERDICT item 9) — auto-seg keyframes ->
depth-derived normal keyframes -> 3x TriMap videos -> frame extraction +
seg id maps -> VGGT pose init -> CLIP features + AE -> field construction
-> render -> eval — and asserts the SURVEY §1 filesystem contract."""
import os
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_quick_start_tiny_chain(tmp_path):
    from PIL import Image

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from quick_start import main

    rng = np.random.default_rng(0)
    first = tmp_path / "first.png"
    last = tmp_path / "last.png"
    for p, seed in ((first, 1), (last, 2)):
        img = np.zeros((64, 96, 3), np.uint8)
        # a few colored blobs so AMG/seg have structure
        r = np.random.default_rng(seed)
        for _ in range(4):
            y, x = r.integers(8, 56), r.integers(8, 88)
            c = r.integers(50, 255, 3)
            img[max(y - 8, 0):y + 8, max(x - 10, 0):x + 10] = c
        Image.fromarray(img).save(p)

    dp = tmp_path / "demo"
    rc = main(["--data_path", str(dp),
               "--first_image", str(first),
               "--last_image", str(last),
               "--tiny", "--iterations", "6", "--ae_epochs", "2",
               "--pose_optim_iter", "2", "--render", "--eval"])
    assert rc == 0

    # stage-1 artifacts: seg keyframes + palette (with background row 0),
    # normal keyframes
    colors = np.load(dp / "seg" / "colors.npy")
    assert colors.ndim == 2 and colors.shape[1] == 3
    assert (colors[0] == 0).all()
    assert (dp / "seg" / "0001.png").exists()
    assert (dp / "normal" / "0001.png").exists()
    assert (dp / "colors.npy").exists()

    # stage-2: three TriMap videos
    for kind in ("rgb", "seg", "normal"):
        frames = [f for f in os.listdir(dp / f"trimap_{kind}")
                  if f.endswith(".png")]
        assert len(frames) == 9, kind

    # stage-3 contract dirs (SURVEY §1)
    assert len(os.listdir(dp / "input")) == 9
    segs = [f for f in os.listdir(dp / "lang_features_dim3")
            if f.endswith("_s.npy")]
    feats = [f for f in os.listdir(dp / "lang_features_dim3")
             if f.endswith("_f.npy")]
    assert len(segs) == 9 and len(feats) == 9
    assert len(os.listdir(dp / "camera")) == 9
    assert (dp / "points3D.ply").exists()
    assert len(os.listdir(dp / "lang_features")) == 9

    # stage-4: trained field + render + eval artifacts
    out = dp / "output"
    assert (out / "point_cloud" / "iteration_6" / "point_cloud.ply").exists()
    pose = np.load(out / "pose" / "iter_6" / "pose_optimized.npy")
    assert pose.shape == (9, 4, 4)        # save_pose matrix format
    assert (out / "pose" / "iter_6" / "pose_org.npy").exists()
    assert len(os.listdir(dp / "render_camera")) == 9
    renders = os.listdir(out / "renders" / "iteration_6")
    assert any(f.endswith("_render.png") for f in renders)
    for d in ("renders_rgb", "renders_lang_npy", "renders_instance_npy"):
        assert len(os.listdir(out / "eval" / d)) == 9, d
