"""Tiny quick_start chain on the REAL axon backend (VERDICT r2 item 8).

Same flow as tests/test_quick_start_chain.py, but WITHOUT the conftest's
forced-CPU platform: every stage (SAM AMG + video propagation, depth
normals, 3x TriMap diffusion, VGGT pose init, CLIP+AE features, field
construction incl. the Pallas rasterizer, render, eval) compiles and
runs on the TPU in one process — single-run compile coverage for every
kernel family (the device-only bug classes of docs/KERNELS.md §6b).

Run: timeout 4000 python experiments/quickstart_tiny_tpu.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    assert jax.devices()[0].platform != "cpu", "expected the axon TPU"
    print("platform:", jax.devices()[0], flush=True)

    from PIL import Image
    from quick_start import main as qs_main

    root = "/tmp/qs_tiny_tpu"
    import shutil
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    first = os.path.join(root, "first.png")
    last = os.path.join(root, "last.png")
    for p, seed in ((first, 1), (last, 2)):
        img = np.zeros((64, 96, 3), np.uint8)
        r = np.random.default_rng(seed)
        for _ in range(4):
            y, x = r.integers(8, 56), r.integers(8, 88)
            c = r.integers(50, 255, 3)
            img[max(y - 8, 0):y + 8, max(x - 10, 0):x + 10] = c
        Image.fromarray(img).save(p)

    dp = os.path.join(root, "demo")
    t0 = time.perf_counter()
    rc = qs_main(["--data_path", dp,
                  "--first_image", first,
                  "--last_image", last,
                  "--tiny", "--iterations", "6", "--ae_epochs", "2",
                  "--pose_optim_iter", "2", "--render", "--eval"])
    dt = time.perf_counter() - t0
    assert rc == 0

    # SURVEY §1 filesystem contract (same assertions as the CPU test)
    colors = np.load(os.path.join(dp, "seg", "colors.npy"))
    assert colors.ndim == 2 and colors.shape[1] == 3
    assert (colors[0] == 0).all()
    for kind in ("rgb", "seg", "normal"):
        frames = [f for f in os.listdir(os.path.join(dp, f"trimap_{kind}"))
                  if f.endswith(".png")]
        assert len(frames) == 9, kind
    assert len(os.listdir(os.path.join(dp, "input"))) == 9
    ld = os.path.join(dp, "lang_features_dim3")
    assert any(f.endswith("_s.npy") for f in os.listdir(ld))
    assert any(f.endswith("_f.npy") for f in os.listdir(ld))
    assert os.path.exists(os.path.join(dp, "camera", "0001.npz"))
    assert os.path.exists(os.path.join(dp, "points3D.ply"))
    out = os.path.join(dp, "output")
    assert os.path.exists(os.path.join(out, "eval"))
    print(f"ALL FIVE STAGES OK ON {jax.devices()[0]} in {dt:.1f}s "
          f"(incl. every kernel-family compile)", flush=True)


if __name__ == "__main__":
    main()
