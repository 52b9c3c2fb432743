"""ONE continuous full-scale quick_start run on the chip (VERDICT r4
item 3).

The composed end-to-end table (PARITY r4) assembled stages from
separate measurements; this is the single-invocation record: the real
five-stage pipeline at reference scale — 480x720 keyframes, full-size
SAM1 ViT-H + SAM2 Hiera-L auto-seg, full-size VGGT-1B normals + poses,
3x 49-frame 50-step TriMap diffusion (5.57B DiT + tiled VAE decode),
full-size CLIP-dense + 400-epoch AE language lift, 12k-iteration field
construction, render + eval — in one process on the TPU, with
per-stage wall-clock from quick_start's stage_t log line. Checkpoints
are gated by zero egress, so models run with random/zero weights
(--full-random): outputs are meaningless, the WORK is reference-scale.

Budget ~75-95 min of device time.
Run: nohup python experiments/quickstart_full_tpu.py > /tmp/qs_full.log 2>&1 &
"""
import os
import shutil
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

    root = "/tmp/qs_full_tpu"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    # reference-scale keyframes: 480x720 structured color blobs
    rng = np.random.default_rng(0)
    for name, seed in (("first.png", 1), ("last.png", 2)):
        r = np.random.default_rng(seed)
        img = np.zeros((480, 720, 3), np.float32)
        yy, xx = np.mgrid[0:480, 0:720]
        for _ in range(14):
            cy, cx = r.integers(40, 440), r.integers(40, 680)
            rad = r.integers(30, 90)
            col = r.uniform(0.2, 1.0, 3)
            g = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2)
                         / (2 * (rad / 2) ** 2)))
            img = img * (1 - 0.9 * g[..., None]) + 0.9 * g[..., None] * col
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(root, name))

    dp = os.path.join(root, "demo")
    t0 = time.perf_counter()
    rc = qs_main(["--data_path", dp,
                  "--first_image", os.path.join(root, "first.png"),
                  "--last_image", os.path.join(root, "last.png"),
                  "--full-random", "--render", "--eval"])
    dt = time.perf_counter() - t0
    assert rc == 0
    print(f"CONTINUOUS FULL-SCALE RUN OK on {jax.devices()[0]} in "
          f"{dt:.1f}s ({dt/60:.1f} min)", flush=True)


if __name__ == "__main__":
    main()
