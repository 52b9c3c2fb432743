"""Full-scale TriMap stage wall-clock on ONE chip.

Times the COMPLETE stage-1 video generation path at reference scale
(video_inference.py:65-74 contract: 49 frames @ 480x720, 50 denoise
steps, CFG 6) through the REAL `video_inference.build_pipeline` path —
the same construction `python -m langscenex_tpu.video_inference` uses
(zero bf16 weights staged via eval_shape; timing-equivalent, the MXU
does not skip zeros). This wrapper exists to time a SECOND full video
after the first (per-video steady state: with unload_loop_for_decode
the denoise-loop executable is dropped before each decode, so video N+1
pays a loop reload — that cost is part of the honest per-video number).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3500 \
       python experiments/trimap_stage_time.py
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from langscenex_tpu.video_inference import build_pipeline

    t0 = time.perf_counter()
    pipe, text, pcfg, aux = build_pipeline(
        checkpoint=None, t5_path=None, tiny=False, zero_weights=True)
    print(f"pipeline staged in {time.perf_counter() - t0:.1f}s",
          flush=True)

    rng = np.random.default_rng(0)
    first = jnp.asarray(rng.uniform(-1, 1, (1, 3, pcfg.height, pcfg.width)),
                        jnp.float32)
    last = jnp.asarray(rng.uniform(-1, 1, (1, 3, pcfg.height, pcfg.width)),
                       jnp.float32)
    cond = jnp.asarray(text.encode(["a scene"]))
    uncond = jnp.asarray(text.encode([""]))

    t0 = time.perf_counter()
    video = np.asarray(pipe(jax.random.PRNGKey(42), first, last,
                            cond, uncond))
    t_total = time.perf_counter() - t0
    print(f"video 1 (incl all compiles): {t_total:.1f}s", flush=True)

    # per-video steady state: compiled fns cached where possible; the
    # denoise loop reloads (unload_loop_for_decode memory contract)
    t0 = time.perf_counter()
    video = np.asarray(pipe(jax.random.PRNGKey(43), first, last,
                            cond, uncond))
    t_video = time.perf_counter() - t0
    print(f"video 2 (per-video steady state): {t_video:.1f}s "
          f"({t_video / 60:.2f} min)", flush=True)

    from langscenex_tpu.video_inference import save_video_frames
    out = "/tmp/trimap_time_frames"
    t0 = time.perf_counter()
    save_video_frames(video[0], out)
    t_save = time.perf_counter() - t0
    nf = len([f for f in os.listdir(out) if f.endswith(".png")])
    print(f"frame export: {nf} pngs in {t_save:.1f}s", flush=True)

    print(json.dumps({
        "metric": "trimap_video_min",
        "value": round(t_video / 60, 2), "unit": "min/video",
        "first_video_s": round(t_total, 1),
        "three_videos_min": round((t_total + 2 * t_video) / 60, 1),
        "frames": int(video.shape[1])}), flush=True)


if __name__ == "__main__":
    main()
