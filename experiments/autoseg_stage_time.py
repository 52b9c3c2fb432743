"""Full-scale auto-seg stage wall-clock on ONE chip.

Drives the REAL MaskAligner code path (autoseg/mask_align.py: keyframe
AMG sweep -> NMS -> SAM2 prompt/track -> stride scan w/ new-object
search -> bidirectional propagation) at reference scale: 49 frames at
1024x1024 through full-size SAM1 ViT-H (modified 4-level AMG,
auto-mask-align.py keyframe loop) and SAM2 Hiera-L video propagation.

Weights are RANDOM device-side inits (proper flax initializers) so the
proposal/NMS/object-count machinery exercises nontrivially; thresholds
are relaxed so a representative object load (up to cfg.max_objects)
survives scoring. Object count is data-dependent in production; the
printed breakdown (per-keyframe AMG sweep, per-frame track rate, object
count) lets any load be projected.

Run: timeout 4000 python experiments/autoseg_stage_time.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from langscenex_tpu.autoseg.mask_align import MaskAligner, MaskAlignConfig
from langscenex_tpu.models.sam1 import (SAM1, SAM1AMGConfig, SAM1Config,
                                        SAM1AutomaticMaskGenerator)
from langscenex_tpu.models.sam2.model import (SAM2, SAM2Config,
                                              SAM2VideoPredictor)

S = 1024
T = 49


def synth_frames(t=T, s=S, n_blob=24):
    """Smoothly-moving colored blobs: parallax-ish, segmentable."""
    rng = np.random.default_rng(0)
    cx = rng.uniform(0.1, 0.9, n_blob)
    cy = rng.uniform(0.1, 0.9, n_blob)
    vx = rng.uniform(-0.002, 0.002, n_blob)
    col = rng.uniform(0.1, 1.0, (n_blob, 3))
    r = rng.uniform(0.03, 0.12, n_blob)
    yy, xx = np.mgrid[0:s, 0:s] / s
    frames = np.zeros((t, 3, s, s), np.float32)
    for i in range(t):
        img = np.full((s, s, 3), 0.05, np.float32)
        for b in range(n_blob):
            g = np.exp(-(((xx - cx[b] - vx[b] * i) ** 2
                          + (yy - cy[b]) ** 2) / (2 * (r[b] / 2) ** 2)))
            img = img * (1 - g[..., None]) + g[..., None] * col[b]
        frames[i] = img.transpose(2, 0, 1)
    return frames


def main():
    t0 = time.perf_counter()
    frames = synth_frames()
    print(f"frames built {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    m1 = SAM1(SAM1Config())
    img = jnp.zeros((1, 3, S, S), jnp.float32)

    def sam1_init(mdl, im):
        feats = mdl.encode_image(im)
        return mdl.decode_points(feats, jnp.zeros((1, 1, 2)),
                                 jnp.ones((1, 1), jnp.int32), True)

    p1 = jax.jit(lambda: m1.init(jax.random.PRNGKey(0), img,
                                 method=sam1_init))()
    amg = SAM1AutomaticMaskGenerator(
        m1, p1, SAM1AMGConfig(pred_iou_thresh=-1e9,
                              stability_score_thresh=-1e9,
                              min_mask_region_area=100))

    from langscenex_tpu.models.sam2.model import init_sam2_params
    m2 = SAM2(SAM2Config(image_size=S))
    p2 = jax.jit(lambda: init_sam2_params(m2, 1))()
    pred = SAM2VideoPredictor(m2, p2)
    print(f"models initialized {time.perf_counter() - t0:.1f}s", flush=True)

    cfg = MaskAlignConfig(postnms_score=-1e9, max_objects=48)
    aligner = MaskAligner(amg, pred, cfg)
    t0 = time.perf_counter()
    seg_maps, colors = aligner.run(frames)
    dt = time.perf_counter() - t0
    n_obj = len(colors)
    print(f"auto-seg stage: {dt:.1f}s ({dt / 60:.2f} min) for {T} frames, "
          f"{n_obj} objects", flush=True)
    print(json.dumps({
        "metric": "autoseg_stage_min", "value": round(dt / 60, 2),
        "unit": "min", "frames": T, "objects": int(n_obj)}), flush=True)


if __name__ == "__main__":
    main()
