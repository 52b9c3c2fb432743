"""auto-seg CLI (parity: auto-seg/auto-mask-align.py:404-426 argparse).

  python -m langscenex_tpu.autoseg \\
      --sam1_checkpoint sam_vit_h_4b8939.pth \\
      --sam2_checkpoint sam2_hiera_large.pt \\
      --video_path demo/rgb --output_dir demo/seg --level default

video_path: directory of frames (or an mp4 when ffmpeg is available).
Writes per-frame *_s.npy id maps, colors.npy (background row 0) and
flat-color keyframe PNGs to output_dir.
"""
from __future__ import annotations

import argparse
import logging
import os

import numpy as np

log = logging.getLogger("autoseg")


def load_frames(path: str, square: int) -> tuple[np.ndarray, tuple]:
    from PIL import Image
    if not os.path.isdir(path):
        import subprocess
        import tempfile
        tmp = tempfile.mkdtemp()
        subprocess.run(["ffmpeg", "-y", "-i", path,
                        os.path.join(tmp, "%04d.png")],
                       check=True, capture_output=True)
        path = tmp
    names = sorted(n for n in os.listdir(path)
                   if n.endswith((".png", ".jpg")))
    raws = [np.asarray(Image.open(os.path.join(path, n)).convert("RGB"))
            for n in names]
    H, W = raws[0].shape[:2]
    frames = np.stack([
        np.asarray(Image.fromarray(r).resize((square, square)), np.float32)
        .transpose(2, 0, 1) / 255.0 for r in raws])
    return frames, (H, W)


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--sam1_checkpoint", required=True)
    p.add_argument("--sam2_checkpoint", required=True)
    p.add_argument("--video_path", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--level", default="default",
                   choices=("default", "small", "middle", "large"))
    p.add_argument("--detect_stride", type=int, default=10)
    p.add_argument("--image_size", type=int, default=1024)
    args = p.parse_args(argv)

    from PIL import Image

    from .mask_align import (MaskAligner, MaskAlignConfig,
                             build_from_checkpoints, save_outputs)

    amg, pred = build_from_checkpoints(
        args.sam1_checkpoint, args.sam2_checkpoint,
        image_size=args.image_size)
    frames, (H, W) = load_frames(args.video_path, args.image_size)
    aligner = MaskAligner(amg, pred, MaskAlignConfig(
        level=args.level, detect_stride=args.detect_stride))
    seg_maps, colors = aligner.run(frames)
    seg_maps = np.stack([
        np.asarray(Image.fromarray(s.astype(np.int32), mode="I")
                   .resize((W, H), Image.NEAREST))
        for s in seg_maps]).astype(np.int32)
    save_outputs(seg_maps, colors, args.output_dir)
    log.info("wrote %d frames, %d objects -> %s",
             len(seg_maps), len(colors), args.output_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
