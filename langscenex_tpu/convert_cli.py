"""Checkpoint conversion CLI: torch state_dicts -> orbax flax params.

The reference pipeline is glued from pretrained checkpoints
(SURVEY.md hard-parts #4): SAM1 ViT-H (sam_vit_h_4b8939.pth), SAM2
Hiera-L (sam2_hiera_large.pt), VGGT-1B, CogVideoX DiT + 3D VAE, T5-XXL,
LPIPS VGG, the per-scene AE, and (substituted) CLIP ViT-L/14. Each
family's mapper in utils/convert.py is numerically verified against
torch at random init in tests; this CLI is the production entry:

  python -m langscenex_tpu.convert_cli --family sam2 \
      --input sam2_hiera_large.pt --output /ckpts/sam2

Outputs restore with orbax StandardCheckpointer; consumption sites:
  sam1/sam2   -> autoseg.mask_align.build_from_checkpoints (or restore +
                 SAM1/SAM2.apply)
  vggt        -> pose_estimation.estimate_poses_vggt(params=...),
                 get_normal.generate_normals(params=...)
  dit/vae     -> video_inference --checkpoint (a {"dit","vae"} tree —
                 convert each then combine with --merge-into)
  clip        -> pipeline paths.clip_ckpt (direct torch ckpt) or params
  t5          -> models/t5.TextEncoder loads the HF dir directly
"""
from __future__ import annotations

import argparse
import os

import numpy as np

FAMILIES = ("sam1", "sam2", "vggt", "dit", "vae", "lpips", "autoencoder",
            "clip", "clip_text")


def load_state_dict(path: str):
    if path.endswith(".safetensors"):
        from safetensors import safe_open
        sd = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
        return sd
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and all(
            not k.startswith("model") for k in sd if k != "model"):
        sd = sd["model"]
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: np.asarray(v) for k, v in sd.items()}


def convert(family: str, sd):
    from .utils import convert as C
    fn = {
        "sam1": C.convert_sam1,
        "sam2": C.convert_sam2,
        "vggt": C.convert_vggt,
        "dit": C.convert_cogvideox_dit,
        "vae": C.convert_cogvideox_vae,
        "lpips": C.convert_lpips_vgg,
        "autoencoder": C.convert_autoencoder,
        "clip": C.convert_clip_vision,
        "clip_text": C.convert_clip_text,
    }[family]
    return fn(sd)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--family", required=True, choices=FAMILIES)
    p.add_argument("--input", required=True,
                   help=".pt/.pth/.safetensors torch checkpoint")
    p.add_argument("--output", required=True, help="orbax output dir")
    p.add_argument("--merge-into", default=None,
                   help="existing orbax dir: restore, insert this family "
                        "under its key (dit/vae), re-save — builds the "
                        "video_inference {dit,vae} tree")
    args = p.parse_args(argv)

    import orbax.checkpoint as ocp
    params = convert(args.family, load_state_dict(args.input))
    ckptr = ocp.StandardCheckpointer()
    if args.merge_into:
        tree = ckptr.restore(os.path.abspath(args.merge_into))
        tree[args.family] = params
        params = tree
    ckptr.save(os.path.abspath(args.output), params)
    ckptr.wait_until_finished()
    n = sum(x.size for x in __import__("jax").tree_util.tree_leaves(params))
    print(f"converted {args.family}: {n/1e6:.1f}M params -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
