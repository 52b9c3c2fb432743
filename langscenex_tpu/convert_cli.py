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
            "clip", "clip_text", "vq")


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

    def dit(sd):
        # derive the QKV interleave granularity from the model config —
        # a wrong-but-dividing head_dim would silently interleave wrong
        # columns (ADVICE r4)
        from .models.cogvideox.transformer import TransformerConfig
        return C.convert_cogvideox_dit(
            sd, head_dim=TransformerConfig().head_dim)

    fn = {
        "sam1": C.convert_sam1,
        "sam2": C.convert_sam2,
        "vggt": C.convert_vggt,
        "dit": dit,
        "vae": C.convert_cogvideox_vae,
        "lpips": C.convert_lpips_vgg,
        "autoencoder": C.convert_autoencoder,
        "clip": C.convert_clip_vision,
        "clip_text": C.convert_clip_text,
        "vq": C.convert_vq_model,
    }[family]
    return fn(sd)


def expected_shapes(family: str):
    """{tree path: shape} of the family's FULL-SIZE flax init, via
    jax.eval_shape (no memory/compute — pure tracing). The default config
    of every model class is the upstream checkpoint's size (SAM1 ViT-H,
    SAM2 Hiera-L, VGGT-1B, CogVideoX-5b DiT/VAE, CLIP ViT-L/14), so a
    converted tree must match these shapes exactly."""
    import jax
    import jax.numpy as jnp
    key = jax.random.PRNGKey(0)

    if family == "sam1":
        from .models.sam1 import SAM1, SAM1Config
        model = SAM1(SAM1Config())
        S = model.cfg.img_size

        def init_all(mdl, img):
            feats = mdl.encode_image(img)
            coords = jnp.zeros((1, 1, 2))
            labels = jnp.ones((1, 1), jnp.int32)
            return mdl.decode_points(feats, coords, labels, True)

        fn = lambda: SAM1.init(model, key, jnp.zeros((1, 3, S, S)),
                               method=init_all)
    elif family == "sam2":
        from .models.sam2.model import SAM2, init_sam2_params
        model = SAM2()
        fn = lambda: init_sam2_params(model, 0)
    elif family == "vggt":
        from .models.vggt import VGGT
        model = VGGT()
        imgs = jnp.zeros((1, 2, 3, 140, 140))
        qp = jnp.zeros((1, 4, 2))
        fn = lambda: model.init(key, imgs, qp)
    elif family == "dit":
        from .models.cogvideox.transformer import (CogVideoXTransformer,
                                                   TransformerConfig)
        model = CogVideoXTransformer(TransformerConfig())
        fn = lambda: model.init(key, jnp.zeros((1, 2, 32, 4, 6)),
                                jnp.zeros((1, 5, 4096)),
                                jnp.zeros((1,), jnp.int32))
    elif family == "vae":
        from .models.cogvideox.vae import AutoencoderKL3D
        model = AutoencoderKL3D()
        fn = lambda: model.init(key, jnp.zeros((1, 9, 3, 64, 64)))
    elif family == "lpips":
        from .models.lpips import LPIPS
        model = LPIPS()
        z = jnp.zeros((1, 3, 64, 64))
        fn = lambda: model.init(key, z, z)
    elif family == "autoencoder":
        from .models.autoencoder import Autoencoder
        model = Autoencoder()
        fn = lambda: model.init(key, jnp.zeros((1, 768)))
    elif family == "clip":
        from .models.clip_dense import CLIPVisionDense, CLIPVisionConfig
        model = CLIPVisionDense(CLIPVisionConfig())
        fn = lambda: model.init(key, jnp.zeros((1, 224, 224, 3)))
    elif family == "clip_text":
        from .models.clip_dense import CLIPTextEncoder, CLIPTextConfig
        model = CLIPTextEncoder(CLIPTextConfig())
        fn = lambda: model.init(key, jnp.zeros((1, 77), jnp.int32))
    elif family == "vq":
        # the LSeg-branch semantic compressor (preprocessor.py:115-129)
        from .models.vq_model import VQModel
        model = VQModel()
        fn = lambda: model.init(key, jnp.zeros((1, 32, 32, 512)))
    else:  # pragma: no cover
        raise ValueError(family)

    tree = jax.eval_shape(fn)
    return {jax.tree_util.keystr(p): tuple(v.shape) for p, v in
            jax.tree_util.tree_leaves_with_path(tree)}


def verify(family: str, params) -> list:
    """Round-trip the converted tree against the model's init shapes.
    Returns a list of problem strings (empty = verified)."""
    import jax
    got = {jax.tree_util.keystr(p): tuple(getattr(v, "shape", ())) for p, v
           in jax.tree_util.tree_leaves_with_path(params)}
    want = expected_shapes(family)
    problems = []
    for k in sorted(set(want) - set(got)):
        problems.append(f"missing {k} {want[k]}")
    for k in sorted(set(got) - set(want)):
        problems.append(f"extra   {k} {got[k]}")
    for k in sorted(set(got) & set(want)):
        if got[k] != want[k]:
            problems.append(f"shape   {k}: ckpt {got[k]} != init {want[k]}")
    return problems


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--family", required=True, choices=FAMILIES)
    p.add_argument("--input", required=True,
                   help=".pt/.pth/.safetensors torch checkpoint, or an "
                        "orbax dir with --verify-only")
    p.add_argument("--output", default=None, help="orbax output dir")
    p.add_argument("--merge-into", default=None,
                   help="existing orbax dir: restore, insert this family "
                        "under its key (dit/vae), re-save — builds the "
                        "video_inference {dit,vae} tree")
    p.add_argument("--verify", action="store_true",
                   help="after converting, check the tree against the "
                        "full-size model's init shapes (jax.eval_shape)")
    p.add_argument("--verify-only", action="store_true",
                   help="--input is an orbax dir: restore and verify, "
                        "no conversion/save")
    args = p.parse_args(argv)

    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    if args.verify_only:
        params = ckptr.restore(os.path.abspath(args.input))
    else:
        if args.output is None:
            p.error("--output is required unless --verify-only")
        params = convert(args.family, load_state_dict(args.input))

    if args.verify or args.verify_only:
        problems = verify(args.family, params)
        if problems:
            for line in problems[:40]:
                print(f"VERIFY FAIL: {line}")
            print(f"verify: {len(problems)} problems for {args.family}")
            return 1
        n_leaves = len(__import__("jax").tree_util.tree_leaves(params))
        print(f"verify: {args.family} OK ({n_leaves} arrays match the "
              f"full-size init tree)")
        if args.verify_only:
            return 0
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
