"""Normal-keyframe producer (stage parity with /root/reference/get_normal.py).

The reference loads StableNormal via ``torch.hub.load("Stable-X/
StableNormal")`` (get_normal.py:18-23) and writes one normal PNG per rgb
keyframe. StableNormal is an external diffusion model only reachable
through torch.hub (no egress here), so this module implements the
DOCUMENTED SUBSTITUTE chosen for the TPU build: normals derived from the
VGGT depth head (the same model that provides stage-4 pose/geometry init),
via cross-products of the unprojected camera-space point grid
(ops/depth_normal.normal_from_depth — the same operator the trainer's
depth-normal consistency loss uses, graphics_utils.py:17-84 semantics).

Geometry-phase impact of the substitution is measured in
tests/test_get_normal.py::test_normal_prior_impact: on a synthetic scene,
training WITH the depth-derived prior reduces rendered-vs-true normal
error vs training without it — i.e. the substitute supplies usable signal
for the ``normal_optim`` loss window (gaussian_field.py:258-282).

Output encoding matches StableNormal's image contract: PNG with
n_rgb = (n + 1) / 2 * 255 in camera space, consumed downstream by
scene/cameras.Camera.load_normal.
"""
from __future__ import annotations

import argparse
import logging
import os

import numpy as np

log = logging.getLogger(__name__)


def generate_normals(base_path: str, params=None, cfg=None,
                     rgb_dir: str = "rgb", out_dir: str = "normal") -> None:
    """For each base_path/rgb_dir/*.png write base_path/out_dir/%04d.png.

    params/cfg: converted VGGT weights (utils/convert.convert_vggt) and
    VGGTConfig; tests drive this with a tiny random VGGT.
    """
    import jax.numpy as jnp
    from PIL import Image

    from .models.vggt import VGGT, VGGTConfig, pose_encoding_to_extri_intri
    from .ops.depth_normal import normal_from_depth

    cfg = cfg or VGGTConfig()
    model = VGGT(cfg)
    if params is None:
        raise ValueError(
            "VGGT weights required for depth-derived normals (convert "
            "facebook/VGGT-1B via utils/convert.convert_vggt)")

    in_dir = os.path.join(base_path, rgb_dir)
    names = sorted(n for n in os.listdir(in_dir)
                   if n.endswith((".png", ".jpg")))
    S = cfg.img_size - cfg.img_size % cfg.patch_size
    imgs, sizes = [], []
    for n in names:
        im = Image.open(os.path.join(in_dir, n)).convert("RGB")
        sizes.append(im.size)
        imgs.append(np.asarray(im.resize((S, S)), np.float32)
                    .transpose(2, 0, 1) / 255.0)
    batch = jnp.asarray(np.stack(imgs))[None]
    out = model.apply(params, batch)
    H, W = batch.shape[-2:]
    _, K = pose_encoding_to_extri_intri(out["pose_enc"][0], (H, W))
    depth = out["depth"][0]

    od = os.path.join(base_path, out_dir)
    os.makedirs(od, exist_ok=True)
    for i, (w0, h0) in enumerate(sizes):
        n = np.asarray(normal_from_depth(jnp.asarray(depth[i]),
                                         jnp.asarray(K[i])))   # [H,W,3] cam
        # StableNormal PNG convention: Camera.load_normal decodes with
        # n = -(2x - 1), so encode x = (1 - n) / 2
        rgb = ((1.0 - np.clip(n, -1, 1)) * 0.5 * 255).astype(np.uint8)
        Image.fromarray(rgb).resize((w0, h0), Image.NEAREST).save(
            os.path.join(od, f"{i + 1:04d}.png"))
    log.info("wrote %d normal keyframes to %s", len(sizes), od)


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--base_path", required=True)
    p.add_argument("--vggt_checkpoint", default=None,
                   help="orbax/npz of converted VGGT params")
    args = p.parse_args(argv)
    params = None
    if args.vggt_checkpoint:
        import orbax.checkpoint as ocp
        params = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.vggt_checkpoint))
    generate_normals(args.base_path, params=params)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
