"""LSeg-path feature extractor (the reference's alternate language
branch, field_construction/preprocessor.py:112-138, 229-255).

The reference imports ``cogvideox_interpolation.lseg`` — a module that
does not exist in its tree (the path is import-broken upstream; SURVEY
§2.4). What its call sites pin down: ``extract_features(img)`` returns
[1, 512, H, W] per-pixel CLIP-aligned features from a 640x480 frame
normalized to mean/std 0.5, which a diffusers ``VQModel`` (custom
512->4ch ckpt) compresses to ``lang_features_dim4/*_f.npy``
(preprocessor.py:243-255).

TPU-native reconstruction: LSeg's backbone IS CLIP ViT-L/16 dense
visual features; we reuse the native dense-CLIP machinery
(models/clip_dense.CLIPVisionDense) and add LSeg's output head — a
linear projection of the dense tokens to the 512-d joint text space,
bilinearly upsampled to the input resolution. The head weights ride
the CLIP visual projection when a full LSeg checkpoint is unavailable
(documented substitute, same class as StableNormal/get_normal.py).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .clip_dense import CLIPVisionConfig, CLIPVisionDense


class LSegFeatureExtractor:
    """image [H,W,3] -> [1, 512, H', W'] L2-normalized dense features.

    ``params``: CLIPVisionDense params (incl. the visual projection that
    maps hidden -> 512-d joint space); ``out_hw``: output spatial size
    (the reference feeds 640x480 and the VQ compressor consumes the
    feature map directly, preprocessor.py:243-250)."""

    def __init__(self, params, cfg: CLIPVisionConfig = CLIPVisionConfig(),
                 out_dim: int = 512):
        self.cfg = cfg
        self.out_dim = out_dim
        self.params = params
        self._apply = jax.jit(self._forward)

    @classmethod
    def from_torch_checkpoint(cls, path: str, **kw):
        from ..utils.convert import convert_clip_vision
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
        sd = {k: np.asarray(v) for k, v in sd.items()}
        return cls(convert_clip_vision(sd), **kw)

    def _forward(self, params, pixels):
        # dense patch-grid features projected to the joint space;
        # clip_dense contract: [B,H,W,3] -> (pooled, dense [B,gh,gw,C])
        _, dense = CLIPVisionDense(self.cfg).apply({"params": params},
                                                   pixels)
        d = jnp.transpose(dense, (0, 3, 1, 2))         # [1, C, gh, gw]
        d = d / (jnp.linalg.norm(d, axis=1, keepdims=True) + 1e-8)
        return d

    def extract_features(self, image: np.ndarray,
                         out_hw: Optional[Tuple[int, int]] = None
                         ) -> jnp.ndarray:
        """image: [H,W,3] float in [-1,1] (the reference's 0.5/0.5
        normalization) or uint8; returns [1, out_dim, H', W'] where
        (H', W') = out_hw or the input size."""
        if image.dtype == np.uint8:
            image = image.astype(np.float32) / 255.0
            image = (image - 0.5) / 0.5
        H, W = image.shape[:2]
        out_hw = out_hw or (H, W)
        # backbone needs patch-multiple dims: bilinear to the nearest
        ps = self.cfg.patch_size
        Hp = max(ps, round(H / ps) * ps)
        Wp = max(ps, round(W / ps) * ps)
        pix = jax.image.resize(jnp.asarray(image)[None],
                               (1, Hp, Wp, 3), method="bilinear")
        feats = self._apply(self.params, pix)
        if feats.shape[1] != self.out_dim:
            # project/pad to the 512-d contract when the backbone's
            # joint dim differs (tiny test configs)
            C = feats.shape[1]
            if C > self.out_dim:
                feats = feats[:, :self.out_dim]
            else:
                feats = jnp.pad(feats, ((0, 0), (0, self.out_dim - C),
                                        (0, 0), (0, 0)))
        feats = jax.image.resize(
            feats, (1, self.out_dim) + tuple(out_hw), method="bilinear")
        return feats


def generate_lang_features_with_lseg(data_path: str, lseg, vq_model,
                                     vq_params, resolution=(640, 480)
                                     ) -> int:
    """The reference's LSeg branch (preprocessor.py:229-255): for every
    input frame, resize to ``resolution``, extract LSeg features,
    VQ-encode to the continuous 4-ch latents, save
    ``lang_features_dim4/{name}_f.npy``. Returns the frame count.

    NOTE (parity): the reference's downstream cameras load
    ``lang_features_dim3`` (scene/cameras.py:137-151) — dim4 artifacts
    are produced but unconsumed there too; this port mirrors the
    surface for checkpoint/workflow parity."""
    import os
    from PIL import Image

    imgs = os.path.join(data_path, "input")
    names = sorted(x for x in os.listdir(imgs)
                   if x.endswith(("png", "jpg")))
    save = os.path.join(data_path, "lang_features_dim4")
    os.makedirs(save, exist_ok=True)
    encode = jax.jit(lambda p, x: vq_model.apply(p, x,
                                                 method=vq_model.encode))
    for name in names:
        img = Image.open(os.path.join(imgs, name)).convert("RGB")
        img = img.resize(resolution)
        arr = np.asarray(img, np.uint8)
        feats = lseg.extract_features(arr)             # [1,512,H,W]
        x = jnp.transpose(feats, (0, 2, 3, 1))         # NHWC
        z = encode(vq_params, x)                       # [1,h,w,4]
        z = np.asarray(jnp.transpose(z, (0, 3, 1, 2)))  # [1,4,h,w] (ref layout)
        np.save(os.path.join(save, f"{name.split('.')[0]}_f.npy"), z)
    return len(names)
