"""Automatic mask generation (SAM1-style grid prompting).

Parity target: the *modified* SAM1 automatic mask generator the reference
vendors (auto-seg/submodules/segment-anything-1/segment_anything/
automatic_mask_generator.py:137-169), which returns FOUR granularity
levels (default, small, medium, large) per grid point instead of one
best mask. Here: a regular point grid is decoded in static-size batches
through the SAM2 mask decoder on no-memory features, producing 4
candidate masks per point (the stability-selected single-mask token + the
3 multimask tokens = small/medium/large), then quality filtering + NMS
per level.

TPU-first: all points decode as one batched jitted program; NMS runs on
the mask IoU matrix via ops/connected.mask_nms (MXU matmul IoUs).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.connected import mask_nms
from .model import SAM2


@dataclasses.dataclass(frozen=True)
class AMGConfig:
    points_per_side: int = 32
    points_per_batch: int = 64
    pred_iou_thresh: float = 0.7
    stability_score_thresh: float = 0.85
    stability_offset: float = 1.0
    nms_iou_thresh: float = 0.9
    min_mask_area: int = 50


def point_grid(n: int) -> np.ndarray:
    """[n*n, 2] normalized (x, y) grid points (amg.build_point_grid)."""
    step = 1.0 / (2 * n)
    xs = np.linspace(step, 1 - step, n)
    gx, gy = np.meshgrid(xs, xs, indexing='xy')
    return np.stack([gx, gy], -1).reshape(-1, 2).astype(np.float32)


def stability_score(logits: jnp.ndarray, offset: float) -> jnp.ndarray:
    """IoU between thresholded masks at +-offset around 0 (amg helper):
    high when the mask is insensitive to the cutoff."""
    hi = jnp.sum(logits > offset, axis=(-2, -1)).astype(jnp.float32)
    lo = jnp.sum(logits > -offset, axis=(-2, -1)).astype(jnp.float32)
    return hi / jnp.maximum(lo, 1.0)


class AutomaticMaskGenerator:
    def __init__(self, model: SAM2, params, cfg: AMGConfig = AMGConfig()):
        self.model = model
        self.params = params
        self.cfg = cfg
        self.image_size = model.cfg.image_size
        self._encode = jax.jit(
            lambda p, im: model.apply(p, im, method=SAM2.forward_image))

        def decode_batch(params, feats, high0, high1, coords):
            B = coords.shape[0]
            featsB = jnp.broadcast_to(feats, (B,) + feats.shape[1:])
            h0 = jnp.broadcast_to(high0, (B,) + high0.shape[1:])
            h1 = jnp.broadcast_to(high1, (B,) + high1.shape[1:])
            nomem = model.apply(params, featsB,
                                method=SAM2.add_no_mem_embed)
            labels = jnp.ones((B, 1), jnp.int32)
            # 3 multimask tokens (small/medium/large of the modified SAM1)
            m3, _, i3, _, _, _, _ = model.apply(
                params, nomem, coords[:, None], labels, None, [h0, h1],
                True, method=SAM2.forward_sam_heads)
            # single-mask token w/ stability fallback = the default level
            m1, _, i1, _, _, _, _ = model.apply(
                params, nomem, coords[:, None], labels, None, [h0, h1],
                False, method=SAM2.forward_sam_heads)
            return (jnp.concatenate([m1, m3], 1),
                    jnp.concatenate([i1, i3], 1))

        self._decode = jax.jit(decode_batch)

    def generate(self, image: np.ndarray) -> Tuple[List[Dict], ...]:
        """image [3,H,W] in [0,1] -> 4 lists of mask dicts
        (default, small, medium, large), each entry
        {segmentation [h,w] bool at low-res (image_size/4), predicted_iou,
        stability_score} — mirroring the (default,s,m,l) tuple contract of
        the modified SAM1 generator."""
        cfg = self.cfg
        out_enc = self._encode(self.params, jnp.asarray(image[None]))
        fpn = out_enc["backbone_fpn"]
        grid = point_grid(cfg.points_per_side) * self.image_size
        levels = [[] for _ in range(4)]
        for s in range(0, grid.shape[0], cfg.points_per_batch):
            pts = jnp.asarray(grid[s:s + cfg.points_per_batch])
            masks, ious = self._decode(self.params, fpn[-1], fpn[0],
                                       fpn[1], pts)
            masks = np.asarray(masks)      # [B, 4, h, w]
            ious = np.asarray(ious)
            stab = np.asarray(stability_score(jnp.asarray(masks),
                                              cfg.stability_offset))
            for lvl in range(4):
                keep = (ious[:, lvl] > cfg.pred_iou_thresh) & \
                       (stab[:, lvl] > cfg.stability_score_thresh)
                for b in np.nonzero(keep)[0]:
                    seg = masks[b, lvl] > 0
                    if seg.sum() < cfg.min_mask_area:
                        continue
                    levels[lvl].append({
                        "segmentation": seg,
                        "predicted_iou": float(ious[b, lvl]),
                        "stability_score": float(stab[b, lvl]),
                    })
        # per-level NMS
        out = []
        for lvl in range(4):
            entries = levels[lvl]
            if not entries:
                out.append([])
                continue
            m = jnp.asarray(np.stack([e["segmentation"] for e in entries]))
            sc = jnp.asarray(np.array([e["predicted_iou"] for e in entries]))
            keep = np.asarray(mask_nms(m, sc, cfg.nms_iou_thresh))
            out.append([e for e, k in zip(entries, keep) if k])
        return tuple(out)
