"""Temporally consistent instance masks for a video (auto-mask-align).

Parity target: auto-seg/auto-mask-align.py:404-551 — the keyframe
discovery loop: SAM proposes masks on the current keyframe at a chosen
granularity level, post-NMS (mask_nms :50-129 with iou 0.8 / score 0.7 /
inner 0.5) prunes them, survivors prompt the SAM2 video predictor, masks
propagate over the whole video ONCE per keyframe, and a strided scan over
the cached segments looks for frames whose uncovered-area ratio exceeds
the (dynamic) keyframe baseline + 1%. At a new keyframe every live object
is re-prompted with its propagated mask (:514-517) and genuinely new
regions become new objects (search_new_obj :260-289). A final
bidirectional propagation produces per-frame mask id maps, a
distinct-color palette (colors.npy :591-611) and flat-color keyframe PNGs
(:616-640).

Host-side orchestration over the jitted SAM programs; all heavy work runs
on device through AutomaticMaskGenerator / SAM2VideoPredictor.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..models.sam2.amg import AutomaticMaskGenerator
from ..models.sam2.model import SAM2VideoPredictor
from ..ops.connected import mask_nms_reference

LEVELS = {"default": 0, "small": 1, "middle": 2, "large": 3}


@dataclasses.dataclass
class MaskAlignConfig:
    detect_stride: int = 10       # scan stride (auto-mask-align.py:412)
    uncovered_margin: float = 0.01  # growth over the keyframe baseline
    new_obj_ratio: float = 0.5    # uncovered fraction of a new proposal
    new_obj_min_area: int = 5000  # area_threash (:260)
    level: str = "default"        # which AMG granularity level to track
    postnms: bool = True
    postnms_iou: float = 0.8      # (:496)
    postnms_score: float = 0.7
    postnms_inner: float = 0.5
    max_objects: int = 64


def nms_proposals(entries: List[dict], iou_thr: float, score_thr: float,
                  inner_thr: float) -> List[dict]:
    """masks_update (:140-166): score = stability * predicted_iou, then the
    reference mask_nms."""
    if not entries:
        return entries
    segs = jnp.asarray(np.stack([e["segmentation"] for e in entries]))
    scores = jnp.asarray(np.array(
        [e["stability_score"] * e["predicted_iou"] for e in entries],
        np.float32))
    keep = np.asarray(mask_nms_reference(segs, scores, iou_thr, score_thr,
                                         inner_thr))
    return [e for e, k in zip(entries, keep) if k]


def no_mask_area_ratio(masks: List[np.ndarray]) -> float:
    """Fraction of pixels not covered by any mask
    (cal_no_mask_area_ratio :306-312)."""
    if not masks:
        return 1.0
    cover = np.zeros_like(masks[0], bool)
    for m in masks:
        cover |= m
    return float(1.0 - cover.mean())


def search_new_objects(prev_masks: List[np.ndarray], proposals: List[dict],
                       ratio: float, min_area: int) -> List[np.ndarray]:
    """Proposals that are mostly uncovered by tracked objects
    (search_new_obj :260-289), progressively claiming the gap."""
    mask_none = np.ones_like(prev_masks[0], bool) if prev_masks else None
    for m in prev_masks:
        mask_none &= ~m
    out = []
    for e in proposals:
        seg = e["segmentation"]
        area = seg.sum()
        if area > min_area and mask_none is not None and \
                (mask_none & seg).sum() / max(area, 1) > ratio:
            out.append(seg)
            mask_none &= ~seg
    return out


def generate_distinct_colors(n: int, seed: int = 0) -> np.ndarray:
    """[n,3] uint8 maximally-spread palette (generate_random_colors
    :591-611 — reference samples random distinct colors; we stride hue
    space deterministically for reproducibility)."""
    import colorsys
    rng = np.random.default_rng(seed)
    cols = []
    for i in range(n):
        h = (i * 0.61803398875) % 1.0
        s = 0.6 + 0.4 * float(rng.uniform())
        v = 0.7 + 0.3 * float(rng.uniform())
        cols.append([int(255 * c) for c in colorsys.hsv_to_rgb(h, s, v)])
    return np.array(cols, np.uint8)


class MaskAligner:
    def __init__(self, amg: AutomaticMaskGenerator,
                 predictor: SAM2VideoPredictor,
                 cfg: MaskAlignConfig = MaskAlignConfig()):
        self.amg = amg
        self.predictor = predictor
        self.cfg = cfg

    # -------------------------------------------------------------- main
    def run(self, frames: np.ndarray):
        """frames [T,3,H,W] in [0,1] -> (seg_maps [T,H,W] int32 with -1
        background, colors [n,3] uint8)."""
        cfg = self.cfg
        T, _, H, W = frames.shape
        lvl = LEVELS.get(cfg.level, 0)
        state = self.predictor.init_state(frames)
        next_obj = 0
        now_frame = 0
        segments: Optional[List[Dict[int, np.ndarray]]] = None

        while True:
            levels = self.amg.generate(frames[now_frame])
            proposals = levels[lvl]
            if cfg.postnms:
                proposals = nms_proposals(proposals, cfg.postnms_iou,
                                          cfg.postnms_score,
                                          cfg.postnms_inner)
            added = 0
            if now_frame == 0:
                for e in proposals[:cfg.max_objects]:
                    self._add(state, 0, next_obj, e["segmentation"], (H, W))
                    next_obj += 1
                    added += 1
            else:
                # re-prompt every live object with its propagated mask
                # (:514-517), then add genuinely new regions
                prev = segments[now_frame]
                for oid, m in sorted(prev.items()):
                    if m.sum() == 0:
                        continue
                    self._add(state, now_frame, oid, m, (H, W))
                # proposals are low-res (image_size/4); compare at frame res
                new_masks = search_new_objects(
                    [m for _, m in sorted(prev.items())],
                    [dict(e, segmentation=_resize(
                        e["segmentation"], (H, W)) > 0)
                     for e in proposals],
                    cfg.new_obj_ratio, cfg.new_obj_min_area)
                for seg in new_masks:
                    if next_obj >= cfg.max_objects:
                        break
                    self._add(state, now_frame, next_obj, seg, (H, W))
                    next_obj += 1
                    added += 1

            if now_frame == 0 or added:
                segments = self._propagate_all(state, T, (H, W))

            # strided scan over the CACHED segments (:528-551): the
            # baseline ratio is re-anchored at the current keyframe
            baseline = None
            next_key = -1
            for t in range(0, T, cfg.detect_stride):
                if t < now_frame:
                    continue
                ratio = no_mask_area_ratio(list(segments[t].values()))
                if t == now_frame:
                    baseline = ratio
                elif baseline is not None and \
                        ratio > baseline + cfg.uncovered_margin:
                    next_key = t
                    break
            if next_key < 0 or next_obj >= cfg.max_objects:
                break
            now_frame = next_key

        # final bidirectional propagation (:553-567)
        per_frame = self._propagate_all(state, T, (H, W), final=True)

        n_obj = max(next_obj, 1)
        colors = generate_distinct_colors(n_obj)
        seg_maps = np.full((T, H, W), -1, np.int32)
        for t_idx in range(T):
            for oid, m in sorted(per_frame[t_idx].items()):
                seg_maps[t_idx][m & (seg_maps[t_idx] == -1)] = oid
        return seg_maps, colors

    # ------------------------------------------------------------------
    def _add(self, state, frame, oid, seg, hw):
        self.predictor.add_new_mask(state, frame, oid, _resize(seg, hw))

    def _propagate_all(self, state, T, hw,
                       final: bool = False) -> List[Dict[int, np.ndarray]]:
        """One full propagation pass; returns per-frame {obj: mask} at
        image resolution. ``final`` adds the reverse pass (:553-567)."""
        per_frame: List[Dict[int, np.ndarray]] = [dict() for _ in range(T)]
        for t_idx, ids, masks in self.predictor.propagate_in_video(state, 0):
            for i, oid in enumerate(ids):
                per_frame[t_idx][oid] = _resize(masks[i, 0] > 0, hw)
        if final:
            for t_idx, ids, masks in self.predictor.propagate_in_video(
                    state, T - 1, reverse=True):
                for i, oid in enumerate(ids):
                    if oid not in per_frame[t_idx]:
                        per_frame[t_idx][oid] = _resize(masks[i, 0] > 0, hw)
        return per_frame


def _resize(m: np.ndarray, hw) -> np.ndarray:
    H, W = hw
    if m.shape == (H, W):
        return m
    ys = (np.arange(H) * m.shape[0]) // H
    xs = (np.arange(W) * m.shape[1]) // W
    return m[ys][:, xs]


def save_outputs(seg_maps: np.ndarray, colors: np.ndarray, out_dir: str,
                 keyframes=(0, -1)) -> None:
    """Write the stage-2 filesystem contract: per-frame ``*_s.npy`` id
    maps, ``colors.npy``, and flat-color keyframe PNGs
    (auto-mask-align.py:616-640)."""
    os.makedirs(out_dir, exist_ok=True)
    # palette row 0 = black background, object oid -> row oid+1
    # (post_colors = [(0,0,0)] + colors, auto-mask-align.py:609-611; the
    # video preprocessor's nearest-color id map subtracts 1 to recover -1
    # as background)
    np.save(os.path.join(out_dir, "colors.npy"),
            np.concatenate([np.zeros((1, 3), colors.dtype), colors], 0))
    T = seg_maps.shape[0]
    for t in range(T):
        np.save(os.path.join(out_dir, f"{t + 1:04d}_s.npy"), seg_maps[t])
    from PIL import Image
    for k in keyframes:
        t = k % T
        seg = seg_maps[t]
        img = np.zeros(seg.shape + (3,), np.uint8)
        for oid in np.unique(seg):
            if oid < 0:
                continue
            img[seg == oid] = colors[oid % len(colors)]
        Image.fromarray(img).save(
            os.path.join(out_dir, f"key_{t + 1:04d}.png"))


def build_from_checkpoints(sam1_ckpt: str, sam2_ckpt: str,
                           amg_cfg=None, image_size: int = 1024):
    """Assemble the production proposal+tracking stack from the two torch
    checkpoints the reference downloads (quick_start.sh:6-7:
    sam_vit_h_4b8939.pth + sam2_hiera_large.pt), through the verified
    converters. Returns (SAM1AutomaticMaskGenerator, SAM2VideoPredictor).
    """
    import torch

    from ..models.sam1 import (SAM1, SAM1AMGConfig, SAM1Config,
                               SAM1AutomaticMaskGenerator)
    from ..models.sam2.model import SAM2, SAM2Config, SAM2VideoPredictor
    from ..utils.convert import convert_sam1, convert_sam2

    sd1 = torch.load(sam1_ckpt, map_location="cpu", weights_only=True)
    sd1 = {k: np.asarray(v) for k, v in sd1.items()}
    m1 = SAM1(SAM1Config())
    amg = SAM1AutomaticMaskGenerator(m1, convert_sam1(sd1),
                                     amg_cfg or SAM1AMGConfig())

    sd2 = torch.load(sam2_ckpt, map_location="cpu", weights_only=True)
    if "model" in sd2:
        sd2 = sd2["model"]
    sd2 = {k: np.asarray(v) for k, v in sd2.items()}
    m2 = SAM2(SAM2Config(image_size=image_size))
    pred = SAM2VideoPredictor(m2, convert_sam2(sd2))
    return amg, pred
