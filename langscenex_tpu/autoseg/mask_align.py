"""Temporally consistent instance masks for a video (auto-mask-align).

Parity target: auto-seg/auto-mask-align.py:404-640 — the keyframe
discovery loop: SAM(1) proposes masks on the current keyframe (4
granularity levels), mask-NMS merges them, the surviving masks prompt the
SAM2 video predictor, masks are propagated forward with a stride, and when
the uncovered-area ratio grows beyond 1% a new keyframe is declared and
new objects are prompted (search_new_obj:260-289). A final bidirectional
propagation produces per-frame mask id maps, a distinct-color palette
(colors.npy) and flat-color keyframe PNGs (:553-640).

Host-side orchestration over the jitted SAM programs; all heavy work runs
on device through AutomaticMaskGenerator / SAM2VideoPredictor.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional

import numpy as np

from ..models.sam2.amg import AutomaticMaskGenerator
from ..models.sam2.model import SAM2VideoPredictor


@dataclasses.dataclass
class MaskAlignConfig:
    scan_stride: int = 5
    uncovered_ratio_thresh: float = 0.01
    new_obj_min_area: int = 200
    level: int = 0                # which AMG granularity level to track
    max_objects: int = 64


def uncovered_ratio(masks: Dict[int, np.ndarray], hw) -> float:
    """Fraction of pixels not covered by any tracked object
    (auto-mask-align.py:528-551 scan criterion)."""
    cover = np.zeros(hw, bool)
    for m in masks.values():
        cover |= m
    return 1.0 - cover.mean()


def search_new_objects(amg_masks: List[dict], covered: np.ndarray,
                       min_area: int) -> List[np.ndarray]:
    """Proposals whose area is mostly uncovered (search_new_obj:260-289)."""
    out = []
    for e in amg_masks:
        seg = e["segmentation"]
        new_px = seg & ~covered
        if new_px.sum() >= min_area and new_px.sum() > 0.5 * seg.sum():
            out.append(seg)
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

    def run(self, frames: np.ndarray):
        """frames [T,3,H,W] in [0,1] -> (seg_maps [T,H,W] int32 with -1
        background, colors [n,3] uint8)."""
        cfg = self.cfg
        T, _, H, W = frames.shape
        state = self.predictor.init_state(frames)
        next_obj = 0

        # initial proposals on frame 0
        levels = self.amg.generate(frames[0])
        proposals = levels[cfg.level]
        for e in proposals[:cfg.max_objects]:
            self._add(state, 0, next_obj, e["segmentation"], (H, W))
            next_obj += 1

        # stride scan: propagate, then look for uncovered growth
        t = 0
        while t + cfg.scan_stride < T and next_obj < cfg.max_objects:
            t += cfg.scan_stride
            seg_t = self._propagate_to(state, t, (H, W))
            if uncovered_ratio(seg_t, (H, W)) > cfg.uncovered_ratio_thresh:
                covered = np.zeros((H, W), bool)
                for m in seg_t.values():
                    covered |= m
                lv = self.amg.generate(frames[t])
                for seg in search_new_objects(lv[cfg.level], covered,
                                              cfg.new_obj_min_area):
                    if next_obj >= cfg.max_objects:
                        break
                    self._add(state, t, next_obj, seg, (H, W))
                    next_obj += 1

        # final bidirectional propagation (:553-567)
        per_frame: List[Dict[int, np.ndarray]] = [dict() for _ in range(T)]
        for t_idx, ids, masks in self.predictor.propagate_in_video(state, 0):
            for i, oid in enumerate(ids):
                per_frame[t_idx][oid] = _upsample(masks[i, 0] > 0, (H, W))
        for t_idx, ids, masks in self.predictor.propagate_in_video(
                state, T - 1, reverse=True):
            for i, oid in enumerate(ids):
                if oid not in per_frame[t_idx]:
                    per_frame[t_idx][oid] = _upsample(masks[i, 0] > 0, (H, W))

        n_obj = max(next_obj, 1)
        colors = generate_distinct_colors(n_obj)
        seg_maps = np.full((T, H, W), -1, np.int32)
        for t_idx in range(T):
            for oid, m in sorted(per_frame[t_idx].items()):
                seg_maps[t_idx][m & (seg_maps[t_idx] == -1)] = oid
        return seg_maps, colors

    # ------------------------------------------------------------------
    def _add(self, state, frame, oid, seg, hw):
        self.predictor.add_new_mask(state, frame, oid,
                                    _upsample(seg, hw))

    def _propagate_to(self, state, t, hw) -> Dict[int, np.ndarray]:
        out = {}
        for t_idx, ids, masks in self.predictor.propagate_in_video(state, 0):
            if t_idx == t:
                for i, oid in enumerate(ids):
                    out[oid] = _upsample(masks[i, 0] > 0, hw)
                break
        return out


def _upsample(m: np.ndarray, hw) -> np.ndarray:
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
    np.save(os.path.join(out_dir, "colors.npy"), colors)
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
        Image.fromarray(img).save(os.path.join(out_dir, f"key_{t + 1:04d}.png"))
