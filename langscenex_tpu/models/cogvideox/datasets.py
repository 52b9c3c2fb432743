"""Fine-tune datasets for the TriMap diffusion / VAE stages.

Parity target: cogvideox_interpolation/datasets.py — ImageVideoDataset
:21-158 (clip sampler: 49 frames at stride 2 with the 4k+1 frame-count
constraint, first/last-frame conditioning pairs), AutoEncoderDataset:161,
LvisDataset:190. Decord video decoding is replaced by frame directories /
preloaded arrays (decord is not a baked dependency); sampling logic is
preserved.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


def valid_clip_length(n: int) -> int:
    """Largest f <= n with f % 4 == 1 (the VAE's 4k+1 temporal constraint,
    datasets.py:21-158)."""
    return n - ((n - 1) % 4)


@dataclasses.dataclass
class ClipSamplerConfig:
    num_frames: int = 49
    stride: int = 2
    size_hw: Tuple[int, int] = (480, 720)


class VideoClipDataset:
    """Samples (clip [F,3,H,W], first_frame, last_frame) training tuples
    from frame directories."""

    def __init__(self, roots: Sequence[str],
                 cfg: ClipSamplerConfig = ClipSamplerConfig(),
                 seed: int = 0):
        self.cfg = cfg
        self.videos: List[List[str]] = []
        for root in roots:
            frames = sorted(
                os.path.join(root, f) for f in os.listdir(root)
                if f.endswith((".png", ".jpg")))
            need = (self.cfg.num_frames - 1) * self.cfg.stride + 1
            if len(frames) >= need:
                self.videos.append(frames)
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.videos)

    def _load(self, path: str) -> np.ndarray:
        from PIL import Image
        H, W = self.cfg.size_hw
        im = Image.open(path).convert("RGB").resize((W, H))
        return np.asarray(im, np.float32).transpose(2, 0, 1) / 127.5 - 1.0

    def sample(self, idx: Optional[int] = None):
        idx = int(self.rng.integers(len(self.videos))) if idx is None else idx
        frames = self.videos[idx]
        need = (self.cfg.num_frames - 1) * self.cfg.stride + 1
        start = int(self.rng.integers(len(frames) - need + 1))
        sel = frames[start:start + need:self.cfg.stride]
        clip = np.stack([self._load(p) for p in sel])
        return clip, clip[0], clip[-1]

    def __iter__(self) -> Iterator:
        while True:
            yield self.sample()


class AutoEncoderDataset:
    """Short fixed-length clips for VAE training (datasets.py:161):
    num_frames consecutive frames, 4k+1 enforced."""

    def __init__(self, roots: Sequence[str], num_frames: int = 17,
                 size_hw: Tuple[int, int] = (240, 360), seed: int = 0):
        self.inner = VideoClipDataset(
            roots, ClipSamplerConfig(num_frames=valid_clip_length(num_frames),
                                     stride=1, size_hw=size_hw), seed)

    def __len__(self):
        return len(self.inner)

    def sample(self, idx: Optional[int] = None) -> np.ndarray:
        clip, _, _ = self.inner.sample(idx)
        return clip


class ImageFolderDataset:
    """Single-image dataset (LvisDataset:190 analogue): images as
    1-frame 'videos' for image-regularized VAE training."""

    def __init__(self, root: str, size_hw: Tuple[int, int] = (240, 360),
                 seed: int = 0):
        self.paths = sorted(
            os.path.join(root, f) for f in os.listdir(root)
            if f.endswith((".png", ".jpg")))
        self.size_hw = size_hw
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.paths)

    def sample(self, idx: Optional[int] = None) -> np.ndarray:
        from PIL import Image
        idx = int(self.rng.integers(len(self.paths))) if idx is None else idx
        H, W = self.size_hw
        im = Image.open(self.paths[idx]).convert("RGB").resize((W, H))
        arr = np.asarray(im, np.float32).transpose(2, 0, 1) / 127.5 - 1.0
        return arr[None]   # [1,3,H,W] single-frame clip
