"""OpenSeg / CLIP language feature extraction bridge.

Parity target: field_construction/preprocessor.py extract_with_openseg
:22-90 — per image, a TF SavedModel produces 768-d per-pixel CLIP-aligned
embeddings which are mask-pooled per segment id (ids from *_s.npy,
enumerated from -1) and L2-normalized into [n_segs, 768] rows.

The TF SavedModel is an external ~2GB artifact; this module gates on its
availability (tensorflow optional) and exposes the same filesystem
contract. The mask pooling itself is a jnp segment-sum usable with any
dense per-pixel feature source (e.g. a flax CLIP/LSeg once ported).
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)


def mask_pool_features(feat: np.ndarray, seg: np.ndarray) -> np.ndarray:
    """[C,H,W] features + [H,W] seg ids -> [n_present, C] L2-normalized
    per-segment means, rows ordered by seg id from -1 upward, absent ids
    skipped (preprocessor.py:79-90)."""
    import jax
    import jax.numpy as jnp
    C = feat.shape[0]
    flat = jnp.asarray(feat.reshape(C, -1).T)          # [HW, C]
    ids = jnp.asarray(seg.reshape(-1).astype(np.int32)) + 1  # 0..max+1
    n = int(seg.max()) + 2
    sums = jax.ops.segment_sum(flat, ids, num_segments=n)
    counts = jax.ops.segment_sum(jnp.ones_like(flat[:, 0]), ids,
                                 num_segments=n)
    means = np.asarray(sums) / np.maximum(np.asarray(counts)[:, None], 1.0)
    present = np.asarray(counts) > 0
    rows = means[present]
    norms = np.linalg.norm(rows, axis=-1, keepdims=True)
    return rows / np.maximum(norms, 1e-12)


class OpenSegExtractor:
    """Runs the OpenSeg TF SavedModel if tensorflow + the model dir are
    available; raises a clear error otherwise."""

    def __init__(self, model_path: str):
        try:
            import tensorflow as tf  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "tensorflow is not available in this environment; provide "
                "precomputed lang_features/*.npy (preprocessor.py contract) "
                "or use a jax feature extractor") from e
        import tensorflow as tf
        self._model = tf.saved_model.load(model_path, tags=["serve"])

    def extract(self, image_bytes: bytes, hw) -> np.ndarray:
        import tensorflow as tf
        res = self._model.signatures["serving_default"](
            inp_image_bytes=tf.convert_to_tensor(image_bytes),
            inp_text_emb=tf.zeros([1, 1, 768]))
        info = res["image_info"]
        crop = (int(info[0, 0] * info[2, 0]), int(info[0, 1] * info[2, 1]))
        feat = res["image_embedding_feat"][:, :crop[0], :crop[1]]
        feat = tf.image.resize(feat, hw, method="nearest")[0]
        return np.asarray(feat, np.float32).transpose(2, 0, 1)


def extract_scene_features(data_path: str, model_path: Optional[str] = None,
                           extractor=None) -> None:
    """Stage-3 head: per input frame, extract features, mask-pool with the
    *_s.npy ids, save lang_features/%04d.npy (preprocessor.py:22-90)."""
    input_dir = os.path.join(data_path, "input")
    seg_dir = os.path.join(data_path, "lang_features_dim3")
    out_dir = os.path.join(data_path, "lang_features")
    os.makedirs(out_dir, exist_ok=True)
    if extractor is None:
        extractor = OpenSegExtractor(model_path)
    names = sorted(n for n in os.listdir(input_dir)
                   if n.endswith((".png", ".jpg")))
    for i, name in enumerate(names):
        seg = np.load(os.path.join(seg_dir, f"{i + 1:04d}_s.npy"))
        if seg.ndim == 3:
            seg = seg[0]
        with open(os.path.join(input_dir, name), "rb") as f:
            img_bytes = f.read()
        feat = extractor.extract(img_bytes, seg.shape)
        pooled = mask_pool_features(feat, seg)
        np.save(os.path.join(out_dir, f"{i + 1:04d}.npy"), pooled)
