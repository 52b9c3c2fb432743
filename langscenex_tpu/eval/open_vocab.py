"""Open-vocabulary query + mIoU over rendered language-feature maps.

The LangScene-X paper's eval protocol (SURVEY.md §3.5): eval mode renders
per-view 3-channel language-feature maps + npys
(gaussian_field.py:950-971 — reproduced by train/render_mode.eval_result);
"downstream open-vocab query happens by CLIP-embedding text, encoding
through the AE" — the repository itself ships NO query/metric code, so
this module supplies the missing half of the protocol:

  text --CLIP text tower--> 768-d --scene AE encoder--> 3-d code
  per pixel: cosine(rendered lang3, code)  -> per-query relevancy
  argmax over queries (+ background threshold) -> predicted masks
  predicted vs ground-truth id maps -> per-class IoU, mIoU, localization
  accuracy (the paper's headline metrics).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def embed_queries(texts: Sequence[str], text_encoder, params,
                  tokenizer) -> np.ndarray:
    """texts -> [Q, proj_dim] L2-normalized CLIP text embeddings.

    tokenizer: HF CLIPTokenizer(Fast) or any callable returning
    input_ids; text_encoder: models/clip_dense.CLIPTextEncoder."""
    import jax.numpy as jnp
    batch = tokenizer(list(texts), padding="max_length",
                      max_length=text_encoder.cfg.max_positions,
                      truncation=True, return_tensors="np")
    emb = text_encoder.apply({"params": params},
                             jnp.asarray(batch["input_ids"], jnp.int32))
    emb = np.asarray(emb, np.float32)
    return emb / np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True),
                            1e-12)


def encode_queries_to_lang3(query_emb: np.ndarray, ae_trainer
                            ) -> np.ndarray:
    """[Q, 768] CLIP embeddings -> [Q, 3] scene-AE codes (the same
    compression the per-pixel features went through; L2-normalized by the
    AE encoder)."""
    return ae_trainer.encode(query_emb.astype(np.float32))


def relevancy_maps(lang_map: np.ndarray, query_codes: np.ndarray,
                   min_norm: float = 0.1) -> np.ndarray:
    """lang_map [3,H,W] rendered features + [Q,3] codes -> [Q,H,W]
    cosine relevancy. Pixels whose feature norm is below ``min_norm``
    (uncovered background: alpha-blended features decay toward 0 there,
    and normalizing them amplifies noise into spurious matches) get
    relevancy -1."""
    C, H, W = lang_map.shape
    flat = lang_map.reshape(C, -1)
    norms = np.linalg.norm(flat, axis=0, keepdims=True)
    flat = flat / np.maximum(norms, 1e-12)
    q = query_codes / np.maximum(
        np.linalg.norm(query_codes, axis=-1, keepdims=True), 1e-12)
    rel = q @ flat
    rel = np.where(norms >= min_norm, rel, -1.0)
    return rel.reshape(-1, H, W)


def predict_masks(rel: np.ndarray, threshold: float = 0.5) -> np.ndarray:
    """[Q,H,W] relevancy -> [H,W] predicted query index, -1 where no query
    clears the threshold (background)."""
    best = np.argmax(rel, axis=0)
    top = np.max(rel, axis=0)
    return np.where(top >= threshold, best, -1).astype(np.int32)


def iou_per_query(pred: np.ndarray, gt: np.ndarray, n_queries: int
                  ) -> np.ndarray:
    """[H,W] predicted vs ground-truth query-index maps -> [Q] IoU
    (NaN for queries absent from both)."""
    out = np.full(n_queries, np.nan, np.float64)
    for q in range(n_queries):
        p = pred == q
        g = gt == q
        union = (p | g).sum()
        if union:
            out[q] = (p & g).sum() / union
    return out


def eval_open_vocab(lang_maps: Sequence[np.ndarray],
                    gt_maps: Sequence[np.ndarray],
                    query_codes: np.ndarray,
                    threshold: float = 0.5) -> Dict[str, float]:
    """Per-view rendered lang maps [3,H,W] + ground-truth query-index
    maps [H,W] -> {miou, acc} (acc = localization accuracy: fraction of
    gt-present queries whose argmax-relevancy pixel lands inside the gt
    mask — the paper's second metric)."""
    ious: List[float] = []
    hits = 0
    total = 0
    Q = query_codes.shape[0]
    for lang, gt in zip(lang_maps, gt_maps):
        rel = relevancy_maps(lang, query_codes)
        pred = predict_masks(rel, threshold)
        iou = iou_per_query(pred, gt, Q)
        ious.extend(iou[np.isfinite(iou)].tolist())
        for q in range(Q):
            g = gt == q
            if not g.any():
                continue
            total += 1
            peak = np.unravel_index(np.argmax(rel[q]), rel[q].shape)
            hits += bool(g[peak])
    return {"miou": float(np.mean(ious)) if ious else float("nan"),
            "acc": hits / total if total else float("nan")}
