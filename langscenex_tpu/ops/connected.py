"""Connected components + mask hole/island removal, XLA-native.

Replaces auto-seg/sam2/csrc/connected_components.cu:213 (8-connectivity
union-find on GPU) with iterative min-label propagation: seed every
foreground pixel with its linear index, then repeatedly take the min label
over the 3x3 neighborhood (masked) until fixpoint. Runs as a
lax.while_loop of reduce-window ops — O(diameter) passes, each a fused
VPU pass; fine for the mask sizes SAM2 post-processing handles.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

INF = jnp.int32(2 ** 30)


def connected_components(mask: jnp.ndarray, max_iters: int = 256) -> jnp.ndarray:
    """[H,W] bool -> [H,W] int32 labels (background = -1). Labels are the
    min linear index of each 8-connected component."""
    H, W = mask.shape
    idx = (jnp.arange(H * W, dtype=jnp.int32).reshape(H, W))
    labels = jnp.where(mask, idx, INF)

    def body(state):
        labels, _, it = state
        prev = labels
        nbr = -jax.lax.reduce_window(
            -labels, -INF, jax.lax.max, (3, 3), (1, 1), 'SAME')
        labels = jnp.where(mask, jnp.minimum(labels, nbr), INF)
        return labels, jnp.any(labels != prev), it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.asarray(True), jnp.asarray(0)))
    return jnp.where(mask, labels, -1)


def component_areas(labels: jnp.ndarray) -> jnp.ndarray:
    """[H,W] labels -> [H,W] area of each pixel's component."""
    H, W = labels.shape
    flat = labels.reshape(-1)
    safe = jnp.where(flat < 0, H * W, flat)
    counts = jnp.zeros((H * W + 1,), jnp.int32).at[safe].add(1)
    return jnp.where(flat >= 0, counts[jnp.minimum(safe, H * W)],
                     0).reshape(H, W)


def remove_small_regions(mask: jnp.ndarray, area_thresh: int,
                         mode: str = "holes") -> jnp.ndarray:
    """SAM2's fill-holes / remove-sprinkles postprocess
    (sam2/utils/misc fill_holes_in_mask_scores semantics): 'holes' fills
    background components smaller than area_thresh; 'islands' removes
    foreground components smaller than area_thresh."""
    work = ~mask if mode == "holes" else mask
    labels = connected_components(work)
    areas = component_areas(labels)
    small = work & (areas < area_thresh)
    return mask | small if mode == "holes" else mask & ~small


# ------------------------------------------------------------- mask NMS

def mask_iou_matrix(masks: jnp.ndarray) -> jnp.ndarray:
    """[N,H,W] bool -> [N,N] IoU (MXU matmul over flattened pixels)."""
    f = masks.reshape(masks.shape[0], -1).astype(jnp.float32)
    inter = f @ f.T
    area = jnp.sum(f, -1)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1.0)


def mask_inner_matrix(masks: jnp.ndarray) -> jnp.ndarray:
    """[N,N] 'inner IoU': intersection / area_j (containment of j in i)."""
    f = masks.reshape(masks.shape[0], -1).astype(jnp.float32)
    inter = f @ f.T
    area = jnp.sum(f, -1)
    return inter / jnp.maximum(area[None, :], 1.0)


def mask_nms(masks: jnp.ndarray, scores: jnp.ndarray,
             iou_thresh: float = 0.9, inner_thresh: float = 0.9) -> jnp.ndarray:
    """Greedy mask NMS with IoU + containment suppression
    (auto-seg/auto-mask-align.py mask_nms:50-129 semantics). Returns a
    keep mask [N] bool. Sequential greedy scan (host-size N)."""
    order = jnp.argsort(-scores)
    iou = mask_iou_matrix(masks)[order][:, order]
    inner = mask_inner_matrix(masks)[order][:, order]
    n = masks.shape[0]

    def body(i, keep):
        sup = (iou[i] > iou_thresh) | (inner[i] > inner_thresh)
        sup = sup & (jnp.arange(n) > i)
        return jnp.where(keep[i], keep & ~sup, keep)

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones(n, bool))
    keep = jnp.zeros(n, bool).at[order].set(keep_sorted)
    return keep


def mask_nms_reference(masks: jnp.ndarray, scores: jnp.ndarray,
                       iou_thr: float = 0.7, score_thr: float = 0.1,
                       inner_thr: float = 0.2) -> jnp.ndarray:
    """Faithful port of the reference's proposal NMS
    (auto-seg/auto-mask-align.py mask_nms:50-129): sort by score, suppress
    on (a) IoU with any higher-scored mask, (b) low score, (c) the
    'inner IoU' criterion 1 - (I/area_i)*(I/area_j) gated on
    (I/area_i < 0.5) & (I/area_j >= 0.85) in both triangular directions.
    The chunked torch loops collapse to one MXU matmul here.

    Returns keep [N] bool in the ORIGINAL mask order.
    """
    n = masks.shape[0]
    order = jnp.argsort(-scores)
    s = scores[order]
    f = masks.reshape(n, -1).astype(jnp.float32)[order]
    area = jnp.sum(f, -1)
    inter = f @ f.T
    union = area[:, None] + area[None, :] - inter
    iou = inter / jnp.maximum(union, 1.0)
    row_inter = inter / jnp.maximum(area[:, None], 1.0)
    col_inter = inter / jnp.maximum(area[None, :], 1.0)
    gate = (row_inter < 0.5) & (col_inter >= 0.85)
    inner = jnp.where(gate, 1.0 - row_inter * col_inter, 0.0)

    triu1 = jnp.triu(jnp.ones((n, n), bool), k=1)
    tril1 = jnp.tril(jnp.ones((n, n), bool), k=1)
    iou_max = jnp.max(jnp.where(triu1, iou, 0.0), axis=0)
    inner_max_u = jnp.max(jnp.where(triu1, inner, 0.0), axis=0)
    inner_max_l = jnp.max(jnp.where(tril1, inner, 0.0), axis=0)

    keep = (iou_max <= iou_thr)
    keep_conf = s > score_thr
    keep_u = inner_max_u <= 1 - inner_thr
    keep_l = inner_max_l <= 1 - inner_thr
    # fallback (reference :115-123): never suppress everything on one
    # criterion — keep the top-3 scored masks on that criterion instead
    top3 = jnp.arange(n) < 3

    def fb(k):
        return jnp.where(jnp.any(k), k, top3)
    keep = keep & fb(keep_conf) & fb(keep_u) & fb(keep_l)
    return jnp.zeros(n, bool).at[order].set(keep)
