"""Mean 3-nearest-neighbor squared distance for splat scale initialization.

TPU replacement for simple-knn's distCUDA2 (simple_knn.cu:147-220, used at
scene/gaussian_model.py:277): the CUDA version morton-sorts points into
1024-point boxes and rejects via box bounds; here we morton-sort and scan a
fixed +-window over the sorted order — an approximation whose scale-init
distribution matches (validated statistically, not bitwise; SURVEY.md §7.4).
Pure jnp: sort + gather + small per-row sort, all static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _expand_bits10(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so there are 2 zero bits between each
    (standard morton interleave, 30-bit code)."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton_codes(points: jnp.ndarray, shift: float = 0.0,
                 perm: tuple = (0, 1, 2)) -> jnp.ndarray:
    """[P,3] -> [P] uint32 30-bit morton codes over the bounding box.

    ``shift`` offsets the quantization origin by a fraction of a cell and
    ``perm`` permutes the axis interleave order — used for multi-pass
    decorrelation of morton-boundary artifacts."""
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    q = jnp.clip((points - lo) / jnp.maximum(hi - lo, 1e-12) * 1023.0 + shift,
                 0, 1023)
    q = q.astype(jnp.uint32)
    return (_expand_bits10(q[:, perm[0]])
            | (_expand_bits10(q[:, perm[1]]) << 1)
            | (_expand_bits10(q[:, perm[2]]) << 2))


def _window_top3(points: jnp.ndarray, codes: jnp.ndarray, window: int):
    """3 smallest squared neighbor distances per point (with neighbor ids)
    using a +-window scan over the morton-sorted order. Returns
    (dists [P,3], ids [P,3]) in input point order."""
    P = points.shape[0]
    order = jnp.argsort(codes)
    sorted_pts = points[order]
    offs = jnp.concatenate([jnp.arange(-window, 0), jnp.arange(1, window + 1)])
    idx = jnp.arange(P)[:, None] + offs[None, :]
    valid = (idx >= 0) & (idx < P)
    idx = jnp.clip(idx, 0, P - 1)
    nbrs = sorted_pts[idx]                              # [P, 2W, 3]
    d2 = jnp.sum((nbrs - sorted_pts[:, None]) ** 2, -1)
    d2 = jnp.where(valid, d2, jnp.inf)
    neg_top, pos = jax.lax.top_k(-d2, 3)                # positions into window
    top3 = -neg_top
    nbr_ids = jnp.take_along_axis(order[idx], pos, axis=1)  # original ids
    out_d = jnp.zeros((P, 3), points.dtype).at[order].set(top3)
    out_i = jnp.zeros((P, 3), jnp.int32).at[order].set(nbr_ids.astype(jnp.int32))
    return out_d, out_i


# (cell shift, axis interleave permutation) per pass: different space-filling
# curves put different point pairs adjacent, covering each other's seams.
_PASSES = ((0.0, (0, 1, 2)), (0.5, (0, 1, 2)), (0.0, (2, 0, 1)),
           (0.5, (1, 2, 0)))


def mean_dist3_sq(points: jnp.ndarray, window: int = 16,
                  num_passes: int = 4) -> jnp.ndarray:
    """[P,3] -> [P] mean of squared distances to (approximately) the 3
    nearest neighbors: multi-pass morton-window scan, min-merged."""
    pts = jax.lax.stop_gradient(points)
    cand_d, cand_i = [], []
    for shift, perm in _PASSES[:num_passes]:
        d, i = _window_top3(points, morton_codes(pts, shift, perm), window)
        cand_d.append(d)
        cand_i.append(i)
    alld = jnp.concatenate(cand_d, axis=-1)             # [P, 3*passes]
    alli = jnp.concatenate(cand_i, axis=-1)
    # sort candidates by distance, then drop duplicate neighbor ids (the
    # same neighbor is usually found by several passes)
    srt = jnp.argsort(alld, axis=-1)
    alld = jnp.take_along_axis(alld, srt, -1)
    alli = jnp.take_along_axis(alli, srt, -1)
    C = alld.shape[-1]
    dup = jnp.zeros_like(alld, dtype=bool)
    for j in range(1, C):
        dup = dup.at[:, j].set(jnp.any(alli[:, :j] == alli[:, j:j + 1], -1))
    alld = jnp.where(dup, jnp.inf, alld)
    top3 = -jax.lax.top_k(-alld, 3)[0]
    return jnp.mean(jnp.where(jnp.isfinite(top3), top3, 0.0), -1)
