"""Piecewise-constant step-function sampling helpers (mip-NeRF style).

Parity target: utils/stepfun.py (402 LoC vendored mip-NeRF helpers; the
pose-eval/trajectory tooling uses searchsorted/sample/invert). Core ops
reimplemented in jnp: searchsorted over sorted boundaries, weighted-CDF
inverse sampling, piecewise-linear resampling.

Deliberately omitted from the reference's 402 LoC (all dead for this
pipeline): the mip-NeRF PDF-blurring/annealing family (blur_stepfun,
anneal weights), histogram losses (lossfun_outer/distortion), and the
max-dilate pooling — none are referenced by utils/utils_poses, the
camera-path generators, or any pipeline stage (verified by grep over the
reference tree; only sample/invert/searchsorted are live).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def searchsorted_pair(t: jnp.ndarray, v: jnp.ndarray):
    """For query v against sorted boundaries t: indices (lo, hi) of the
    surrounding interval per query."""
    idx = jnp.searchsorted(t, v, side='right')
    hi = jnp.clip(idx, 1, t.shape[-1] - 1)
    lo = hi - 1
    return lo, hi


def weights_to_cdf(weights: jnp.ndarray, eps: float = 1e-5):
    """Normalized inclusive CDF with a leading zero: [..., N] -> [..., N+1]."""
    w = weights + eps / weights.shape[-1]
    cdf = jnp.cumsum(w, -1)
    cdf = cdf / cdf[..., -1:]
    return jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)


def sample_intervals(key, t: jnp.ndarray, weights: jnp.ndarray,
                     num_samples: int, stratified: bool = True):
    """Inverse-CDF sample positions from a weighted step function defined
    on boundaries t [N+1] with weights [N]."""
    cdf = weights_to_cdf(weights)
    if stratified:
        u = (jnp.arange(num_samples) + jax.random.uniform(
            key, (num_samples,))) / num_samples
    else:
        u = jnp.linspace(0.0, 1.0 - 1e-6, num_samples)
    lo, hi = searchsorted_pair(cdf, u)
    c0 = cdf[lo]
    c1 = cdf[hi]
    frac = jnp.where(c1 > c0, (u - c0) / jnp.maximum(c1 - c0, 1e-12), 0.0)
    return t[lo] + frac * (t[hi] - t[lo])


def resample(t_new: jnp.ndarray, t_old: jnp.ndarray, w_old: jnp.ndarray):
    """Rebin step-function weights onto new boundaries, conserving mass
    (stepfun.resample semantics via the CDF)."""
    cdf = jnp.concatenate([jnp.zeros(1), jnp.cumsum(w_old)])
    # piecewise-linear interpolation of the CDF at the new boundaries
    idx = jnp.clip(jnp.searchsorted(t_old, t_new, side='right'), 1,
                   t_old.shape[0] - 1)
    t0 = t_old[idx - 1]
    t1 = t_old[idx]
    c0 = cdf[idx - 1]
    c1 = cdf[idx]
    frac = jnp.clip((t_new - t0) / jnp.maximum(t1 - t0, 1e-12), 0, 1)
    cdf_new = c0 + frac * (c1 - c0)
    cdf_new = jnp.where(t_new <= t_old[0], 0.0, cdf_new)
    cdf_new = jnp.where(t_new >= t_old[-1], cdf[-1], cdf_new)
    return jnp.diff(cdf_new)
