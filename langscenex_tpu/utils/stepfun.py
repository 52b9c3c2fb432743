"""Step-function (piecewise-constant PDF) toolkit, mip-NeRF family.

Parity target: reference ``utils/stepfun.py`` (402 LoC; the camera-path
generators in ``utils/pose_utils.py:10`` import ``sample``/``sample_np``,
the rest is the standard mip-NeRF 360 histogram toolkit kept for
pose-eval/path tooling). Complete JAX port — every public function of
the reference has a counterpart here, batched over leading dims and
jit-safe. Two deliberate improvements over the reference:

* the reference's torch path is broken as shipped — ``invert_cdf``,
  ``weighted_percentile`` and ``resample`` call ``math.sorted_interp``
  with the ``internal.math`` import commented out (``stepfun.py:1``);
  only its ``*_np`` twins run.  Here :func:`sorted_interp` is provided,
  so every function works (and is differentiable).
* randomness is an explicit PRNG key (``key=None`` gives the
  deterministic linspace path), replacing torch's global RNG.

All functions operate on the last axis; any leading batch dims allowed.
A step function is (``t`` [..., n+1] sorted fenceposts, ``w``/``y``
[..., n] per-bin values).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = float(jnp.finfo(jnp.float32).eps)


def searchsorted(a: jnp.ndarray, v: jnp.ndarray):
    """Bracketing indices of queries ``v`` in sorted fenceposts ``a``.

    Returns ``(idx_lo, idx_hi)`` with ``a[idx_lo] <= v < a[idx_hi]``;
    out-of-range queries get both indices clamped to the first/last
    position (reference ``stepfun.py:6-25`` contract). O(n·m) mask
    formulation — bin counts here are tiny (camera paths), and it
    vectorizes over batch dims without a vmap.
    """
    n = a.shape[-1]
    i = jnp.arange(n)
    ge = v[..., None, :] >= a[..., :, None]          # [..., n, m]
    idx_lo = jnp.max(jnp.where(ge, i[:, None], 0), axis=-2)
    idx_hi = jnp.min(jnp.where(~ge, i[:, None], n - 1), axis=-2)
    return idx_lo, idx_hi


def sorted_interp(x: jnp.ndarray, xp: jnp.ndarray, fp: jnp.ndarray):
    """Batched linear interpolation of ``fp(xp)`` at ``x`` (xp sorted).

    The helper the reference's torch path is missing; equals
    ``np.interp`` per batch row (constant extrapolation outside).
    """
    idx_lo, idx_hi = searchsorted(xp, x)
    xp_lo = jnp.take_along_axis(xp, idx_lo, -1)
    xp_hi = jnp.take_along_axis(xp, idx_hi, -1)
    fp_lo = jnp.take_along_axis(fp, idx_lo, -1)
    fp_hi = jnp.take_along_axis(fp, idx_hi, -1)
    denom = xp_hi - xp_lo
    frac = jnp.clip(jnp.where(denom > 0, (x - xp_lo) /
                              jnp.where(denom > 0, denom, 1.0), 0.0), 0, 1)
    return fp_lo + frac * (fp_hi - fp_lo)


def query(tq: jnp.ndarray, t: jnp.ndarray, y: jnp.ndarray,
          outside_value: float = 0.0):
    """Evaluate the step function (t, y) at locations tq
    (``stepfun.py:28-33``)."""
    idx_lo, idx_hi = searchsorted(t, tq)
    yq = jnp.take_along_axis(y, jnp.minimum(idx_lo, y.shape[-1] - 1), -1)
    return jnp.where(idx_lo == idx_hi, outside_value, yq)


def inner_outer(t0: jnp.ndarray, t1: jnp.ndarray, y1: jnp.ndarray):
    """Inner/outer measures of histogram (t1, y1) on bins t0
    (``stepfun.py:36-49``): outer >= true mass >= inner per t0-bin."""
    cy1 = jnp.concatenate(
        [jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, -1)], -1)
    idx_lo, idx_hi = searchsorted(t1, t0)
    cy1_lo = jnp.take_along_axis(cy1, idx_lo, -1)
    cy1_hi = jnp.take_along_axis(cy1, idx_hi, -1)
    y0_outer = cy1_hi[..., 1:] - cy1_lo[..., :-1]
    y0_inner = jnp.where(idx_hi[..., :-1] <= idx_lo[..., 1:],
                         cy1_lo[..., 1:] - cy1_hi[..., :-1], 0.0)
    return y0_inner, y0_outer


def lossfun_outer(t, w, t_env, w_env):
    """Proposal-envelope loss: penalize nerf mass w exceeding the
    envelope's outer measure (``stepfun.py:52-61``)."""
    _, w_outer = inner_outer(t, t_env, w_env)
    return jnp.maximum(w - w_outer, 0.0) ** 2 / (w + _EPS)


def weight_to_pdf(t, w):
    """Bin weights (sum 1) -> density (integral 1) (``stepfun.py:64-67``)."""
    return w / jnp.maximum(t[..., 1:] - t[..., :-1], _EPS)


def pdf_to_weight(t, p):
    """Density -> bin weights (``stepfun.py:70-72``)."""
    return p * (t[..., 1:] - t[..., :-1])


def max_dilate(t, w, dilation, domain=(-jnp.inf, jnp.inf)):
    """Max-pool a non-negative step function with radius ``dilation``
    (``stepfun.py:75-88``). Returns new (sorted, domain-clipped)
    fenceposts of size 3n+1 and the dilated values between them."""
    lo = t[..., :-1] - dilation
    hi = t[..., 1:] + dilation
    t_d = jnp.sort(jnp.concatenate([t, lo, hi], -1), -1)
    t_d = jnp.clip(t_d, *domain)
    covers = ((lo[..., None, :] <= t_d[..., None])
              & (hi[..., None, :] > t_d[..., None]))      # [..., 3n+1, n]
    w_d = jnp.max(jnp.where(covers, w[..., None, :], 0.0), -1)[..., :-1]
    return t_d, w_d


def max_dilate_weights(t, w, dilation, domain=(-jnp.inf, jnp.inf),
                       renormalize: bool = False):
    """Dilate bin *weights* by max-pooling their density
    (``stepfun.py:91-105``)."""
    p = weight_to_pdf(t, w)
    t_d, p_d = max_dilate(t, p, dilation, domain=domain)
    w_d = pdf_to_weight(t_d, p_d)
    if renormalize:
        w_d = w_d / jnp.maximum(jnp.sum(w_d, -1, keepdims=True), _EPS)
    return t_d, w_d


def integrate_weights(w: jnp.ndarray):
    """CDF fenceposts of weights assumed to sum to 1: exact 0 head and
    1 tail (``stepfun.py:108-128``)."""
    cw = jnp.minimum(1.0, jnp.cumsum(w[..., :-1], -1))
    return jnp.concatenate(
        [jnp.zeros_like(w[..., :1]), cw, jnp.ones_like(w[..., :1])], -1)


def invert_cdf(u: jnp.ndarray, t: jnp.ndarray, w_logits: jnp.ndarray):
    """Inverse-CDF lookup of the step PDF softmax(w_logits) on bins t
    at quantiles u in [0, 1) (``stepfun.py:154-161``)."""
    w = jax.nn.softmax(w_logits, axis=-1)
    cw = integrate_weights(w)
    return sorted_interp(u, cw, t)


def sample(key, t: jnp.ndarray, w_logits: jnp.ndarray, num_samples: int,
           single_jitter: bool = False, deterministic_center: bool = False):
    """Piecewise-constant PDF sampling (``stepfun.py:175-218``).

    ``key=None`` reproduces the reference's ``rand=None`` linspace path
    (optionally bin-centered); otherwise stratified jittered samples with
    an explicit PRNG key (one shared jitter per row if single_jitter).
    """
    if key is None:
        if deterministic_center:
            pad = 1.0 / (2 * num_samples)
            u = jnp.linspace(pad, 1.0 - pad - _EPS, num_samples)
        else:
            u = jnp.linspace(0.0, 1.0 - _EPS, num_samples)
        u = jnp.broadcast_to(u, t.shape[:-1] + (num_samples,))
    else:
        u_max = _EPS + (1.0 - _EPS) / num_samples
        max_jitter = (1.0 - u_max) / (num_samples - 1) - _EPS
        d = 1 if single_jitter else num_samples
        jitter = jax.random.uniform(key, t.shape[:-1] + (d,)) * max_jitter
        u = jnp.linspace(0.0, 1.0 - u_max, num_samples) + jitter
    return invert_cdf(u, t, w_logits)


def sample_intervals(key, t: jnp.ndarray, w_logits: jnp.ndarray,
                     num_samples: int, single_jitter: bool = False,
                     domain=(-jnp.inf, jnp.inf)):
    """Sample *intervals* spanning midpoints of PDF samples
    (``stepfun.py:251-294``); returns num_samples+1 fenceposts."""
    if num_samples <= 1:
        raise ValueError(f'num_samples must be > 1, is {num_samples}.')
    centers = sample(key, t, w_logits, num_samples, single_jitter,
                     deterministic_center=True)
    mid = 0.5 * (centers[..., 1:] + centers[..., :-1])
    minval, maxval = domain
    first = jnp.maximum(2 * centers[..., :1] - mid[..., :1], minval)
    last = jnp.minimum(2 * centers[..., -1:] - mid[..., -1:], maxval)
    return jnp.concatenate([first, mid, last], -1)


def lossfun_distortion(t, w):
    """mip-NeRF 360 distortion: iint w_i w_j |t_i - t_j|
    (``stepfun.py:297-307``)."""
    ut = 0.5 * (t[..., 1:] + t[..., :-1])
    dut = jnp.abs(ut[..., :, None] - ut[..., None, :])
    loss_inter = jnp.sum(w * jnp.sum(w[..., None, :] * dut, -1), -1)
    loss_intra = jnp.sum(w ** 2 * (t[..., 1:] - t[..., :-1]), -1) / 3
    return loss_inter + loss_intra


def interval_distortion(t0_lo, t0_hi, t1_lo, t1_hi):
    """E|x - y| for x~U[t0_lo,t0_hi], y~U[t1_lo,t1_hi]
    (``stepfun.py:310-326``): closed form, branches on overlap."""
    d_disjoint = jnp.abs(0.5 * (t1_lo + t1_hi) - 0.5 * (t0_lo + t0_hi))
    d_overlap = (2 * (jnp.minimum(t0_hi, t1_hi) ** 3
                      - jnp.maximum(t0_lo, t1_lo) ** 3)
                 + 3 * (t1_hi * t0_hi * jnp.abs(t1_hi - t0_hi)
                        + t1_lo * t0_lo * jnp.abs(t1_lo - t0_lo)
                        + t1_hi * t0_lo * (t0_lo - t1_hi)
                        + t1_lo * t0_hi * (t1_lo - t0_hi))) / (
        6 * (t0_hi - t0_lo) * (t1_hi - t1_lo))
    are_disjoint = (t0_lo > t1_hi) | (t1_lo > t0_hi)
    return jnp.where(are_disjoint, d_disjoint, d_overlap)


def weighted_percentile(t, w, ps):
    """Percentiles (ps in [0,100]) of the step CDF
    (``stepfun.py:329-339``)."""
    cw = integrate_weights(w)
    q = jnp.broadcast_to(jnp.asarray(ps, t.dtype) / 100.0,
                         t.shape[:-1] + (len(ps),))
    return sorted_interp(q, cw, t)


def resample(t, tp, vp, use_avg: bool = False):
    """Rebin step values (tp, vp) onto fenceposts t, mass-conserving
    (sum) or width-averaged (``stepfun.py:342-373``)."""
    if use_avg:
        wp = jnp.diff(tp, axis=-1)
        v_numer = resample(t, tp, vp * wp, use_avg=False)
        v_denom = resample(t, tp, wp, use_avg=False)
        return v_numer / jnp.maximum(v_denom, _EPS)
    acc0 = jnp.concatenate(
        [jnp.zeros_like(vp[..., :1]), jnp.cumsum(vp, -1)], -1)
    return jnp.diff(sorted_interp(t, tp, acc0), axis=-1)


def blur_stepfun(x, y, r):
    """Convolve step function (x, y) with a box kernel of radius r
    (``stepfun.py:395-403``): result is piecewise-linear on the union
    of shifted fenceposts; returned as (fenceposts, values-at-posts)."""
    xr, idx = jax.lax.sort_key_val(
        jnp.concatenate([x - r, x + r], -1),
        jnp.broadcast_to(jnp.arange(2 * x.shape[-1]),
                         x.shape[:-1] + (2 * x.shape[-1],)))
    # slope deltas: +dy/2r at each left edge, -dy/2r at each right edge
    dy = (jnp.concatenate([y, jnp.zeros_like(y[..., :1])], -1)
          - jnp.concatenate([jnp.zeros_like(y[..., :1]), y], -1)) / (2 * r)
    slope_delta = jnp.take_along_axis(
        jnp.concatenate([dy, -dy], -1), idx[..., :-1], -1)
    yr = jnp.maximum(0.0, jnp.cumsum(
        (xr[..., 1:] - xr[..., :-1]) * jnp.cumsum(slope_delta, -1), -1))
    return xr, jnp.concatenate([jnp.zeros_like(yr[..., :1]), yr], -1)


# ---------------------------------------------------------------------
# Back-compat aliases for the round-1 subset API.

def searchsorted_pair(t, v):
    """(lo, hi) of the surrounding interval per query, hi = lo+1."""
    idx = jnp.searchsorted(t, v, side='right')
    hi = jnp.clip(idx, 1, t.shape[-1] - 1)
    return hi - 1, hi


def weights_to_cdf(weights: jnp.ndarray, eps: float = 1e-5):
    """Normalized inclusive CDF with a leading zero: [..., N] -> [..., N+1]."""
    w = weights + eps / weights.shape[-1]
    cdf = jnp.cumsum(w, -1)
    cdf = cdf / cdf[..., -1:]
    return jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)
