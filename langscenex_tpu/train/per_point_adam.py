"""Per-point Adam as an optax gradient transformation.

Parity target: field_construction/scene/per_point_adam.py:5-100 (Adam with
a per-point learning-rate column that self-adjusts by sigmoid of the
gradient magnitude each step: lr_pp *= 0.99 + 0.02*sigmoid(|g|) for points
with nonzero grads) plus the confidence-based initialization
(load_and_prepare_confidence: normalized CUT3R confidences mapped into a
[1/scale_hi, 1/scale_lo]-style lr multiplier range,
gaussian_model.training_setup_pp:344-382).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class PerPointAdamState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates
    per_point_lr: jnp.ndarray     # [P, 1]


def per_point_adam(lr=1e-3, b1: float = 0.9, b2: float = 0.999,
                   eps: float = 1e-8,
                   init_per_point_lr: Optional[jnp.ndarray] = None,
                   adjust: bool = True) -> optax.GradientTransformation:
    """Adam whose effective step is lr * per_point_lr[p] for each point row.
    Leaves must have leading point dim P; per_point_lr broadcasts on it.
    ``lr`` may be a float or a schedule callable(step) (the reference
    drives the xyz group's base lr with the expon schedule while the
    per-point column self-adjusts, gaussian_model.py:374-377)."""

    def init_fn(params):
        mu = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        first = jax.tree_util.tree_leaves(params)[0]
        P = first.shape[0]
        pplr = (init_per_point_lr if init_per_point_lr is not None
                else jnp.ones((P, 1), jnp.float32))
        return PerPointAdamState(count=jnp.zeros((), jnp.int32),
                                 mu=mu, nu=nu, per_point_lr=pplr)

    def update_fn(grads, state, params=None):
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)

        # gradient-magnitude lr adjustment (per_point_adam.py
        # _adjust_per_point_lr): one representative leaf drives the scale
        g0 = jax.tree_util.tree_leaves(grads)[0]
        gmag = jnp.sqrt(jnp.maximum(
            jnp.sum(g0.reshape(g0.shape[0], -1) ** 2, -1), 1e-24))
        nonzero = gmag > 0
        scale = jnp.where(nonzero, 0.99 + 0.02 * jax.nn.sigmoid(gmag), 1.0)
        pplr = state.per_point_lr * scale[:, None] if adjust \
            else state.per_point_lr

        base_lr = lr(count) if callable(lr) else lr

        def upd(m, v):
            mhat = m / bc1
            vhat = v / bc2
            step = mhat / (jnp.sqrt(vhat) + eps)
            broadcast = pplr.reshape((pplr.shape[0],) + (1,) * (step.ndim - 1))
            return -base_lr * broadcast * step

        updates = jax.tree_util.tree_map(upd, mu, nu)
        return updates, PerPointAdamState(count=count, mu=mu, nu=nu,
                                          per_point_lr=pplr)

    return optax.GradientTransformation(init_fn, update_fn)


def confidence_lr(confidence: jnp.ndarray, scale=(2.0, 100.0)) -> jnp.ndarray:
    """CUT3R confidence -> per-point lr multipliers, exactly
    load_and_prepare_confidence (gaussian_field.py:85-107):
    sigmoid-normalize, invert, scale into [min,max] (default (2,100) as
    passed at :131) — low-confidence points get LARGE position lr."""
    inv = 1.0 - jax.nn.sigmoid(confidence)
    lo, hi = scale
    return (inv * (hi - lo) + lo).reshape(-1, 1)
