"""Optimizers and LR schedules for field construction.

Replaces the reference's three-optimizer dance (splat Adam + cam Adam +
AppModel Adam, gaussian_field.py:537-543) with optax: one multi-group Adam
over the GaussianState pytree with per-leaf learning rates and phase masks,
plus separate small adams for camera poses and exposure.

Parity: per-group lrs from training_setup (gaussian_model.py:303-340,
eps=1e-15), exponential position/pose schedules (get_expon_lr_func,
utils/general_utils.py:32-66 — the standard JaxNeRF log-linear decay).
Phase gating replaces requires_grad flips (change_reqiures_grad
:760-841) with per-group 0/1 update masks chosen statically per phase.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..scene.gaussians import GaussianState
from ..utils.config import OptimizationConfig


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1_000_000):
    """Log-linear lr decay with optional delay ramp (JaxNeRF/Plenoxels)."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    t = jnp.clip(jnp.asarray(step, jnp.float32) / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay_rate = 1.0
    return delay_rate * log_lerp


# Trainable-group masks per phase (change_reqiures_grad semantics).
GEOMETRY_GROUPS = ("xyz", "knn_f", "features_dc", "features_rest",
                   "scaling", "rotation", "opacity")
PHASE_MASKS = {
    # 'semantic': everything except instance (train start,
    # gaussian_field.py:183)
    "semantic": GEOMETRY_GROUPS + ("language_feature",),
    "semantic_only": ("language_feature",),
    "instance": ("instance_feature",),
    "geometry": GEOMETRY_GROUPS,
    "finetune": ("features_dc", "features_rest"),
}


class SplatOptimizer(NamedTuple):
    tx: optax.GradientTransformation
    state: optax.OptState


def group_lrs(cfg: OptimizationConfig, spatial_lr_scale: float):
    """Static per-group lrs (xyz handled by schedule separately)."""
    return {
        "xyz": cfg.position_lr_init * spatial_lr_scale,   # scheduled
        "knn_f": cfg.knn_f_lr,
        "features_dc": cfg.feature_lr,
        "features_rest": cfg.feature_lr / 20.0,
        "opacity": cfg.opacity_lr,
        "scaling": cfg.scaling_lr,
        "rotation": cfg.rotation_lr,
        "language_feature": cfg.language_feature_lr,
        "instance_feature": cfg.instance_feature_lr,
    }


# The differentiated splat parameters (GaussianState minus the bool alive
# mask), handled as a flat dict so jax.grad and optax see only float leaves.
PARAM_FIELDS = ("xyz", "knn_f", "features_dc", "features_rest", "scaling",
                "rotation", "opacity", "language_feature", "instance_feature")


def splat_params(state: GaussianState) -> dict:
    return {f: getattr(state, f) for f in PARAM_FIELDS}


def make_splat_optimizer(cfg: OptimizationConfig,
                         spatial_lr_scale: float,
                         confidence_lr: 'jnp.ndarray | None' = None
                         ) -> optax.GradientTransformation:
    """Adam(eps=1e-15) with per-group lr over the splat param dict; xyz
    follows the exponential schedule. Every group is always an adam so the
    optimizer state structure is phase-independent; phase freezing is
    applied by zeroing gradients with ``phase_grad_mask`` before the update
    (torch freezes moments too — groups here are only ever frozen
    permanently by the schedule, so decayed moments are never consumed)."""
    lrs = group_lrs(cfg, spatial_lr_scale)

    def make_group(name):
        if name == "xyz":
            sched = lambda step: expon_lr(
                step, cfg.position_lr_init * spatial_lr_scale,
                cfg.position_lr_final * spatial_lr_scale,
                lr_delay_mult=cfg.position_lr_delay_mult,
                max_steps=cfg.position_lr_max_steps)
            if cfg.pp_optimizer:
                # training_setup_pp (gaussian_model.py:344-382): the xyz
                # group runs PerPointAdam with an optional CUT3R
                # confidence-derived per-point lr column
                from .per_point_adam import per_point_adam
                return per_point_adam(lr=sched, eps=1e-15,
                                      init_per_point_lr=confidence_lr)
            return optax.adam(sched, eps=1e-15)
        return optax.adam(lrs[name], eps=1e-15)

    transforms = {name: make_group(name) for name in PARAM_FIELDS}
    return optax.multi_transform(
        transforms, lambda params: {f: f for f in params})


def phase_grad_mask(phase: str, grads: dict) -> dict:
    """Zero the gradients of groups frozen in ``phase``
    (change_reqiures_grad semantics)."""
    active = set(PHASE_MASKS[phase])
    return {name: (g if name in active else jnp.zeros_like(g))
            for name, g in grads.items()}


def make_pose_optimizer(cfg: OptimizationConfig) -> optax.GradientTransformation:
    """Camera pose Adam with the cam scheduler (gaussian_model.py:331-340):
    rotation_lr*0.1 -> rotation_lr*0.001 over cfg.iterations."""
    sched = lambda step: expon_lr(
        step, cfg.rotation_lr * 0.1, cfg.rotation_lr * 0.001,
        lr_delay_mult=cfg.position_lr_delay_mult, max_steps=cfg.iterations)
    return optax.adam(sched, eps=1e-15)


def make_app_optimizer() -> optax.GradientTransformation:
    """Exposure affine optimizer (scene/app_model.py:16-18)."""
    return optax.adam(0.001, b1=0.9, b2=0.99)


def zero_moments_at(opt_state, slot_mask: jnp.ndarray):
    """Reset Adam moments at slots where ``slot_mask`` is True — the
    fixed-capacity analogue of the reference's cat_tensors_to_optimizer
    zero-extension (gaussian_model.py:561-581). Works on any optax state
    pytree whose leaves lead with the capacity axis. PerPointAdam's lr
    column resets to the NEUTRAL 1.0 (a zero lr would freeze new slots
    forever)."""
    from .per_point_adam import PerPointAdamState
    cap = slot_mask.shape[0]

    def reset(leaf, fill=0.0):
        if hasattr(leaf, 'shape') and leaf.ndim >= 1 and leaf.shape[0] == cap:
            m = slot_mask.reshape((cap,) + (1,) * (leaf.ndim - 1))
            return jnp.where(m, jnp.full_like(leaf, fill), leaf)
        return leaf

    def walk(node):
        if isinstance(node, PerPointAdamState):
            return PerPointAdamState(
                count=node.count,
                mu=jax.tree_util.tree_map(reset, node.mu),
                nu=jax.tree_util.tree_map(reset, node.nu),
                per_point_lr=reset(node.per_point_lr, fill=1.0))
        if isinstance(node, tuple) and hasattr(node, '_fields'):
            return type(node)(*[walk(c) for c in node])
        if isinstance(node, tuple):
            return tuple(walk(c) for c in node)
        if isinstance(node, list):
            return [walk(c) for c in node]
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return reset(node)

    return walk(opt_state)
