"""Densification (clone / split / prune) under the fixed-capacity + alive
mask discipline.

Parity target: gaussian_model.densify_and_prune / _split / _clone
(:612-718). Semantic mapping to fixed capacity:
  - clone: source slot untouched; one sampled copy written to a free slot
    (reference samples the clone position from N(xyz, Sigma), :685-698)
  - split (N=2): source slot overwritten with sample #1 at reduced scale,
    sample #2 written to a free slot; equivalent to the reference's
    "2 new + prune original" (:612-662)
  - prune: alive mask cleared (:700-718)
  - budget: the reference's max_all_points quantile capping (:621-628,
    :688-693) plus our capacity bound (free slots) applied the same way
  - Adam moments are zeroed at every written slot, matching the
    zero-extension in cat_tensors_to_optimizer (:561-581)

All shapes are static — the function can run jitted; only the decision to
grow capacity (train/field.py) happens host-side.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.quat import quat_to_rotmat, quat_normalize
from ..scene.gaussians import GaussianState, DensifyStats, inverse_sigmoid
from ..utils.config import OptimizationConfig


class DensifyResult(NamedTuple):
    state: GaussianState
    stats: DensifyStats
    written_slots: jnp.ndarray   # [CAP] bool — slots whose moments must reset
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray


def _cap_by_quantile(score: jnp.ndarray, mask: jnp.ndarray, budget: jnp.ndarray,
                     n_ref: jnp.ndarray) -> jnp.ndarray:
    """Reference-style budget capping: if selected > budget, keep only
    scores above the (1 - budget/n_ref) quantile (gaussian_model.py:621-628).
    score entries outside ``mask`` are zeroed first."""
    masked = jnp.where(mask, score, 0.0)
    need_cap = jnp.sum(mask) > budget
    ratio = jnp.clip(budget.astype(jnp.float32) / jnp.maximum(n_ref.astype(jnp.float32), 1.0), 0.0, 1.0)
    thresh = jnp.quantile(masked, 1.0 - ratio)
    capped = masked > thresh
    return jnp.where(need_cap, capped, mask)


def densify_and_prune(key: jax.Array, state: GaussianState, stats: DensifyStats,
                      cfg: OptimizationConfig, scene_extent: float,
                      size_threshold: float | None) -> DensifyResult:
    cap = state.capacity
    alive = state.alive
    n_alive = jnp.sum(alive)

    grads = jnp.where(stats.denom > 0, stats.xyz_gradient_accum / stats.denom, 0.0)
    grads_abs = jnp.where(stats.denom_abs > 0,
                          stats.xyz_gradient_accum_abs / stats.denom_abs, 0.0)
    grads = jnp.where(alive, grads, 0.0)
    grads_abs = jnp.where(alive, grads_abs, 0.0)

    scales = state.get_scaling()
    max_scale = jnp.max(scales, axis=-1)
    pd_ext = cfg.percent_dense * scene_extent

    budget_total = jnp.minimum(
        jnp.asarray(cfg.max_all_points, jnp.int32) - n_alive,
        jnp.asarray(cap, jnp.int32) - n_alive)

    # ---- clone selection (densify_and_clone :664-698)
    clone_mask = alive & (grads >= cfg.densify_grad_threshold) & (max_scale <= pd_ext)
    clone_mask = _cap_by_quantile(grads, clone_mask, budget_total, n_alive)

    # ---- split selection (densify_and_split :612-640)
    split_base = alive & (grads >= cfg.densify_grad_threshold) & (max_scale > pd_ext)
    split_mask = _cap_by_quantile(grads, split_base,
                                  budget_total - jnp.sum(clone_mask), n_alive)
    # abs-grad auxiliary split (:630-640); with the shipped config
    # max_abs_split_points=0 this adds nothing, kept for parity
    if cfg.max_abs_split_points > 0:
        abs_ok = (alive & ~split_mask & (max_scale > pd_ext)
                  & (stats.max_radii2D > cfg.abs_split_radii2D_threshold)
                  & (grads_abs >= cfg.densify_abs_grad_threshold))
        abs_budget = jnp.minimum(
            budget_total - jnp.sum(clone_mask) - jnp.sum(split_mask),
            jnp.asarray(cfg.max_abs_split_points, jnp.int32))
        abs_mask = _cap_by_quantile(grads_abs, abs_ok, abs_budget, n_alive)
        split_mask = split_mask | abs_mask

    new_mask = clone_mask | split_mask                 # each needs 1 free slot

    # ---- allocate free slots: dead slots in index order
    dead_order = jnp.argsort(alive.astype(jnp.int32), stable=True)  # dead first
    n_dead = cap - n_alive
    rank = jnp.cumsum(new_mask.astype(jnp.int32)) - 1  # rank among selected
    has_slot = new_mask & (rank < n_dead)
    target = jnp.where(has_slot, dead_order[jnp.clip(rank, 0, cap - 1)], cap)

    # ---- sample new positions: x + R @ (eps * s)  (:641-647, :694-698)
    eps = jax.random.normal(key, (cap, 3)) * scales
    R = quat_to_rotmat(quat_normalize(state.rotation))
    offset = jnp.einsum('pij,pj->pi', R, eps)
    new_xyz = state.xyz + offset
    split_scaling = jnp.log(jnp.maximum(scales / (0.8 * 2), 1e-12))
    new_scaling = jnp.where(split_mask[:, None], split_scaling, state.scaling)

    def scatter(dst, src):
        return dst.at[target].set(src, mode='drop')

    ns = GaussianState(
        xyz=scatter(state.xyz, new_xyz),
        knn_f=scatter(state.knn_f, state.knn_f),
        features_dc=scatter(state.features_dc, state.features_dc),
        features_rest=scatter(state.features_rest, state.features_rest),
        scaling=scatter(state.scaling, new_scaling),
        rotation=scatter(state.rotation, state.rotation),
        opacity=scatter(state.opacity, state.opacity),
        language_feature=scatter(state.language_feature, state.language_feature),
        instance_feature=scatter(state.instance_feature, state.instance_feature),
        alive=state.alive.at[target].set(True, mode='drop'))

    # split source slots: overwritten in place with the second sample
    split_src = split_mask & has_slot
    ns = GaussianState(
        xyz=jnp.where(split_src[:, None], new_xyz, ns.xyz),
        knn_f=ns.knn_f, features_dc=ns.features_dc,
        features_rest=ns.features_rest,
        scaling=jnp.where(split_src[:, None], split_scaling, ns.scaling),
        rotation=ns.rotation,
        opacity=ns.opacity, language_feature=ns.language_feature,
        instance_feature=ns.instance_feature, alive=ns.alive)

    # ---- prune (densify_and_prune :700-718)
    opacity = jax.nn.sigmoid(ns.opacity[:, 0])
    prune = ns.alive & (opacity < cfg.opacity_cull_threshold)
    if size_threshold is not None:
        # NOTE: the reference zeroes max_radii2D in densification_postfix
        # BEFORE this check runs (gaussian_model.py:700-718 reads the
        # re-created buffer), so the screen-size criterion never fires there;
        # only the world-size criterion is live. We reproduce that behavior.
        big_ws = jnp.max(jnp.exp(ns.scaling), -1) > 0.1 * scene_extent
        prune = prune | (ns.alive & big_ws)
    # (the reference's opacity cull applies to freshly added points too —
    # they inherit the source opacity, so no special-casing of written slots)
    written = jnp.zeros(cap, bool).at[target].set(True, mode='drop') | split_src

    ns = dataclasses.replace(ns, alive=ns.alive & ~prune)

    return DensifyResult(
        state=ns, stats=DensifyStats.zeros(cap), written_slots=written,
        n_cloned=jnp.sum(clone_mask & has_slot),
        n_split=jnp.sum(split_src),
        n_pruned=jnp.sum(prune))


def reset_opacity(state: GaussianState) -> GaussianState:
    """gaussian_model.reset_opacity: clamp opacity to <= 0.01 (in logit
    space). Unused by the shipped config (interval 999,999)."""
    new_op = jnp.minimum(jax.nn.sigmoid(state.opacity), 0.01)
    return dataclasses.replace(state, opacity=inverse_sigmoid(new_op))
