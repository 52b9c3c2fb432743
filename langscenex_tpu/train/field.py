"""Field-construction training: jitted step with phase-gated losses.

Parity target: GaussianField.train (field_construction/gaussian_field.py:
113-560). TPU-first restructuring (SURVEY.md §7.6):

  - one jitted step function per static phase-flag combination (instead of
    requires_grad flips, change_reqiures_grad :760-841 -> per-group grad
    masks, train/optim.py)
  - camera-pose gradients flow by transforming splats with the learnable
    quat+t and rendering with an identity view matrix, exactly as the
    reference shim (gaussian_renderer/__init__.py:79-91)
  - densification runs eagerly between jitted steps at the reference
    cadence (every 100 iters in (500, 1200]) on fixed-capacity state
  - densify screen-space grads are taken w.r.t. an auxiliary zero pixel
    offset and rescaled by (W/2, H/2) to the reference's NDC units
    (backward.cu:663 ddelx_dx = 0.5*W) so thresholds carry over

Deviation (documented): in pose-optimized mode the reference builds the
all_map plane channels with the *nominal* camera on already-transformed
means (gaussian_renderer/__init__.py:152-160), double-transforming them; we
build them consistently in the render camera frame. For non-pose rendering
(render/eval parity paths) the two coincide.
"""
from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import losses as L
from ..ops.depth_normal import points_to_normals
from ..ops.projection import RasterCamera
from ..ops.quat import camera_from_tensor, quat_multiply, tensor_from_camera
from ..ops.rasterize import RasterConfig, rasterize
from ..ops.transforms import projection_matrix
from ..scene.cameras import Camera, ZNEAR, ZFAR
from ..scene.gaussians import GaussianState, DensifyStats
from ..utils.config import OptimizationConfig
from .densify import densify_and_prune
from .multiview import multi_view_loss
from .optim import (make_app_optimizer, make_pose_optimizer,
                    make_splat_optimizer, phase_grad_mask, splat_params,
                    zero_moments_at)


class StepFlags(NamedTuple):
    """Static loss gates for one compiled step variant (phase schedule per
    gaussian_field.py:234-487)."""
    image: bool
    single_view: bool
    multiview: bool
    lang: bool
    instance: bool
    optim_pose: bool
    phase: str              # optimizer mask phase


def phase_flags(it: int, cfg: OptimizationConfig) -> StepFlags:
    """Map iteration -> static flags (the reference's iteration gates)."""
    image = it < cfg.max_geo_iter
    single = (cfg.single_view_weight_from_iter < it
              < cfg.single_view_weight_end_iter) and image
    multi = (cfg.multi_view_weight_from_iter < it
             < cfg.multi_view_weight_end_iter) and image
    lang = cfg.lang_loss_start_iter <= it < cfg.instance_supervision_from_iter
    inst = it >= cfg.instance_supervision_from_iter
    if inst:
        phase = "instance"
    elif it >= cfg.max_geo_iter:
        phase = "semantic_only"
    else:
        phase = "semantic"
    return StepFlags(image=image, single_view=single, multiview=multi,
                     lang=lang, instance=inst,
                     optim_pose=cfg.optim_pose and phase == "semantic",
                     phase=phase)


class CameraBatch(NamedTuple):
    """Per-step device inputs (one view + optional nearest view)."""
    cam_idx: jnp.ndarray        # [] int32 index into pose table
    uid: jnp.ndarray            # [] int32 index into app table
    w2c: jnp.ndarray            # [4,4] nominal world-to-cam
    gt_image: jnp.ndarray       # [3,H,W]
    gt_gray: jnp.ndarray        # [1,H,W]
    normal_prior: jnp.ndarray   # [3,H,W] world-space prior
    normal_mask: jnp.ndarray    # [H,W] bool
    lang_feat: jnp.ndarray      # [3,H,W]
    lang_mask: jnp.ndarray      # [H,W] bool
    seg: jnp.ndarray            # [H,W] int32
    near_idx: jnp.ndarray       # [] int32 (pose index of nearest cam)
    near_w2c: jnp.ndarray       # [4,4]
    near_gt_gray: jnp.ndarray   # [1,H,W]
    has_near: jnp.ndarray       # [] bool
    bg: jnp.ndarray             # [3]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    splats: GaussianState
    poses: jnp.ndarray          # [Ncam,7] learnable quat+t (w2c)
    app_ab: jnp.ndarray         # [Nimg,2] exposure affine
    splat_opt: optax.OptState
    pose_opt: optax.OptState
    app_opt: optax.OptState
    stats: DensifyStats
    step: jnp.ndarray           # [] int32


def render_view(splats: GaussianState, pose: Optional[jnp.ndarray],
                w2c: jnp.ndarray, cam: RasterCamera, bg: jnp.ndarray,
                sh_degree: int, include_feature: bool, return_plane: bool,
                mean2d_offset: Optional[jnp.ndarray], rcfg: RasterConfig,
                mean2d_abs_hook: Optional[jnp.ndarray] = None):
    """The render shim (gaussian_renderer/__init__.py:42-239) on state."""
    opacity = splats.get_opacity()[:, 0] * splats.alive
    scales = splats.get_scaling()
    rot = splats.get_rotation()

    # Small-contraction point transforms pinned to HIGHEST: TPU matmuls
    # default to bf16 inputs and 2^-8 relative error on positions is
    # pixel-scale at the rasterizer (see train/multiview.py note).
    _HI = jax.lax.Precision.HIGHEST
    if pose is not None:
        rel = camera_from_tensor(pose)
        means = jnp.matmul(splats.xyz, rel[:3, :3].T,
                           precision=_HI) + rel[:3, 3]
        quats = quat_multiply(pose[None, :4]
                              / jnp.linalg.norm(pose[:4]), rot)
        render_w2c = jnp.eye(4, dtype=jnp.float32)
        eff_w2c = rel        # the true frame the rasterizer sees
    else:
        means = splats.xyz
        quats = rot
        render_w2c = w2c
        eff_w2c = w2c

    rcam = RasterCamera(w2c=render_w2c, proj=cam.proj, width=cam.width,
                        height=cam.height, tan_fovx=cam.tan_fovx,
                        tan_fovy=cam.tan_fovy)

    all_map = None
    if return_plane:
        # per-splat plane params in the render camera frame (consistent
        # variant — see module docstring)
        cam_center = -jnp.matmul(eff_w2c[:3, :3].T, eff_w2c[:3, 3],
                                 precision=_HI)
        global_normal = splats.get_normal(cam_center)
        local_normal = jnp.matmul(global_normal, eff_w2c[:3, :3].T,
                                  precision=_HI)
        pts_in_cam = jnp.matmul(splats.xyz, eff_w2c[:3, :3].T,
                                precision=_HI) + eff_w2c[:3, 3]
        local_distance = jnp.abs(jnp.sum(local_normal * pts_in_cam, -1))
        all_map = jnp.concatenate([
            local_normal, jnp.ones_like(local_distance[:, None]),
            local_distance[:, None]], -1)

    return rasterize(
        means, scales, quats, opacity, rcam, bg,
        shs=splats.get_features(), sh_degree=sh_degree,
        language_feature=splats.language_feature if include_feature else None,
        instance_feature=splats.instance_feature if include_feature else None,
        all_map=all_map, mean2d_offset=mean2d_offset,
        mean2d_abs_hook=mean2d_abs_hook, cfg=rcfg)


def _pix_rays(H, W, fx, fy):
    ix = jnp.arange(W, dtype=jnp.float32)
    iy = jnp.arange(H, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(ix, iy, indexing='xy')
    return jnp.stack([(gx - W * 0.5) / fx, (gy - H * 0.5) / fy,
                      jnp.ones_like(gx)], -1)


def view_loss(cfg: OptimizationConfig, flags: StepFlags, rcfg: RasterConfig,
              proxy_cam: RasterCamera, sh_degree: int, alive: jnp.ndarray,
              params: dict, poses: jnp.ndarray, app_ab: jnp.ndarray,
              m2d_off: jnp.ndarray, batch: CameraBatch, key: jax.Array,
              m2d_abs: Optional[jnp.ndarray] = None):
    """Full phase-gated loss for ONE view (the loss body of
    gaussian_field.py:234-487). Module-level so the single-view step and the
    view-parallel multi-chip step share it."""
    H, W = proxy_cam.height, proxy_cam.width
    fx = W / (2 * proxy_cam.tan_fovx)
    fy = H / (2 * proxy_cam.tan_fovy)
    splats = GaussianState(alive=alive, **params)
    pose = poses[batch.cam_idx] if flags.optim_pose else None
    out = render_view(splats, pose, batch.w2c, proxy_cam,
                      batch.bg, sh_degree, include_feature=True,
                      return_plane=True, mean2d_offset=m2d_off,
                      rcfg=rcfg, mean2d_abs_hook=m2d_abs)
    metrics = {}
    total = jnp.zeros(())
    image = out.color
    eff_w2c = (camera_from_tensor(pose) if pose is not None
               else batch.w2c)

    if flags.image:
        ssim_val = L.ssim(image, batch.gt_image)
        ssim_loss = 1.0 - ssim_val
        app = app_ab[batch.uid]
        app_image = jnp.exp(app[0]) * image + app[1]
        use_app = ssim_loss < 0.5
        l1 = jnp.where(use_app,
                       L.l1_loss(app_image, batch.gt_image),
                       L.l1_loss(image, batch.gt_image))
        image_loss = (1.0 - cfg.lambda_dssim) * l1 + cfg.lambda_dssim * ssim_loss
        total = total + image_loss
        metrics['image_loss'] = image_loss
        metrics['ssim'] = ssim_val

        # min-scale flatness loss (gaussian_field.py:247-252)
        vis = out.visible & (out.radii > 0)
        min_scale = jnp.min(splats.get_scaling(), -1)
        n_vis = jnp.maximum(jnp.sum(vis), 1)
        total = total + cfg.scale_loss_weight * jnp.sum(
            jnp.where(vis, min_scale, 0.0)) / n_vis

    if flags.single_view:
        # depth->normal consistency (gaussian_field.py:255-283)
        rays = _pix_rays(H, W, fx, fy)
        pts = rays * out.plane_depth[..., None]
        depth_normal = points_to_normals(pts).transpose(2, 0, 1)
        alpha = out.all_map[3]
        depth_normal = depth_normal * jax.lax.stop_gradient(alpha)[None]
        normal_ch = out.all_map[:3]
        if cfg.normal_optim:
            # StableNormal prior path (:264-276): rotate rendered
            # normals to world, compare by cosine + ranking loss
            Rcw = eff_w2c[:3, :3].T
            rn_world = jnp.einsum('ij,jhw->ihw', Rcw, normal_ch)
            dn_world = jnp.einsum('ij,jhw->ihw', Rcw, depth_normal)
            err = ((1.0 - _cos_hw(batch.normal_prior, rn_world))
                   + (1.0 - _cos_hw(batch.normal_prior, dn_world)))
            msum = jnp.maximum(jnp.sum(batch.normal_mask), 1)
            nl = cfg.single_view_weight * jnp.sum(
                jnp.where(batch.normal_mask, err, 0.0)) / msum
        else:
            iw = (1.0 - L.image_grad_weight(batch.gt_image))
            iw = jax.lax.stop_gradient(jnp.clip(iw, 0, 1) ** 2)
            diff = jnp.sum(jnp.abs(depth_normal - normal_ch), 0)
            nl = cfg.single_view_weight * jnp.mean(
                diff if cfg.wo_image_weight else iw * diff)
        total = total + nl
        metrics['normal_loss'] = nl

    if flags.multiview:
        near_pose = None
        if flags.optim_pose:
            near_pose = jax.lax.stop_gradient(poses[batch.near_idx])
        near_out = render_view(
            splats, near_pose, batch.near_w2c, proxy_cam, batch.bg,
            sh_degree, include_feature=False, return_plane=True,
            mean2d_offset=None, rcfg=rcfg)
        Kmat = jnp.array([[fx, 0, W * 0.5], [0, fy, H * 0.5],
                          [0, 0, 1.0]])
        near_eff = (camera_from_tensor(near_pose)
                    if near_pose is not None else batch.near_w2c)
        mv = multi_view_loss(
            key, out.plane_depth, out.all_map[:3], out.all_map[4],
            near_out.plane_depth, batch.gt_gray, batch.near_gt_gray,
            eff_w2c, near_eff, Kmat,
            patch_size=cfg.multi_view_patch_size,
            sample_num=cfg.multi_view_sample_num,
            pixel_noise_th=cfg.multi_view_pixel_noise_th,
            geo_weight=cfg.multi_view_geo_weight,
            ncc_weight=cfg.multi_view_ncc_weight,
            wo_geo_occ_aware=cfg.wo_use_geo_occ_aware,
            ncc_dense=cfg.multi_view_dense_ncc)
        has = batch.has_near.astype(jnp.float32)
        total = total + has * (mv.geo_loss + mv.ncc_loss)
        metrics['geo_loss'] = mv.geo_loss
        metrics['ncc_loss'] = mv.ncc_loss

    if flags.lang:
        m = batch.lang_mask[None].astype(jnp.float32)
        lang_loss = L.l1_loss(out.language * m, batch.lang_feat * m)
        total = total + lang_loss
        metrics['lang_loss'] = lang_loss
        if cfg.grouping_loss:
            k1 = jax.random.fold_in(key, 3)
            flat_seg = jnp.where(batch.lang_mask, batch.seg,
                                 -1).reshape(-1)
            flat_feat = out.language.reshape(3, -1).T
            gl = L.loss_semantic_group(k1, flat_seg, flat_feat)
            total = total + gl
            metrics['grouping_loss'] = gl
        if cfg.loss_obj_3d:
            k2 = jax.random.fold_in(key, 7)
            ol = L.loss_cls_3d(
                k2, jax.lax.stop_gradient(splats.xyz),
                splats.language_feature, cfg.reg3d_k,
                cfg.reg3d_lambda_val)
            total = total + ol
            metrics['obj3d_loss'] = ol

    if flags.instance:
        flat_seg = jnp.where(batch.lang_mask, batch.seg, -1).reshape(-1)
        inst_flat = out.instance.reshape(3, -1).T
        lang_flat = jax.lax.stop_gradient(out.language).reshape(3, -1).T
        if cfg.grouping_loss:
            k1 = jax.random.fold_in(key, 5)
            gl = L.loss_instance_group(k1, flat_seg, inst_flat, lang_flat)
            total = total + gl
            metrics['ins_grouping_loss'] = gl
        if cfg.loss_obj_3d:
            k2 = jax.random.fold_in(key, 9)
            ol = L.loss_cls_3d(k2, jax.lax.stop_gradient(splats.xyz),
                               splats.instance_feature, cfg.reg3d_k,
                               cfg.reg3d_lambda_val)
            total = total + ol
            metrics['ins_obj3d_loss'] = ol

    metrics['total'] = total
    metrics['pair_overflow'] = out.pairs_overflowed.astype(jnp.float32)
    if out.k_overflowed is not None:
        metrics['k_overflow'] = out.k_overflowed.astype(jnp.float32)
    if out.num_pairs is not None:
        metrics['num_pairs'] = out.num_pairs.astype(jnp.float32)
    if out.num_big is not None:
        metrics['num_big'] = out.num_big.astype(jnp.float32)
    aux = (metrics, out.radii, out.out_observe, out.visible)
    return total, aux


def make_train_step(cfg: OptimizationConfig, flags: StepFlags,
                    rcfg: RasterConfig, proxy_cam: RasterCamera,
                    spatial_lr_scale: float):
    """Build the jitted single-view step for one static flag combination."""
    splat_tx = make_splat_optimizer(cfg, spatial_lr_scale)
    pose_tx = make_pose_optimizer(cfg)
    app_tx = make_app_optimizer()
    H, W = proxy_cam.height, proxy_cam.width

    def step_fn(state: TrainState, batch: CameraBatch, key: jax.Array,
                sh_degree: int):
        def loss_fn(params, poses, app_ab, m2d_off, m2d_abs):
            return view_loss(cfg, flags, rcfg, proxy_cam, sh_degree,
                             state.splats.alive, params, poses, app_ab,
                             m2d_off, batch, key, m2d_abs)

        params0 = splat_params(state.splats)
        m2d0 = jnp.zeros((state.splats.capacity, 2))
        grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True)
        (gs, gp, ga, gm2d, gabs), (metrics, radii, observe, visible) = \
            grad_fn(params0, state.poses, state.app_ab, m2d0, m2d0)

        # densify stats in the reference's NDC-gradient units
        # (backward.cu:663 ddelx_dx = 0.5*W). The abs-gradient channel is
        # exact from the Pallas backward hook when active; max with
        # |signed| covers the XLA path where the hook carries no gradient.
        ndc_grad = gm2d * jnp.array([0.5 * W, 0.5 * H])
        ndc_abs = jnp.maximum(jnp.abs(ndc_grad),
                              gabs * jnp.array([0.5 * W, 0.5 * H]))
        upd_filter = visible & (radii > 0)
        track = state.step < min(cfg.max_geo_iter, cfg.densify_until_iter)
        new_stats = jax.tree_util.tree_map(
            lambda a, b: jnp.where(track, b, a), state.stats,
            state.stats.update(ndc_grad, ndc_abs, radii, upd_filter))

        gs = phase_grad_mask(flags.phase, gs)
        updates, new_splat_opt = splat_tx.update(gs, state.splat_opt, params0)
        new_params = optax.apply_updates(params0, updates)
        new_splats = dataclasses.replace(state.splats, **new_params)

        if flags.optim_pose:
            pu, new_pose_opt = pose_tx.update(gp, state.pose_opt, state.poses)
            new_poses = optax.apply_updates(state.poses, pu)
        else:
            new_pose_opt = state.pose_opt
            new_poses = state.poses

        if flags.image:
            au, new_app_opt = app_tx.update(ga, state.app_opt, state.app_ab)
            new_app = optax.apply_updates(state.app_ab, au)
        else:
            new_app_opt = state.app_opt
            new_app = state.app_ab

        new_state = TrainState(
            splats=new_splats, poses=new_poses, app_ab=new_app,
            splat_opt=new_splat_opt, pose_opt=new_pose_opt,
            app_opt=new_app_opt, stats=new_stats, step=state.step + 1)
        return new_state, metrics

    return jax.jit(step_fn, static_argnames=('sh_degree',),
                   donate_argnums=(0,))


def make_parallel_train_step(cfg: OptimizationConfig, flags: StepFlags,
                             rcfg: RasterConfig, proxy_cam: RasterCamera,
                             spatial_lr_scale: float, mesh):
    """View-parallel multi-chip training step (TPU-native scaling design —
    the reference is single-GPU, SURVEY.md §2.9).

    Each device along the mesh 'data' axis renders one view of a B-view
    batch (every CameraBatch leaf gains a leading B axis, sharded over
    'data'); per-view losses are averaged, so GSPMD inserts the gradient
    all-reduce over ICI. Splat + optimizer state are replicated.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    splat_tx = make_splat_optimizer(cfg, spatial_lr_scale)
    pose_tx = make_pose_optimizer(cfg)
    app_tx = make_app_optimizer()
    H, W = proxy_cam.height, proxy_cam.width

    def step_fn(state: TrainState, batch: CameraBatch, keys: jax.Array,
                sh_degree: int):
        def mean_loss(params, poses, app_ab, m2d_off):
            def one(b, k):
                return view_loss(cfg, flags, rcfg, proxy_cam, sh_degree,
                                 state.splats.alive, params, poses, app_ab,
                                 m2d_off, b, k)
            losses, aux = jax.vmap(one)(batch, keys)
            return jnp.mean(losses), aux

        params0 = splat_params(state.splats)
        m2d0 = jnp.zeros((state.splats.capacity, 2))
        grad_fn = jax.grad(mean_loss, argnums=(0, 1, 2, 3), has_aux=True)
        (gs, gp, ga, gm2d), (metrics, radii, observe, visible) = grad_fn(
            params0, state.poses, state.app_ab, m2d0)

        ndc_grad = gm2d * jnp.array([0.5 * W, 0.5 * H])
        upd_filter = jnp.any(visible & (radii > 0), axis=0)
        track = state.step < min(cfg.max_geo_iter, cfg.densify_until_iter)
        new_stats = jax.tree_util.tree_map(
            lambda a, b: jnp.where(track, b, a), state.stats,
            state.stats.update(ndc_grad, jnp.abs(ndc_grad),
                               jnp.max(radii, axis=0), upd_filter))

        gs = phase_grad_mask(flags.phase, gs)
        updates, new_splat_opt = splat_tx.update(gs, state.splat_opt, params0)
        new_params = optax.apply_updates(params0, updates)
        new_splats = dataclasses.replace(state.splats, **new_params)

        if flags.optim_pose:
            pu, new_pose_opt = pose_tx.update(gp, state.pose_opt, state.poses)
            new_poses = optax.apply_updates(state.poses, pu)
        else:
            new_pose_opt, new_poses = state.pose_opt, state.poses
        if flags.image:
            au, new_app_opt = app_tx.update(ga, state.app_opt, state.app_ab)
            new_app = optax.apply_updates(state.app_ab, au)
        else:
            new_app_opt, new_app = state.app_opt, state.app_ab

        new_state = TrainState(
            splats=new_splats, poses=new_poses, app_ab=new_app,
            splat_opt=new_splat_opt, pose_opt=new_pose_opt,
            app_opt=new_app_opt, stats=new_stats, step=state.step + 1)
        return new_state, jax.tree_util.tree_map(jnp.mean, metrics)

    repl = NamedSharding(mesh, P())

    def batch_shard(x):
        return NamedSharding(mesh, P(*(("data",) + (None,) * (x - 1))))

    batch_sharding = CameraBatch(
        cam_idx=batch_shard(1), uid=batch_shard(1), w2c=batch_shard(3),
        gt_image=batch_shard(4), gt_gray=batch_shard(4),
        normal_prior=batch_shard(4), normal_mask=batch_shard(3),
        lang_feat=batch_shard(4), lang_mask=batch_shard(3),
        seg=batch_shard(3), near_idx=batch_shard(1), near_w2c=batch_shard(3),
        near_gt_gray=batch_shard(4), has_near=batch_shard(1),
        bg=batch_shard(2))

    return jax.jit(step_fn, static_argnums=(3,),
                   in_shardings=(repl, batch_sharding, batch_shard(2)),
                   out_shardings=(repl, repl))


def _cos_hw(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity along channel dim of [3,H,W] maps (gradient-safe
    at zero vectors)."""
    num = jnp.sum(a * b, 0)
    na = jnp.sqrt(jnp.maximum(jnp.sum(a * a, 0), 1e-16))
    nb = jnp.sqrt(jnp.maximum(jnp.sum(b * b, 0), 1e-16))
    return num / (na * nb)


class GaussianFieldTrainer:
    """Host-side training driver (the Python loop of gaussian_field.train).

    Handles camera shuffling, phase switching (recompiled step variants),
    densification cadence, instance-feature copy at the instance phase
    boundary, and checkpoint hooks. Cameras must share one resolution
    (true for the reference pipeline: 49 video frames at a fixed size).
    """

    def __init__(self, cams: list[Camera], splats: GaussianState,
                 cfg: OptimizationConfig, scene_extent: float,
                 sh_degree_max: int = 3, rcfg: RasterConfig = RasterConfig(),
                 white_background: bool = False, seed: int = 42,
                 lang_dir: Optional[str] = None,
                 confidence_lr: Optional[jnp.ndarray] = None):
        self.cams = cams
        self.cfg = cfg
        # training default: cap the sorted pair list (measured +35-56%
        # step rate at 200k splats — the cap shrinks the backward's dpay
        # scatter domain; experiments/train_rate.py). 8x capacity with a
        # 64k floor so tiny test scenes never truncate; the step reports
        # metrics['pair_overflow'] if a scene ever exceeds it.
        if rcfg.max_pairs is None:
            import dataclasses as _dc
            rcfg = _dc.replace(
                rcfg, max_pairs=max(8 * splats.capacity, 1 << 16))
        # round 5: on TPU, compact the pair stream to the budget before
        # the sort and use the bitonic engine (ops/compaction.py +
        # ops/sort_engine.py — bit-identical lists, 14.4 -> 12.8 ms on
        # the bench forward). CPU keeps the XLA sort (the interpret-mode
        # kernels would dominate test time).
        if (jax.default_backend() == "tpu" and rcfg.rank_key_sort
                and not rcfg.key_only_sort and rcfg.max_pairs):
            import dataclasses as _dc
            rcfg = _dc.replace(rcfg, compact_sort=True, pallas_sort=True)
        self.rcfg = rcfg
        # HBM budget for adaptive pair-buffer growth (_grow_pair_caps)
        self.max_pairs_ceiling = 32 * 1024 * 1024
        # adaptive-shrink bookkeeping (_maybe_shrink_pair_cap)
        self._demand_hwm = 0.0
        self._last_cap_resize = 0
        self.scene_extent = scene_extent
        self.sh_degree_max = sh_degree_max
        self.lang_dir = lang_dir
        self.key = jax.random.PRNGKey(seed)
        self.rng = np.random.default_rng(seed)

        cam0 = cams[0]
        self.proxy_cam = RasterCamera(
            w2c=jnp.eye(4), proj=jnp.asarray(
                projection_matrix(ZNEAR, ZFAR, cam0.fovx, cam0.fovy)),
            width=cam0.width, height=cam0.height,
            tan_fovx=math.tan(cam0.fovx * 0.5),
            tan_fovy=math.tan(cam0.fovy * 0.5))
        self.bg = jnp.array([1.0, 1.0, 1.0] if white_background
                            else [0.0, 0.0, 0.0])

        # learnable pose table initialized from nominal extrinsics
        # (gaussian_model.init_RT_seq:238-247)
        poses = np.stack([np.asarray(tensor_from_camera(jnp.asarray(c.w2c)))
                          for c in cams]).astype(np.float32)
        cap = splats.capacity
        self.state = TrainState(
            splats=splats,
            poses=jnp.asarray(poses),
            app_ab=jnp.zeros((len(cams), 2), jnp.float32),
            splat_opt=make_splat_optimizer(
                cfg, scene_extent, confidence_lr=confidence_lr).init(
                splat_params(splats)),
            pose_opt=make_pose_optimizer(cfg).init(jnp.asarray(poses)),
            app_opt=make_app_optimizer().init(jnp.zeros((len(cams), 2))),
            stats=DensifyStats.zeros(cap),
            step=jnp.zeros((), jnp.int32))

        self._steps = {}
        self._batch_cache = {}
        self._full_batch_cache = {}
        self._viewpoint_stack: list[int] = []
        self.active_sh_degree = 0

    # ---------------- data marshalling ----------------

    def _camera_arrays(self, ci: int):
        """Device-cached per-camera arrays."""
        if ci in self._batch_cache:
            return self._batch_cache[ci]
        cam = self.cams[ci]
        img, gray = cam.load_image()
        H, W = img.shape[1:]
        if self.cfg.normal_optim:
            try:
                normal_prior, normal_mask = cam.load_normal()
            except FileNotFoundError:
                normal_prior = np.zeros_like(img)
                normal_mask = np.zeros((H, W), bool)
        else:
            normal_prior = np.zeros_like(img)
            normal_mask = np.zeros((H, W), bool)
        if self.lang_dir:
            try:
                lf, lm, seg = cam.load_language_feature(self.lang_dir)
            except FileNotFoundError:
                lf, lm = np.zeros_like(img), np.zeros((H, W), bool)
                seg = np.full((H, W), -1, np.int64)
        else:
            lf, lm = np.zeros_like(img), np.zeros((H, W), bool)
            seg = np.full((H, W), -1, np.int64)
        arrs = dict(
            w2c=jnp.asarray(cam.w2c), gt_image=jnp.asarray(img),
            gt_gray=jnp.asarray(gray),
            normal_prior=jnp.asarray(normal_prior),
            normal_mask=jnp.asarray(normal_mask),
            lang_feat=jnp.asarray(lf), lang_mask=jnp.asarray(lm),
            seg=jnp.asarray(seg, jnp.int32))
        self._batch_cache[ci] = arrs
        return arrs

    def _camera_batch(self, ci: int, flags: StepFlags) -> CameraBatch:
        cam = self.cams[ci]
        if flags.multiview and cam.nearest_id:
            ni = int(self.rng.choice(cam.nearest_id))
            has_near = True
        else:
            ni, has_near = ci, False
        # Cache the COMPLETE batch pytree per (view, near) pair: even the
        # scalar leaves (cam_idx/uid/near_idx/has_near) are device
        # transfers, and on the tunneled backend each fresh tiny H2D costs
        # a synchronous round trip — 4 of them per iteration measured
        # ~1 s/iter of pure overhead against a 0.2 s train step (the
        # full-schedule run clocked 0.82 it/s while the same jitted step
        # rated 4.87 it/s with a reused batch).
        key = (ci, ni)
        hit = self._full_batch_cache.get(key)
        if hit is not None:
            return hit
        a = self._camera_arrays(ci)
        if has_near:
            na = self._camera_arrays(ni)
            near_gray, near_w2c = na['gt_gray'], na['w2c']
        else:
            near_gray, near_w2c = a['gt_gray'], a['w2c']
        batch = CameraBatch(
            cam_idx=jnp.asarray(ci, jnp.int32),
            uid=jnp.asarray(cam.uid, jnp.int32),
            near_idx=jnp.asarray(ni, jnp.int32),
            near_w2c=near_w2c, near_gt_gray=near_gray,
            has_near=jnp.asarray(has_near), bg=self.bg, **a)
        self._full_batch_cache[key] = batch
        return batch

    def _get_step(self, flags: StepFlags):
        if flags not in self._steps:
            self._steps[flags] = make_train_step(
                self.cfg, flags, self.rcfg, self.proxy_cam,
                self.scene_extent)
        return self._steps[flags]

    def _grow_pair_caps(self, metrics) -> None:
        """Adaptive pair-buffer growth: when a step reports pair
        truncation, resize max_pairs straight to 1.25x the TRUE demand
        (binning reports it in num_pairs) and drop the jitted steps so
        the next call recompiles at the new shape. Truncation is
        therefore bounded to a few iters per growth instead of silently
        degrading every render (the CUDA reference never truncates —
        its pair list is dynamically sized,
        rasterizer_impl.cu:285-328). The buffer is the only static cap:
        a single splat may touch arbitrarily many tiles (ops/binning.py)."""
        import logging
        log_ = logging.getLogger(__name__)
        # tier-2 register exhausted (> big_splats splats exceed K1 tiles):
        # growing max_pairs cannot clear this — double the register
        if float(metrics.get('k_overflow', 0.0)) > 0:
            nb = float(metrics.get('num_big', 0.0))
            new_b = max(2 * self.rcfg.big_splats, int(1.25 * nb))
            self.rcfg = dataclasses.replace(self.rcfg, big_splats=new_b)
            self._steps.clear()
            log_.warning(
                "big-splat register overflowed — growing big_splats to "
                "%d (recompile)", new_b)
            if float(metrics.get('num_pairs', 0.0)) <= \
                    float(self.rcfg.max_pairs or 0):
                return      # demand fits; the register was the only issue
        mp = self.rcfg.max_pairs
        if mp is None:
            return
        grid_x = -(-self.proxy_cam.width // self.rcfg.tile_w)
        grid_y = -(-self.proxy_cam.height // self.rcfg.tile_h)
        P = int(self.state.splats.capacity)
        # Ceiling = min(every splat on every tile, an HBM budget): the
        # pair domain carries ~10 i32/f32 arrays plus the [A,24] payload
        # gather, ~140 B/pair live — 32M pairs ≈ 4.5 GB, the most a
        # transient demand spike (densification inflating splats for a
        # few iters) may claim before we prefer bounded truncation of
        # the FARTHEST/TRAILING splats over an OOM that kills the run.
        natural = min(P * grid_x * grid_y, self.max_pairs_ceiling)
        npairs = float(metrics.get('num_pairs', 0.0))
        new_mp = min(max(2 * mp, int(1.25 * npairs)), natural)
        if new_mp > mp:
            self.rcfg = dataclasses.replace(self.rcfg, max_pairs=new_mp)
            self._steps.clear()
            log_.warning(
                "pair list overflowed (demand %d) — growing max_pairs to "
                "%d (recompile)", int(npairs), new_mp)
        else:
            log_.warning(
                "pair list overflowed at the hard ceiling (max_pairs=%s) "
                "— renders truncated", mp)

    def _maybe_shrink_pair_cap(self, it: int) -> None:
        """Shrink max_pairs toward the observed demand high-water mark:
        the static pair-staging domain (sort + payload gather + blend
        chunk map) scales with max_pairs, and the exact tile cull
        (ops/binning.CullSpec) leaves the 8x-capacity initial cap
        several-fold oversized — measured 34.1 -> 21.5 ms forward at
        100k splats once the cap matches culled demand
        (experiments/ab_cull.py). Factor-2 hysteresis + a 500-iter
        cooldown bound recompiles; the high-water mark spans all views
        seen since the last resize so one narrow view cannot shrink the
        cap below a wide view's need."""
        import logging
        mp = self.rcfg.max_pairs
        hwm = self._demand_hwm
        if hwm <= 0 or it - self._last_cap_resize < 500:
            return
        target = max(int(1.5 * hwm), 1 << 16)
        target = ((target + 127) // 128) * 128
        if target * 2 > mp:
            return
        self.rcfg = dataclasses.replace(self.rcfg, max_pairs=target)
        self._steps.clear()
        self._last_cap_resize = it
        self._demand_hwm = 0.0
        logging.getLogger(__name__).info(
            "pair demand HWM %d far below cap %d — shrinking max_pairs "
            "to %d (recompile)", int(hwm), mp, target)

    # ---------------- pose export ----------------

    def poses_as_matrices(self, poses=None) -> np.ndarray:
        """[N,7] learnable quat+t -> [N,4,4] w2c matrices ordered by
        colmap id (save_pose, gaussian_field.py:68-84 — the reference's
        pose npy format)."""
        qt = np.asarray(self.state.poses if poses is None else poses)
        mats = np.stack([np.asarray(camera_from_tensor(jnp.asarray(q)))
                         for q in qt])
        order = np.argsort([c.colmap_id for c in self.cams])
        return mats[order]

    def save_pose_org(self, save_dir: str, save_iterations) -> None:
        """Nominal (pre-training) poses per save iter
        (gaussian_field.py:141-144)."""
        import os
        nominal = np.stack(
            [np.asarray(tensor_from_camera(jnp.asarray(c.w2c)))
             for c in self.cams]).astype(np.float32)
        for it in save_iterations:
            d = os.path.join(save_dir, f"pose/iter_{it}")
            os.makedirs(d, exist_ok=True)
            np.save(os.path.join(d, "pose_org.npy"),
                    self.poses_as_matrices(nominal))

    # ---------------- observability ----------------

    def _eval_render(self, ci: int, include_feature: bool,
                     return_plane: bool):
        """Render camera ci with the nominal (non-optimized) pose and the
        current splats — the training_report contract ('do not use the
        optimized poses', gaussian_field.py:562-565)."""
        key = (include_feature, return_plane)
        if key not in getattr(self, '_eval_rfns', {}):
            self._eval_rfns = getattr(self, '_eval_rfns', {})
            self._eval_rfns[key] = jax.jit(
                lambda splats, w2c, sh: render_view(
                    splats, None, w2c, self.proxy_cam, self.bg, sh,
                    include_feature, return_plane, None, self.rcfg),
                static_argnames='sh')
        return self._eval_rfns[key](
            self.state.splats, jnp.asarray(self.cams[ci].w2c),
            self.active_sh_degree)

    def training_report(self, it: int, save_dir: str) -> dict:
        """test_iterations validation (gaussian_field.py:562-602): render
        train cams [5,10,15,20,25] (mod N), L1+PSNR, save render|gt
        side-by-side PNGs to save_dir/valid/."""
        import logging
        import os

        from PIL import Image
        log = logging.getLogger(__name__)
        os.makedirs(os.path.join(save_dir, "valid"), exist_ok=True)
        idxs = [i % len(self.cams) for i in range(5, 30, 5)]
        l1_t, psnr_t = 0.0, 0.0
        for ci in idxs:
            out = self._eval_render(ci, False, False)
            a, b = self.state.app_ab[ci]
            image = jnp.clip(jnp.exp(a) * out.color + b, 0.0, 1.0)
            gt = jnp.clip(self._camera_arrays(ci)['gt_image'], 0.0, 1.0)
            l1 = float(jnp.mean(jnp.abs(image - gt)))
            mse = float(jnp.mean((image - gt) ** 2))
            psnr = -10.0 * math.log10(max(mse, 1e-12))
            l1_t += l1
            psnr_t += psnr
            side = np.concatenate(
                [np.asarray(image), np.asarray(gt)], axis=2)
            Image.fromarray(
                (side.transpose(1, 2, 0) * 255).astype(np.uint8)).save(
                os.path.join(save_dir, "valid",
                             f"{it}_{self.cams[ci].uid}.png"))
        l1_t /= len(idxs)
        psnr_t /= len(idxs)
        log.info("[ITER %d] Evaluating train: L1 %.5f PSNR %.3f",
                 it, l1_t, psnr_t)
        return {"l1": l1_t, "psnr": psnr_t}

    def debug_collage(self, it: int, ci: int, save_dir: str) -> None:
        """8-panel debug dump every 200 iters (gaussian_field.py:342-378):
        row0 = gt | render | rendered-normal | distance,
        row1 = image-weight | plane-depth | depth-normal | normal-prior."""
        import os

        from PIL import Image

        from ..ops.depth_normal import normal_from_depth
        from ..ops.losses import image_grad_weight
        from ..utils.colormaps import apply_colormap, normalize

        os.makedirs(os.path.join(save_dir, "debug"), exist_ok=True)
        cam = self.cams[ci]
        arrs = self._camera_arrays(ci)
        out = self._eval_render(ci, False, True)

        def u8(chw):
            x = np.clip(np.asarray(chw), 0, 1)
            return (x.transpose(1, 2, 0) * 255).astype(np.uint8)

        def cmap_u8(x):
            return (apply_colormap(np.asarray(x)) * 255).astype(np.uint8)

        gt = u8(arrs['gt_image'])
        render = u8(out.color)
        nrm = u8((out.all_map[:3] + 1.0) * 0.5)
        dist = cmap_u8(normalize(np.asarray(out.all_map[4])))
        depth = np.asarray(out.plane_depth)
        depth_c = cmap_u8(normalize(depth))
        K = jnp.asarray(cam.K())
        dn = normal_from_depth(jnp.asarray(depth), K)
        w2c = np.asarray(arrs['w2c'])
        dn_world = np.asarray(dn) @ w2c[:3, :3]          # cam -> world rows
        dn_c = ((np.clip(dn_world, -1, 1) + 1) * 0.5 * 255).astype(np.uint8)
        weight = cmap_u8(
            np.asarray(image_grad_weight(jnp.asarray(arrs['gt_image']))))
        nprior = u8((arrs['normal_prior'] + 1.0) * 0.5)

        row0 = np.concatenate([gt, render, nrm, dist], axis=1)
        row1 = np.concatenate([weight, depth_c, dn_c, nprior], axis=1)
        collage = np.concatenate([row0, row1], axis=0)
        name = cam.image_name or str(cam.uid)
        Image.fromarray(collage).save(
            os.path.join(save_dir, "debug", f"{it:05d}_{name}.jpg"))

    # ---------------- main loop ----------------

    def train(self, iterations: Optional[int] = None, log_every: int = 0,
              callback=None, save_dir: Optional[str] = None,
              save_iterations=(), checkpoint_iterations=(),
              test_iterations=(), collage_interval: int = 0,
              first_iteration: int = 1):
        """Main loop. With ``save_dir``: PLY snapshots (with language/
        instance channels) at ``save_iterations`` and full orbax TrainState
        checkpoints at ``checkpoint_iterations`` plus optimized-pose npys —
        the reference's three save artifacts (gaussian_field.py:516-549)."""
        cfg = self.cfg
        iterations = iterations or cfg.iterations
        metrics = {}
        ema_loss = 0.0
        for it in range(first_iteration, iterations + 1):
            if it % 100 == 0 and self.active_sh_degree < self.sh_degree_max:
                self.active_sh_degree += 1

            flags = phase_flags(it, cfg)

            # instance-phase boundary: copy semantic -> instance features
            # (gaussian_field.py:469-471)
            if it == cfg.instance_supervision_from_iter:
                self.state = dataclasses.replace(
                    self.state, splats=dataclasses.replace(
                        self.state.splats,
                        # .copy(): aliased leaves break jit buffer donation
                        instance_feature=self.state.splats.language_feature.copy()))

            if not self._viewpoint_stack:
                self._viewpoint_stack = list(range(len(self.cams)))
            ci = self._viewpoint_stack.pop(
                int(self.rng.integers(len(self._viewpoint_stack))))

            batch = self._camera_batch(ci, flags)
            self.key, sk = jax.random.split(self.key)
            step = self._get_step(flags)
            self.state, metrics = step(self.state, batch, sk,
                                       sh_degree=self.active_sh_degree)

            # densification (gaussian_field.py:528-535)
            if (cfg.densify_from_iter < it
                    < min(cfg.max_geo_iter, cfg.densify_until_iter)
                    and it % cfg.densification_interval == 0):
                self.key, dk = jax.random.split(self.key)
                size_th = 20 if it > cfg.opacity_reset_interval else None
                res = densify_and_prune(dk, self.state.splats,
                                        self.state.stats, cfg,
                                        self.scene_extent, size_th)
                new_splat_opt = zero_moments_at(self.state.splat_opt,
                                                res.written_slots)
                self.state = dataclasses.replace(
                    self.state, splats=res.state, stats=res.stats,
                    splat_opt=new_splat_opt)

            if save_dir and it in set(save_iterations):
                from ..scene.ply_io import save_ply
                import os
                save_ply(self.state.splats, os.path.join(
                    save_dir, f"point_cloud/iteration_{it}/point_cloud.ply"))
                os.makedirs(os.path.join(save_dir, f"pose/iter_{it}"),
                            exist_ok=True)
                np.save(os.path.join(save_dir,
                                     f"pose/iter_{it}/pose_optimized.npy"),
                        self.poses_as_matrices())
            if save_dir and it in set(checkpoint_iterations):
                from .checkpoint import save_checkpoint
                save_checkpoint(save_dir, self.state, it)
            if save_dir and it in set(test_iterations):
                self.training_report(it, save_dir)
            if (save_dir and collage_interval
                    and it % collage_interval == 0):
                self.debug_collage(it, ci, save_dir)

            # Overflow check: frequent while densification/scale dynamics
            # are active (truncated renders chop splats mid-rect, and the
            # hard edge pushes scale gradients up — grow-to-cover feedback),
            # sparse afterwards. Each check costs one device fetch.
            check_every = 10 if it <= cfg.densify_until_iter else 100
            if metrics.get('pair_overflow') is not None \
                    and it % check_every == 0:
                if float(metrics['pair_overflow']) > 0:
                    self._grow_pair_caps(metrics)
                    self._demand_hwm = 0.0
                    self._last_cap_resize = it
                elif self.rcfg.max_pairs is not None:
                    self._demand_hwm = max(
                        self._demand_hwm,
                        float(metrics.get('num_pairs', 0.0)))
                    self._maybe_shrink_pair_cap(it)
            if log_every and it % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                # EMA postfix (decay 0.4/0.6, gaussian_field.py:490-511)
                ema_loss = 0.4 * m.get('total', 0.0) + 0.6 * ema_loss
                n = int(self.state.splats.num_alive)
                print(f"[{it}] alive={n} ema={ema_loss:.5f} " +
                      " ".join(f"{k}={v:.4f}" for k, v in m.items()))
            if callback is not None:
                callback(it, self.state, metrics)
        return self.state, metrics
