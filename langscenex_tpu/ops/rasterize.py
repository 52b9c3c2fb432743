"""Differentiable tile-based Gaussian rasterization (TPU-first, pure XLA path).

Re-derivation of the reference CUDA renderer's sequential front-to-back
alpha compositing (cuda_rasterizer/forward.cu renderCUDA:273-431) as an
exactly-equivalent vectorized form:

  For splats sorted front-to-back within a tile, with base mask
  m_i = (power_i <= 0) & (alpha_i >= 1/255), the sticky early-termination
  ("done" once T*(1-alpha) < 1e-4) is equivalent to the non-recursive mask
      include_i = m_i  &  (Tcum_i >= 1e-4)
  where Tcum_i = prod_{j<=i, m_j} (1 - alpha_j): the cumulative product is
  monotonically non-increasing, so once it crosses the threshold it stays
  below it — the first crossing index coincides with the sequential "done"
  trigger, and every later splat is excluded either way. Contribution
  weights are then w_i = include_i * alpha_i * Texcl_i and the final
  transmittance for background blending is prod over included (1-alpha).

This makes the blend a masked cumsum (log space) + channel matmul — MXU/VPU
friendly — and fully autodiff-able: JAX's reverse-mode through this formul-
ation computes the same gradients as the hand-written CUDA backward
(backward.cu:400-678). A fused Pallas kernel with identical semantics lives
in rasterize_pallas.py; this module is the reference implementation and the
fallback, and hosts the binning + output assembly shared by both.

Channel layout (config.h:15-20): 3 RGB + 3 language + 3 instance + 5 all_map
(local normal xyz, alpha-constant 1, plane distance).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .binning import (build_tile_lists, build_tile_lists_depth_presort,
                      TileLists)
from .projection import RasterCamera, preprocess

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    # Square tiles minimize tile-overlap pairs for round splats (a
    # radius-r splat covers ~(2r/tw+1)(2r/th+1) tiles, minimized at
    # tw==th for fixed area); the Pallas blend accepts any tile with
    # tw*th == 1024 pixels. Measured at 100k splats / 720x480 (v5e,
    # experiments/ab_tiles.py + ab_cull.py): 32x32 carries 32% fewer
    # pairs than 128x8 and, with tile_cull + a demand-sized pair cap,
    # renders 21.5 ms vs 34.1 (fwd+bwd 33.3 vs 73.7).
    tile_w: int = 32
    tile_h: int = 32
    max_tiles_per_splat: int = 32
    max_pairs: int | None = None   # cap on the sorted pair list (binning)
    # Tier-2 register size: splats exceeding max_tiles_per_splat tiles
    # get their overflow tiles enumerated exactly for up to this many
    # splats (binning two-tier scheme; k_overflowed reports exhaustion)
    big_splats: int = 256
    chunk: int = 128            # splats blended per scan step
    max_splats_per_tile: int = 4096  # per-tile list truncation (XLA path only)
    use_pallas: Optional[bool] = None  # None = auto (fused kernel on TPU)
    # Bin with the opacity-aware support radius (bit-identical output,
    # fewer pairs — see covariance.conic_and_radius); False = the
    # reference's literal 3-sigma AABB.
    opacity_aware_radius: bool = True
    # Depth-presort the splats and single-key stable-sort pairs by tile
    # (binning.build_tile_lists_depth_presort): equivalent output up to
    # depth ties, smaller big-sort payload. A/B knob for the forward perf.
    depth_presort: bool = False
    # Exact per-tile conic culling in binning (binning.CullSpec): drop
    # (splat, tile) pairs whose conic quadratic exceeds the alpha-support
    # threshold at EVERY pixel of the tile — bit-identical output, fewer
    # pairs (kills AABB corners + most of elongated splats' rects).
    tile_cull: bool = True
    # With depth_presort: index pairs by depth RANK and permute all
    # per-splat blend inputs into depth order, so each tile's payload
    # gather reads ascending (near-sequential) rows instead of random
    # ones — targets the transaction-bound A-row gather (KERNELS.md §6).
    # Identical output; costs one extra [P,*] permutation gather.
    payload_depth_rank: bool = False
    # Align-free blend staging (round 3, KERNELS.md §12): gather payload
    # rows ONCE in sorted-pair order and let the kernel walk TRUE
    # (unaligned) tile ranges with head-masked shared chunks — deletes
    # the sorted->aligned second gather and the cummax alignment maps
    # (the staging stage measured 11.4 ms of the 23 ms forward).
    # Identical output. Requires max_pairs (the gather domain is the
    # sorted list; unbudgeted lists span the full enumeration domain) —
    # falls back to the aligned layout otherwise.
    align_free: bool = True
    # With depth_presort: pack (tile, depth-rank) into ONE int32 sort key
    # (tile high bits, rank low) — the 2-key 3-stream lax.sort becomes a
    # 1-key 2-stream sort, −33% sort traffic on the largest remaining
    # forward line (KERNELS.md §12). Exact same order; auto-falls back
    # when tile*2^22+rank would overflow int32.
    packed_sort: bool = False
    # Mid enumeration tiers ((B_i, K_i), ...) between tier 1 and the
    # catch-all (binning._enumerate_two_tier): shrink the SORT DOMAIN by
    # lowering max_tiles_per_splat while keeping the build exact — each
    # mid tier enumerates K_i more tile slots for its top-B_i splats, so
    # the tile-count tail no longer needs either a fat K1 or the
    # [B, n_tiles-K1] catch-all. k_overflowed still reports any register
    # exhaustion. () = the r1-r3 two-tier layout, unchanged.
    extra_tiers: tuple = ()
    # Sort ONE packed int32 key (tile << 22 | per-splat depth rank) + sid
    # instead of the 2-key 3-stream (tile, depth, sid) sort. The rank is
    # computed in ID order (a [P] argsort + inverse scatter) so NOTHING
    # else is permuted — unlike depth_presort, which permuted every
    # enumeration and payload input and lost the id-order staging fusion
    # (KERNELS.md §12, 29.6 ms). Order is identical up to deterministic
    # depth-rank tie-breaking. Auto-falls back past 2^22 splats / 2^9
    # tiles. DEFAULT ON since round 4: bit-identical lists, -0.6 ms on
    # the bench forward (KERNELS.md §14).
    rank_key_sort: bool = True
    # With rank_key_sort + max_pairs: Pallas stream compaction of the
    # enumerated (key, sid) streams BEFORE the sort (ops/compaction.py) —
    # the sort then runs on <= max_pairs slots instead of the ~3.3x
    # larger static enumeration domain. Bit-identical lists (valid keys
    # are unique). Round-5 sort-engine work, docs/KERNELS.md §16.
    compact_sort: bool = False
    # With compact_sort: replace lax.sort with the Pallas bitonic sort
    # engine (ops/sort_engine.py) on the next_pow2(max_pairs) domain —
    # ~10 hand-scheduled passes instead of XLA's generic merge cascade.
    # Identical observable lists (unique valid keys).
    pallas_sort: bool = False
    # With rank_key_sort: sort ONLY the packed key (1-operand sort) and
    # recover the sid payload from the rank bits after truncation via
    # one [max_pairs] gather from the depth-argsort table — half the
    # rank-key sort's stream traffic, bit-identical lists
    # (binning.build_tile_lists ``key_only``).
    key_only_sort: bool = False

    def resolve_pallas(self) -> bool:
        if self.use_pallas is not None:
            return self.use_pallas
        if self.tile_w * self.tile_h != 1024:
            return False
        return jax.default_backend() == "tpu"


class RenderOutput(NamedTuple):
    color: jnp.ndarray            # [3,H,W]
    language: Optional[jnp.ndarray]   # [3,H,W] or None
    instance: Optional[jnp.ndarray]   # [3,H,W] or None
    all_map: Optional[jnp.ndarray]    # [5,H,W] or None
    plane_depth: Optional[jnp.ndarray]  # [H,W] or None
    final_T: jnp.ndarray          # [H,W]
    radii: jnp.ndarray            # [P]
    out_observe: jnp.ndarray      # [P] int32
    visible: jnp.ndarray          # [P] bool
    pairs_overflowed: jnp.ndarray  # [] bool: pair demand > max_pairs buffer
    k_overflowed: Optional[jnp.ndarray] = None   # [] bool: tier-2 big-splat
    #                       register exhausted (grow RasterConfig.big_splats)
    num_pairs: Optional[jnp.ndarray] = None      # [] int32 TRUE pair demand
    #                      (may exceed the buffer/point_list length when
    #                       pairs_overflowed; saturated at int32 max)
    num_big: Optional[jnp.ndarray] = None        # [] int32 TRUE big-splat
    #                       count (tier-2 demand; see binning.TileLists)


def _tile_pixel_coords(grid_x: int, grid_y: int, tile_h: int, tile_w: int):
    """Pixel (x, y) coordinates for every tile: two [n_tiles, tile_h*tile_w]
    float arrays."""
    n_tiles = grid_x * grid_y
    t = jnp.arange(n_tiles, dtype=jnp.int32)
    tx = (t % grid_x) * tile_w
    ty = (t // grid_x) * tile_h
    ix = jnp.arange(tile_w, dtype=jnp.int32)
    iy = jnp.arange(tile_h, dtype=jnp.int32)
    px = (tx[:, None, None] + ix[None, None, :]).astype(jnp.float32)
    py = (ty[:, None, None] + iy[None, :, None]).astype(jnp.float32)
    npx = tile_h * tile_w
    return (jnp.broadcast_to(px, (n_tiles, tile_h, tile_w)).reshape(n_tiles, npx),
            jnp.broadcast_to(py, (n_tiles, tile_h, tile_w)).reshape(n_tiles, npx))


def blend_tiles_xla(lists: TileLists, mean2d: jnp.ndarray, conic: jnp.ndarray,
                    opacity: jnp.ndarray, channels: jnp.ndarray,
                    grid_x: int, grid_y: int, cfg: RasterConfig):
    """Front-to-back alpha compositing over per-tile depth-sorted lists.

    Args:
      channels: [P, C] per-splat blend payload (C channels, any layout).
    Returns:
      (accum [n_tiles, C, npx], final_T [n_tiles, npx],
       observe [P] int32 pixel counts at T>0.5)
    """
    n_tiles = grid_x * grid_y
    npx = cfg.tile_h * cfg.tile_w
    P = mean2d.shape[0]
    C = channels.shape[1]
    CH = cfg.chunk
    n_chunks = cfg.max_splats_per_tile // CH
    list_len = lists.point_list.shape[0]

    px, py = _tile_pixel_coords(grid_x, grid_y, cfg.tile_h, cfg.tile_w)

    starts = lists.tile_starts
    counts = lists.tile_counts
    point_list = lists.point_list

    def step(carry, ci):
        T, done, accum, observe = carry
        base = ci * CH + jnp.arange(CH, dtype=jnp.int32)        # [CH]
        idx = starts[:, None] + base[None, :]                   # [n_tiles,CH]
        in_range = base[None, :] < counts[:, None]
        ids = point_list[jnp.clip(idx, 0, list_len - 1)]        # [n_tiles,CH]

        xy = mean2d[ids]                                        # [n_tiles,CH,2]
        co = conic[ids]                                         # [n_tiles,CH,3]
        op = opacity[ids]                                       # [n_tiles,CH]
        ch = channels[ids]                                      # [n_tiles,CH,C]

        dx = xy[..., 0:1] - px[:, None, :]                      # [n_tiles,CH,npx]
        dy = xy[..., 1:2] - py[:, None, :]
        power = (-0.5 * (co[..., 0:1] * dx * dx + co[..., 2:3] * dy * dy)
                 - co[..., 1:2] * dx * dy)
        alpha = jnp.minimum(ALPHA_MAX, op[..., None] * jnp.exp(power))
        m = in_range[..., None] & (power <= 0.0) & (alpha >= ALPHA_MIN)

        log1m = jnp.where(m, jnp.log1p(-alpha), 0.0)
        cum_incl = jnp.cumsum(log1m, axis=1)                    # over chunk splats
        T_incl = T[:, None, :] * jnp.exp(cum_incl)
        include = m & (T_incl >= T_EPS) & ~done[:, None, :]
        T_excl = T[:, None, :] * jnp.exp(cum_incl - log1m)
        w = jnp.where(include, alpha * T_excl, 0.0)             # [n_tiles,CH,npx]

        # HIGHEST: this path is the precision reference (the fused kernel
        # accumulates channels in bf16 MXU passes, ~3e-3; here exact f32)
        accum = accum + jnp.einsum('tsc,tsp->tcp', ch, w,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

        obs = jnp.sum((include & (T_excl > 0.5)).astype(jnp.int32), axis=-1)
        observe = observe.at[jnp.where(in_range, ids, P)].add(
            jnp.where(in_range, obs, 0), mode='drop')

        T = T * jnp.exp(jnp.sum(jnp.where(include, log1m, 0.0), axis=1))
        done = done | jnp.any(m & (T_incl < T_EPS), axis=1)
        return (T, done, accum, observe), None

    init = (jnp.ones((n_tiles, npx), jnp.float32),
            jnp.zeros((n_tiles, npx), jnp.bool_),
            jnp.zeros((n_tiles, C, npx), jnp.float32),
            jnp.zeros((P,), jnp.int32))
    (T, _, accum, observe), _ = jax.lax.scan(
        step, init, jnp.arange(n_chunks, dtype=jnp.int32))
    return accum, T, observe


def _untile(img_tiles: jnp.ndarray, grid_x: int, grid_y: int,
            tile_h: int, tile_w: int, H: int, W: int) -> jnp.ndarray:
    """[n_tiles, C, npx] -> [C, H, W] (crop the tile-grid padding)."""
    C = img_tiles.shape[1]
    x = img_tiles.reshape(grid_y, grid_x, C, tile_h, tile_w)
    x = x.transpose(2, 0, 3, 1, 4).reshape(C, grid_y * tile_h, grid_x * tile_w)
    return x[:, :H, :W]


def rasterize(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacity: jnp.ndarray,
    cam: RasterCamera,
    bg_color: jnp.ndarray,
    shs: Optional[jnp.ndarray] = None,
    sh_degree: int = 0,
    colors_precomp: Optional[jnp.ndarray] = None,
    language_feature: Optional[jnp.ndarray] = None,
    instance_feature: Optional[jnp.ndarray] = None,
    all_map: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    scale_modifier: float = 1.0,
    mean2d_offset: Optional[jnp.ndarray] = None,
    mean2d_abs_hook: Optional[jnp.ndarray] = None,
    cfg: RasterConfig = RasterConfig(),
) -> RenderOutput:
    """Full differentiable rasterization pass.

    Mirrors diff_LangSurf_rasterization.GaussianRasterizer
    (diff_LangSurf_rasterization/__init__.py:52-264): include_feature is
    implied by language_feature/instance_feature being not-None, render_geo
    by all_map being not-None.
    """
    H, W = cam.height, cam.width
    grid_x = (W + cfg.tile_w - 1) // cfg.tile_w
    grid_y = (H + cfg.tile_h - 1) // cfg.tile_h

    proc = preprocess(means3d, scales, quats, cam, shs=shs, sh_degree=sh_degree,
                      colors_precomp=colors_precomp, cov3d_precomp=cov3d_precomp,
                      scale_modifier=scale_modifier, tile_w=cfg.tile_w,
                      tile_h=cfg.tile_h, mean2d_offset=mean2d_offset,
                      opacity=opacity if cfg.opacity_aware_radius else None)
    cull = None
    if cfg.tile_cull:
        from .binning import CullSpec
        op_cull = jax.lax.stop_gradient(
            jnp.where(proc.visible, opacity.reshape(-1), 0.0))
        # +0.05 q-margin absorbs f32 evaluation differences between the
        # cull's component math and the kernel's bilinear form
        qmax = 2.0 * jnp.log(jnp.maximum(255.0 * op_cull, 1e-12)) + 0.05
        cull = CullSpec(mean2d=jax.lax.stop_gradient(proc.mean2d),
                        conic=jax.lax.stop_gradient(proc.conic),
                        qmax=qmax, tile_w=cfg.tile_w, tile_h=cfg.tile_h)

    use_ranks = cfg.depth_presort and cfg.payload_depth_rank
    if cfg.depth_presort:
        lists = build_tile_lists_depth_presort(
            proc, grid_x, grid_y, cfg.max_tiles_per_splat,
            max_pairs=cfg.max_pairs, big_splats=cfg.big_splats,
            return_ranks=use_ranks, cull=cull,
            packed_key=cfg.packed_sort)
    else:
        lists = build_tile_lists(proc, grid_x, grid_y,
                                 cfg.max_tiles_per_splat,
                                 max_pairs=cfg.max_pairs,
                                 big_splats=cfg.big_splats, cull=cull,
                                 extra_tiers=cfg.extra_tiers,
                                 rank_key=cfg.rank_key_sort,
                                 key_only=cfg.key_only_sort,
                                 compact=cfg.compact_sort,
                                 pallas_sort=cfg.pallas_sort)

    parts = [proc.rgb]
    if language_feature is not None:
        parts.append(language_feature)
    if instance_feature is not None:
        parts.append(instance_feature)
    if all_map is not None:
        parts.append(all_map)
    channels = jnp.concatenate(parts, axis=-1)

    # Opacity of invisible splats is zeroed so padded/culled entries never
    # contribute (they are also absent from tile lists).
    op = jnp.where(proc.visible, opacity.reshape(-1), 0.0)

    mean2d_b, conic_b, op_b, channels_b = (proc.mean2d, proc.conic, op,
                                           channels)
    hook_b = mean2d_abs_hook
    if use_ranks:
        # point_list carries depth ranks: permute every per-splat blend
        # input into depth order (autodiff scatters gradients back
        # through the gathers; the observe counter is un-permuted below)
        perm = lists.perm
        mean2d_b = proc.mean2d[perm]
        conic_b = proc.conic[perm]
        op_b = op[perm]
        channels_b = channels[perm]
        if hook_b is not None:
            hook_b = hook_b[perm]

    if cfg.resolve_pallas():
        from .rasterize_pallas import blend_tiles_pallas
        accum, T, observe = blend_tiles_pallas(
            lists, mean2d_b, conic_b, op_b, channels_b, grid_x, grid_y,
            cfg, mean2d_abs_hook=hook_b)
    else:
        # XLA path has no exact abs-gradient support; the trainer falls
        # back to |signed| (underestimates cancellation, threshold-safe)
        accum, T, observe = blend_tiles_xla(
            lists, mean2d_b, conic_b, op_b, channels_b, grid_x, grid_y, cfg)

    if use_ranks:
        # observe[r] belongs to splat perm[r]
        observe = jnp.zeros_like(observe).at[lists.perm].set(observe)

    imgs = _untile(accum, grid_x, grid_y, cfg.tile_h, cfg.tile_w, H, W)
    final_T = _untile(T[:, None, :], grid_x, grid_y, cfg.tile_h, cfg.tile_w, H, W)[0]

    c0 = 0
    color = imgs[c0:c0 + 3] + final_T[None] * bg_color[:, None, None]
    c0 += 3
    language = instance = out_all_map = plane_depth = None
    if language_feature is not None:
        language = imgs[c0:c0 + 3]
        c0 += 3
    if instance_feature is not None:
        instance = imgs[c0:c0 + 3]
        c0 += 3
    if all_map is not None:
        out_all_map = imgs[c0:c0 + 5]
        # plane depth via per-pixel ray intersection (forward.cu:425-429)
        xs = (jnp.arange(W, dtype=jnp.float32) - cam.cx) / cam.focal_x
        ys = (jnp.arange(H, dtype=jnp.float32) - cam.cy) / cam.focal_y
        denom = (out_all_map[0] * xs[None, :] + out_all_map[1] * ys[:, None]
                 + out_all_map[2] + 1e-8)
        plane_depth = out_all_map[4] / -denom

    return RenderOutput(color=color, language=language, instance=instance,
                        all_map=out_all_map, plane_depth=plane_depth,
                        final_T=final_T, radii=proc.radius,
                        out_observe=observe, visible=proc.visible,
                        pairs_overflowed=lists.overflowed,
                        k_overflowed=lists.k_overflowed,
                        num_pairs=lists.num_pairs,
                        num_big=lists.num_big)
