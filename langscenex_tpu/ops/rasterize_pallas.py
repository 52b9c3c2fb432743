"""Fused Pallas TPU kernel for the per-tile alpha-compositing blend.

Replaces the XLA scan in rasterize.blend_tiles_xla with a kernel that keeps
all per-(splat, pixel) intermediates in VMEM (the XLA path materializes
~[tiles, chunk, pixels] arrays to HBM every scan step). Semantics are
identical to the CUDA renderCUDA/render-backward pair
(cuda_rasterizer/forward.cu:273-431, backward.cu:400-678) in the vectorized
formulation proven equivalent in rasterize.py.

TPU mapping:
  - a tile is 8x128 pixels, flattened to 1024 lanes per row vector
  - the Gaussian falloff ``power`` is a rank-6 bilinear form: per-splat
    coefficients u(s) x per-pixel basis v(p) = [1, px, py, px^2, py^2,
    px*py], evaluated as one [S,8]x[8,1024]-style MXU contraction
  - front-to-back transmittance is a masked cumulative product computed in
    log space with an [S,S] lower-triangular ones matmul (MXU) instead of a
    sequential per-splat loop
  - channel accumulation is a [16,S]x[S,1024] matmul (MXU)
  - per-tile pair lists live in a 128-aligned segmented layout streamed
    from HBM with double-buffered DMA

The backward pass re-walks chunks in FORWARD order: the suffix sums needed
for d/dalpha are (total - inclusive prefix), with the total read from the
saved forward outputs — no reverse traversal (contrast backward.cu:458-678
which re-traverses back-to-front rebuilding suffix accumulators).

Exact absolute screen-gradients for densification (backward.cu:663-666) are
emitted as the cotangent of a zero "hook" input, mirroring the reference's
second screenspace tensor (gaussian_renderer/__init__.py:61-67).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TileLists

S_CHUNK = 128          # splats per chunk (lane-aligned)
TILE_H = 8
TILE_W = 128
NPX = TILE_H * TILE_W  # 1024 pixels per tile, flattened on the lane axis
ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
LOG_T_EPS = float(np.log(1e-4))


class AlignedPairs(NamedTuple):
    """128-aligned segmented pair layout (see build_aligned_pairs)."""
    ids: jnp.ndarray        # [A] int32 splat id per slot (-1 = padding)
    starts: jnp.ndarray     # [n_tiles] int32, multiples of 128
    counts: jnp.ndarray     # [n_tiles] int32 true per-tile counts
    slot_tile: jnp.ndarray  # [A] int32 tile index of every slot


def aligned_capacity(list_len: int, n_tiles: int) -> int:
    return ((list_len + 127) // 128) * 128 + 128 * n_tiles


def _segment_lookup(boundary_pos: jnp.ndarray, values: jnp.ndarray,
                    length: int) -> jnp.ndarray:
    """For segments starting at ``boundary_pos`` (sorted, possibly equal for
    empty segments) carrying nondecreasing ``values``, return the per-index
    effective value over [0, length): a 360-element max-scatter + cummax.

    This replaces searchsorted-based lookups, which XLA compiles to while
    loops with pathological fusions at this scale (measured ~110ms for 1.6M
    queries vs ~0.05ms for this formulation).
    """
    init = jnp.full((length,), jnp.iinfo(jnp.int32).min, jnp.int32)
    markers = init.at[jnp.clip(boundary_pos, 0, length - 1)].max(values)
    return jax.lax.cummax(markers, axis=0)


def build_aligned_pairs(lists: TileLists, n_tiles: int) -> AlignedPairs:
    """Repack the (tile,depth)-sorted pair list into per-tile segments whose
    starts are 128-aligned so kernel DMA slices land on native tiles."""
    list_len = lists.point_list.shape[0]
    A = aligned_capacity(list_len, n_tiles)
    counts = lists.tile_counts
    aligned_counts = ((counts + 127) // 128) * 128
    starts = jnp.concatenate([
        jnp.zeros(1, jnp.int32),
        jnp.cumsum(aligned_counts)[:-1].astype(jnp.int32)])

    # effective per-pair segment values (empty tiles collide at the same
    # boundary; max picks the live one — its end/start dominate)
    pos = jnp.arange(list_len, dtype=jnp.int32)
    tstart_of = _segment_lookup(lists.tile_starts, lists.tile_starts, list_len)
    tend_of = _segment_lookup(lists.tile_starts,
                              lists.tile_starts + counts, list_len)
    astart_of = _segment_lookup(lists.tile_starts, starts, list_len)
    rank = pos - tstart_of
    valid = pos < tend_of
    dst = jnp.where(valid, astart_of + rank, A)
    ids = jnp.full((A,), -1, jnp.int32).at[dst].set(
        lists.point_list, mode='drop')

    slot_tile = jnp.clip(
        _segment_lookup(starts, jnp.arange(n_tiles, dtype=jnp.int32), A),
        0, n_tiles - 1)
    return AlignedPairs(ids=ids, starts=starts, counts=counts,
                        slot_tile=slot_tile)


# ------------------------------------------------------------------ kernels

# Pixel coordinates inside the kernel are TILE-CENTER-RELATIVE: the bilinear
# power expansion u(s).v(p) suffers catastrophic f32 cancellation with
# global pixel coordinates (px^2 ~ 5e5 vs |power| <= ~10); local coords keep
# every term below ~1e4. The splat means are shifted by the same per-tile
# offset on the host side (blend_tiles_pallas).
CENTER_X = 64.0
CENTER_Y = 4.0


def _pixel_basis(tile_idx, grid_x):
    """v(p): [8, NPX] rows = [1, px, py, px^2, py^2, px*py, 0, 0] in
    tile-center-relative coords, pixels flattened y-major
    (p = y*TILE_W + x) to match rasterize._untile."""
    del tile_idx, grid_x  # local coords are tile-independent
    l = jax.lax.broadcasted_iota(jnp.int32, (1, NPX), 1)
    px = (l % TILE_W).astype(jnp.float32) - CENTER_X
    py = (l // TILE_W).astype(jnp.float32) - CENTER_Y
    one = jnp.ones((1, NPX), jnp.float32)
    zero = jnp.zeros((1, NPX), jnp.float32)
    return jnp.concatenate([one, px, py, px * px, py * py, px * py,
                            zero, zero], axis=0)


def _lower_tri():
    r = jax.lax.broadcasted_iota(jnp.int32, (S_CHUNK, S_CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (S_CHUNK, S_CHUNK), 1)
    return (c <= r).astype(jnp.float32)   # inclusive lower triangle


def _chunk_state(u_chunk, v, remaining, carry_log, done):
    """Shared forward recurrence for one chunk of S_CHUNK splats.
    u_chunk: [8, S] rows u0..u5, opacity, pad."""
    power = jax.lax.dot_general(
        u_chunk[:6], v[:6], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [S, NPX]
    op = jax.lax.transpose(u_chunk[6:7], (1, 0))               # [S, 1]
    ealpha = op * jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, ealpha)
    row = jax.lax.broadcasted_iota(jnp.int32, (S_CHUNK, 1), 0)
    m = (row < remaining) & (power <= 0.0) & (alpha >= ALPHA_MIN)
    log1m = jnp.where(m, jnp.log1p(-alpha), 0.0)
    cum = jax.lax.dot_general(_lower_tri(), log1m,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    log_T_incl = carry_log + cum                               # [S, NPX]
    include = m & (log_T_incl >= LOG_T_EPS) & (done < 0.5)
    T_excl = jnp.exp(log_T_incl - log1m)
    w = jnp.where(include, alpha * T_excl, 0.0)
    new_carry = carry_log + jnp.sum(jnp.where(include, log1m, 0.0),
                                    axis=0, keepdims=True)
    new_done = jnp.maximum(
        done, jnp.max(jnp.where(m & (log_T_incl < LOG_T_EPS), 1.0, 0.0),
                      axis=0, keepdims=True))
    return power, ealpha, alpha, include, T_excl, w, new_carry, new_done


def _fwd_kernel(starts_ref, counts_ref, grid_x_ref,
                u_hbm, ch_hbm, img_ref, obs_hbm,
                u_buf, ch_buf, obs_buf, acc_ref, carry_ref, done_ref,
                in_sems, obs_sem):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    v = _pixel_basis(t, grid_x_ref[0])
    n_chunks = pl.cdiv(count, S_CHUNK)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    carry_ref[...] = jnp.zeros_like(carry_ref)
    done_ref[...] = jnp.zeros_like(done_ref)

    def dma_in(slot, ci):
        off = pl.multiple_of(start + ci * S_CHUNK, S_CHUNK)
        return (pltpu.make_async_copy(u_hbm.at[:, pl.ds(off, S_CHUNK)],
                                      u_buf.at[slot], in_sems.at[slot, 0]),
                pltpu.make_async_copy(ch_hbm.at[:, pl.ds(off, S_CHUNK)],
                                      ch_buf.at[slot], in_sems.at[slot, 1]))

    @pl.when(n_chunks > 0)
    def _():
        for d in dma_in(0, 0):
            d.start()

        def body(ci, _):
            slot = ci % 2

            @pl.when(ci + 1 < n_chunks)
            def _():
                for d in dma_in((ci + 1) % 2, ci + 1):
                    d.start()
            for d in dma_in(slot, ci):
                d.wait()

            (power, ealpha, alpha, include, T_excl, w,
             new_carry, new_done) = _chunk_state(
                u_buf[slot], v, count - ci * S_CHUNK, carry_ref[...],
                done_ref[...])

            acc_ref[...] += jax.lax.dot_general(
                ch_buf[slot], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [16,S]x[S,NPX]

            obs = jnp.sum(jnp.where(include & (T_excl > 0.5), 1.0, 0.0),
                          axis=1, keepdims=True)      # [S, 1]
            obs_buf[...] = jax.lax.transpose(obs, (1, 0))
            obs_dma = pltpu.make_async_copy(
                obs_buf,
                obs_hbm.at[pl.ds((start + ci * S_CHUNK) // S_CHUNK, 1), :],
                obs_sem)
            obs_dma.start()
            carry_ref[...] = new_carry
            done_ref[...] = new_done
            obs_dma.wait()
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    img_ref[0, 0:16] = acc_ref[...]
    img_ref[0, 16:17] = jnp.exp(carry_ref[...])
    img_ref[0, 17:18] = done_ref[...]


def _blend_fwd_impl(u_t, ch_t, starts, counts, grid_x: int, n_tiles: int):
    A = u_t.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, 18, NPX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, S_CHUNK), jnp.float32),
            pltpu.VMEM((2, 16, S_CHUNK), jnp.float32),
            pltpu.VMEM((1, S_CHUNK), jnp.float32),
            pltpu.VMEM((16, NPX), jnp.float32),
            pltpu.VMEM((1, NPX), jnp.float32),
            pltpu.VMEM((1, NPX), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA,
        ])
    img, obs = pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 18, NPX), jnp.float32),
            jax.ShapeDtypeStruct((A // S_CHUNK, S_CHUNK), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, counts, jnp.array([grid_x], jnp.int32), u_t, ch_t)
    return img, obs


def _bwd_kernel(starts_ref, counts_ref, grid_x_ref,
                u_hbm, ch_hbm, geom_hbm, gimg_ref, img_ref,
                packed_hbm,
                u_buf, ch_buf, geom_buf, out_buf,
                carry_ref, done_ref, tot_ref,
                in_sems, out_sem):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    v = _pixel_basis(t, grid_x_ref[0])
    n_chunks = pl.cdiv(count, S_CHUNK)

    carry_ref[...] = jnp.zeros_like(carry_ref)
    done_ref[...] = jnp.zeros_like(done_ref)

    g = gimg_ref[0, 0:16]                            # [16, NPX]
    g_T = gimg_ref[0, 16:17]                         # [1, NPX]
    T_final = img_ref[0, 16:17]
    acc = img_ref[0, 0:16]
    tot_ref[...] = jnp.sum(acc * g, axis=0, keepdims=True)

    def dma_in(slot, ci):
        off = pl.multiple_of(start + ci * S_CHUNK, S_CHUNK)
        return (pltpu.make_async_copy(u_hbm.at[:, pl.ds(off, S_CHUNK)],
                                      u_buf.at[slot], in_sems.at[slot, 0]),
                pltpu.make_async_copy(ch_hbm.at[:, pl.ds(off, S_CHUNK)],
                                      ch_buf.at[slot], in_sems.at[slot, 1]),
                pltpu.make_async_copy(geom_hbm.at[:, pl.ds(off, S_CHUNK)],
                                      geom_buf.at[slot], in_sems.at[slot, 2]))

    @pl.when(n_chunks > 0)
    def _():
        for d in dma_in(0, 0):
            d.start()

        def body(ci, prefix_carry):
            slot = ci % 2

            @pl.when(ci + 1 < n_chunks)
            def _():
                for d in dma_in((ci + 1) % 2, ci + 1):
                    d.start()
            for d in dma_in(slot, ci):
                d.wait()

            u_chunk = u_buf[slot]
            ch_chunk = ch_buf[slot]
            geom = geom_buf[slot]                    # [8,S]: xs ys a b c
            (power, ealpha, alpha, include, T_excl, w,
             new_carry, new_done) = _chunk_state(
                u_chunk, v, count - ci * S_CHUNK, carry_ref[...],
                done_ref[...])

            chg = jax.lax.dot_general(
                ch_chunk, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [S, NPX]
            contrib = w * chg
            prefix = jax.lax.dot_general(
                _lower_tri(), contrib, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + prefix_carry
            suffix = tot_ref[...] - prefix            # strict suffix
            one_m_a = jnp.maximum(1.0 - alpha, 1e-6)
            dalpha = jnp.where(
                include,
                T_excl * chg - (suffix + T_final * g_T) / one_m_a,
                0.0)
            not_clamped = (ealpha < ALPHA_MAX).astype(jnp.float32)
            dpower = dalpha * alpha * not_clamped
            dop = dalpha * jnp.exp(power) * not_clamped

            du = jax.lax.dot_general(
                dpower, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [S, 8]
            dop_sum = jnp.sum(dop, axis=1, keepdims=True)
            col = jax.lax.broadcasted_iota(jnp.int32, (S_CHUNK, 8), 1)
            du = jnp.where(col < 6, du, jnp.where(col == 6, dop_sum, 0.0))

            dch = jax.lax.dot_general(
                g, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [16, S]

            # exact abs screen grads (backward.cu:663-666 semantics)
            xsT = jax.lax.transpose(geom[0:1], (1, 0))  # [S,1]
            ysT = jax.lax.transpose(geom[1:2], (1, 0))
            aT = jax.lax.transpose(geom[2:3], (1, 0))
            bT = jax.lax.transpose(geom[3:4], (1, 0))
            cT = jax.lax.transpose(geom[4:5], (1, 0))
            dx = xsT - v[1:2]
            dy = ysT - v[2:3]
            dmx = dpower * (-(aT * dx + bT * dy))
            dmy = dpower * (-(cT * dy + bT * dx))
            absx = jnp.sum(jnp.abs(dmx), axis=1, keepdims=True)
            absy = jnp.sum(jnp.abs(dmy), axis=1, keepdims=True)
            dabs = jnp.where(col == 0, absx, jnp.where(col == 1, absy, 0.0))

            out_buf[0, 0:8] = jax.lax.transpose(du, (1, 0))
            out_buf[0, 8:24] = dch
            out_buf[0, 24:32] = jax.lax.transpose(dabs, (1, 0))
            odma = pltpu.make_async_copy(
                out_buf,
                packed_hbm.at[:, :, pl.ds(
                    pl.multiple_of(start + ci * S_CHUNK, S_CHUNK), S_CHUNK)],
                out_sem)
            odma.start()

            carry_ref[...] = new_carry
            done_ref[...] = new_done
            new_prefix = prefix_carry + jnp.sum(contrib, axis=0, keepdims=True)
            odma.wait()
            return new_prefix

        jax.lax.fori_loop(0, n_chunks, body,
                          jnp.zeros((1, NPX), jnp.float32))


def _blend_bwd_impl(u_t, ch_t, geom_t, starts, counts, img, gimg,
                    grid_x: int, n_tiles: int):
    A = u_t.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, 18, NPX), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 18, NPX), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, 8, S_CHUNK), jnp.float32),
            pltpu.VMEM((2, 16, S_CHUNK), jnp.float32),
            pltpu.VMEM((2, 8, S_CHUNK), jnp.float32),
            pltpu.VMEM((1, 32, S_CHUNK), jnp.float32),
            pltpu.VMEM((1, NPX), jnp.float32),
            pltpu.VMEM((1, NPX), jnp.float32),
            pltpu.VMEM((1, NPX), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA,
        ])
    packed, = pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, 32, A), jnp.float32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, counts, jnp.array([grid_x], jnp.int32),
      u_t, ch_t, geom_t, gimg, img)
    return packed[0, 0:8], packed[0, 8:24], packed[0, 24:32]


# ------------------------------------------------- custom-vjp pair blend

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def blend_pairs(u_t, ch_t, geom_t, abs_hook, starts, counts,
                grid_x, n_tiles):
    """(img [n_tiles,18,NPX], obs [A/128,128]) from pair arrays.

    u_t [8,A]: u0..u5, opacity, 0. ch_t [16,A]: blend channels (padded).
    geom_t [8,A]: xs, ys, a, b, c (backward-only). abs_hook [A,2]: zeros;
    its cotangent carries the exact abs screen-gradients.
    """
    return _blend_fwd_impl(u_t, ch_t, starts, counts, grid_x, n_tiles)


def _bp_fwd(u_t, ch_t, geom_t, abs_hook, starts, counts, grid_x, n_tiles):
    img, obs = _blend_fwd_impl(u_t, ch_t, starts, counts, grid_x, n_tiles)
    return (img, obs), (u_t, ch_t, geom_t, starts, counts, img)


def _bp_bwd(grid_x, n_tiles, res, cot):
    u_t, ch_t, geom_t, starts, counts, img = res
    gimg, _ = cot
    du, dch, dabs = _blend_bwd_impl(u_t, ch_t, geom_t, starts, counts,
                                    img, gimg, grid_x, n_tiles)
    dhook = jax.lax.transpose(dabs[0:2], (1, 0))
    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (du, dch, jnp.zeros_like(geom_t), dhook, f0(starts), f0(counts))


blend_pairs.defvjp(_bp_fwd, _bp_bwd)


# --------------------------------------------------------- outer wrapper

def blend_tiles_pallas(lists: TileLists, mean2d, conic, opacity, channels,
                       grid_x: int, grid_y: int, cfg,
                       mean2d_abs_hook=None):
    """Drop-in replacement for blend_tiles_xla (same return contract) using
    the fused kernel. Requires cfg.tile_w == 128 and cfg.tile_h == 8.

    ``mean2d_abs_hook``: optional [P,2] zeros whose gradient receives the
    per-splat summed |screen gradient| (pixel units)."""
    assert cfg.tile_w == TILE_W and cfg.tile_h == TILE_H, \
        "pallas blend requires 8x128 tiles"
    n_tiles = grid_x * grid_y
    P = mean2d.shape[0]
    C = channels.shape[1]
    assert C <= 16

    ap = build_aligned_pairs(lists, n_tiles)
    ids = ap.ids
    pad = ids < 0
    safe = jnp.where(pad, 0, ids)

    # tile-center-relative splat coordinates per slot (see _pixel_basis)
    tile_cx = (ap.slot_tile % grid_x).astype(jnp.float32) * TILE_W + CENTER_X
    tile_cy = (ap.slot_tile // grid_x).astype(jnp.float32) * TILE_H + CENTER_Y
    a = conic[safe, 0]
    b = conic[safe, 1]
    c = conic[safe, 2]
    xs = mean2d[safe, 0] - tile_cx
    ys = mean2d[safe, 1] - tile_cy
    op = opacity[safe]
    zero = jnp.zeros_like(a)
    u = jnp.stack([
        -0.5 * a * xs * xs - 0.5 * c * ys * ys - b * xs * ys,
        a * xs + b * ys,
        c * ys + b * xs,
        -0.5 * a, -0.5 * c, -b,
        op, zero], axis=0)                            # [8, A]
    u_t = jnp.where(pad[None, :], 0.0, u)

    ch16 = jnp.concatenate(
        [channels, jnp.zeros((P, 16 - C), channels.dtype)], axis=1) \
        if C < 16 else channels
    ch_t = jnp.where(pad[None, :], 0.0, ch16.T[:, safe])

    geom = jnp.stack([xs, ys, a, b, c, zero, zero, zero], axis=0)
    geom_t = jax.lax.stop_gradient(jnp.where(pad[None, :], 0.0, geom))

    if mean2d_abs_hook is None:
        hook = jnp.zeros((ids.shape[0], 2), jnp.float32)
    else:
        hook = jnp.where(pad[:, None], 0.0, mean2d_abs_hook[safe])

    img, obs = blend_pairs(u_t, ch_t, geom_t, hook, ap.starts, ap.counts,
                           grid_x, n_tiles)

    accum = img[:, :C, :]
    T = img[:, 16, :]
    obs_flat = jax.lax.stop_gradient(obs).reshape(-1)
    obs_idx = jnp.where(pad, P, ids)
    observe = jnp.zeros((P,), jnp.int32).at[obs_idx].add(
        obs_flat.astype(jnp.int32), mode='drop')
    return accum, T, observe
