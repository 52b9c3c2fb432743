"""Fused Pallas TPU kernel for the per-tile alpha-compositing blend.

Replaces the XLA scan in rasterize.blend_tiles_xla with a kernel that keeps
all per-(splat, pixel) intermediates in VMEM (the XLA path materializes
~[tiles, chunk, pixels] arrays to HBM every scan step). Semantics are
identical to the CUDA renderCUDA/render-backward pair
(cuda_rasterizer/forward.cu:273-431, backward.cu:400-678) in the vectorized
formulation proven equivalent in rasterize.py.

TPU mapping:
  - a tile is 8x128 pixels, flattened to 1024 lanes per row vector
  - per-splat data travels as [A/128, 24, 128] chunk blocks in the
    [rows, splats] math layout (rows: xs ys a b c opacity ch0..15),
    built by one row gather + batched 128x24 transposes — the global
    [A,24]->[24,A] XLA transpose measured ~8 ms of the 29 ms forward,
    and per-component lane gathers ~16 ms each at A~1.6M. Lane dim 128
    keeps the HBM memref unpadded (Mosaic lane-pads a trailing dim of
    24 to 128, quadrupling footprint) and chunk DMAs tile-aligned
  - the Gaussian falloff ``power`` is evaluated per chunk as a rank-6
    bilinear form u(s).v(p) on the MXU, with u computed IN-KERNEL from the
    raw rows in tile-center-relative coordinates (f32 cancellation: global
    pixel coords put px^2 ~ 5e5 against |power| <= ~10)
  - front-to-back transmittance is a masked cumulative product in log
    space via an [S,S] lower-triangular ones matmul (MXU)
  - channel accumulation is a [16,S]x[S,1024] matmul (MXU)
  - per-tile segments are 128-aligned so chunk DMA slices land on native
    tiles; segment lookup tables use marker-scatter + cummax (searchsorted
    compiles to pathological ~110ms while loops at this scale)

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
NPX = 1024             # pixels per tile, flattened on the lane axis; the
                       # tile SHAPE (tile_h x tile_w, product 1024) is a
                       # free parameter — pixel coordinates are DATA in
                       # the falloff bilinear form, not layout, so square
                       # 32x32 tiles (fewer tile-overlap pairs for round
                       # splats) cost nothing in the kernel itself
ROWS = 24              # payload rows: 6 geom + 16 channels + 2 pad; the
                       # bwd packs exactly 24 (6 geom + 16 dch + 2 abs).
                       # 24 = 3 sublane tiles; vs 32 it cuts gather +
                       # chunk-DMA traffic 25%
ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
LOG_T_EPS = float(np.log(1e-4))
T_EPS = 1e-4


class AlignedPairs(NamedTuple):
    """128-aligned segmented pair layout (see build_aligned_pairs)."""
    src: jnp.ndarray        # [A] int32 index into the sorted pair list
                            #     (== list_len for padding slots)
    ids: jnp.ndarray        # [A] int32 splat id per slot (-1 = padding)
    starts: jnp.ndarray     # [n_tiles] int32, multiples of 128
    counts: jnp.ndarray     # [n_tiles] int32 true per-tile counts


def aligned_capacity(list_len: int, n_tiles: int) -> int:
    return ((list_len + 127) // 128) * 128 + 128 * n_tiles


def _segment_lookup(boundary_pos: jnp.ndarray, values: jnp.ndarray,
                    length: int) -> jnp.ndarray:
    """Per-index effective segment value over [0, length) for segments
    starting at ``boundary_pos`` (sorted, may repeat for empty segments)
    with nondecreasing ``values``: max-scatter of markers + cummax."""
    init = jnp.full((length,), jnp.iinfo(jnp.int32).min, jnp.int32)
    markers = init.at[jnp.clip(boundary_pos, 0, length - 1)].max(values)
    return jax.lax.cummax(markers, axis=0)


def build_aligned_pairs(lists: TileLists, n_tiles: int) -> AlignedPairs:
    """Map aligned slots -> sorted-pair positions (gather formulation: no
    big scatter; per-slot maps come from cummax segment lookups).

    Measured caveat (experiments/ab_forward.py, v5e, 100k splats): a
    chunk-granularity variant (scan over A/128 elements + [A/128,128]
    broadcasting) looked strictly cheaper in isolation but regressed the
    END-TO-END forward 29.2 -> 38.2 ms (barriers didn't help) — XLA fuses
    this per-slot form into the downstream gather better. Tune only
    against the full forward."""
    list_len = lists.point_list.shape[0]
    A = aligned_capacity(list_len, n_tiles)
    counts = lists.tile_counts
    aligned_counts = ((counts + 127) // 128) * 128
    starts = jnp.concatenate([
        jnp.zeros(1, jnp.int32),
        jnp.cumsum(aligned_counts)[:-1].astype(jnp.int32)])

    slot = jnp.arange(A, dtype=jnp.int32)
    # per-slot: the aligned start and the sorted start/end of its tile
    astart_of = _segment_lookup(starts, starts, A)
    tstart_of = _segment_lookup(starts, lists.tile_starts, A)
    tend_of = _segment_lookup(starts, lists.tile_starts + counts, A)
    rank = slot - astart_of
    src = tstart_of + rank
    valid = src < tend_of
    src = jnp.where(valid, src, list_len)
    ids = jnp.where(valid,
                    jnp.take(lists.point_list, jnp.minimum(src, list_len - 1),
                             mode='clip'),
                    -1)
    return AlignedPairs(src=src, ids=ids, starts=starts, counts=counts)


# ------------------------------------------------------------------ kernels

def _pixel_basis(tile_w: int, tile_h: int):
    """v(p): [8, NPX] rows = [1, px, py, px^2, py^2, px*py, 0, 0] in
    tile-center-relative coords, pixels flattened y-major
    (p = y*tile_w + x) to match rasterize._untile."""
    l = jax.lax.broadcasted_iota(jnp.int32, (1, NPX), 1)
    px = (l % tile_w).astype(jnp.float32) - (tile_w // 2)
    py = (l // tile_w).astype(jnp.float32) - (tile_h // 2)
    one = jnp.ones((1, NPX), jnp.float32)
    zero = jnp.zeros((1, NPX), jnp.float32)
    return jnp.concatenate([one, px, py, px * px, py * py, px * py,
                            zero, zero], axis=0)


def _lower_tri():
    r = jax.lax.broadcasted_iota(jnp.int32, (S_CHUNK, S_CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (S_CHUNK, S_CHUNK), 1)
    return (c <= r).astype(jnp.float32)   # inclusive lower triangle


def _cumsum_sublane(x):
    """Exact f32 inclusive prefix sum along axis 0 via log-step
    roll+add (Mosaic lowers neither cumsum nor f32-exact triangular
    matmuls: the MXU truncates operands to bf16 passes by default, which
    measurably diverges the T recurrence under deep overdraw)."""
    n = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    k = 1
    while k < n:
        shifted = pltpu.roll(x, k, 0)
        x = x + jnp.where(row >= k, shifted, 0.0)
        k *= 2
    return x


def _cumprod_sublane(x):
    """f32 inclusive prefix product along axis 0 (log-step roll+mul)."""
    n = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    k = 1
    while k < n:
        shifted = pltpu.roll(x, k, 0)
        x = x * jnp.where(row >= k, shifted, 1.0)
        k *= 2
    return x


def _local_u(raw, tile_cx, tile_cy):
    """u rows [6, S] + (xsl, ysl, a, b, c, op) from raw payload [32, S] in
    tile-center-relative coordinates."""
    xsl = raw[0:1] - tile_cx
    ysl = raw[1:2] - tile_cy
    a, b, c = raw[2:3], raw[3:4], raw[4:5]
    u = jnp.concatenate([
        -0.5 * a * xsl * xsl - 0.5 * c * ysl * ysl - b * xsl * ysl,
        a * xsl + b * ysl,
        c * ysl + b * xsl,
        -0.5 * a, -0.5 * c, -b], axis=0)
    return u, xsl, ysl, a, b, c


POWER_VPU = True       # falloff Q(d) evaluated directly on the VPU
#                        (exact f32 broadcasts) instead of the rank-6
#                        u.v MXU bilinear form: at K=6 the contraction
#                        pads to 128 AND runs 6 HIGHEST passes — ~11
#                        broadcast VPU passes are cheaper and exacter
PREFIX_MXU = False     # transmittance prefix via HIGHEST triangular
#                        matmul instead of the 7-step roll+add chain
#                        (measured slower: see KERNELS.md 11b)
LINEAR_T = False       # transmittance recurrence in LINEAR domain (the
#                        CUDA loop's own form, forward.cu:335-430:
#                        T *= 1-alpha): the masked prefix is a roll+mul
#                        cumprod and the carry a running min of T_incl —
#                        deletes the log1p and the T_excl exp.
#                        MEASURED NEUTRAL on device (21.47 vs 21.57 ms
#                        fwd, 33.70 vs 33.77 ms fwd+bwd at 100k/720x480;
#                        experiments/ab_linear_t.py): the VPU chain is
#                        bound by the roll+mul/add prefix itself, not the
#                        two transcendentals. Default stays log-domain —
#                        bit-matched to ops/rasterize.py's XLA form.


def _chunk_state(raw, v, tile_cx, tile_cy, remaining, carry, done, lo=None):
    """Shared forward recurrence for one chunk of S_CHUNK splats.

    ``carry`` is per-pixel transmittance state entering the chunk: T
    itself under LINEAR_T, log T otherwise. ``lo``: first row of this
    chunk that belongs to the current tile (align-free segments start
    mid-chunk; rows < lo are the PREVIOUS tile's pairs and are masked
    out exactly like rows >= remaining). Returns
    (e, ealpha, alpha, include, T_excl, w, new_carry, new_done) with
    e = exp(power) so the backward reuses it for d/d(opacity)."""
    u, xsl, ysl, a, b, c = _local_u(raw, tile_cx, tile_cy)
    if POWER_VPU:
        # direct f32 evaluation: dx,dy are tile-center-relative deltas
        xsT = jax.lax.transpose(xsl, (1, 0))               # [S, 1]
        ysT = jax.lax.transpose(ysl, (1, 0))
        aT = jax.lax.transpose(a, (1, 0))
        bT = jax.lax.transpose(b, (1, 0))
        cT = jax.lax.transpose(c, (1, 0))
        dx = xsT - v[1:2]                                  # [S, NPX]
        dy = ysT - v[2:3]
        power = (-0.5 * (aT * dx * dx + cT * dy * dy)
                 - bT * (dx * dy))                         # [S, NPX]
    else:
        # HIGHEST: TPU matmuls default to bf16 passes; px^2 ~ 4e3
        # truncated to bf16 gives |power| errors O(0.1) that compound
        # through the T recurrence over deep overdraw (measured 0.25 abs
        # color divergence vs the f32 XLA path at 20k splats)
        power = jax.lax.dot_general(
            u, v[:6], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # [S, NPX]
    op = jax.lax.transpose(raw[5:6], (1, 0))                   # [S, 1]
    e = jnp.exp(power)
    ealpha = op * e
    alpha = jnp.minimum(ALPHA_MAX, ealpha)
    row = jax.lax.broadcasted_iota(jnp.int32, (S_CHUNK, 1), 0)
    m = (row < remaining) & (power <= 0.0) & (alpha >= ALPHA_MIN)
    if lo is not None:
        m = m & (row >= lo)
    if LINEAR_T:
        # T *= (1 - alpha) with masked rows contributing factor 1; the
        # exclusive prefix product comes from an extra 1-row roll before
        # the inclusive cumprod. Included rows are a PREFIX of the m
        # rows (T_incl is non-increasing, so once it crosses T_EPS no
        # later row is included) — the chunk-exit carry is therefore the
        # running min of T_incl over included rows, which is
        # self-consistent with the prefix by construction (no separate
        # reduction rounding).
        f = jnp.where(m, 1.0 - alpha, 1.0)
        fsh = jnp.where(row >= 1, pltpu.roll(f, 1, 0), 1.0)
        T_excl = carry * _cumprod_sublane(fsh)                 # [S, NPX]
        T_incl = T_excl * f
        include = m & (T_incl >= T_EPS) & (done < 0.5)
        w = jnp.where(include, alpha * T_excl, 0.0)
        new_carry = jnp.min(jnp.where(include, T_incl, carry),
                            axis=0, keepdims=True)
        new_done = jnp.maximum(
            done, jnp.max(jnp.where(m & (T_incl < T_EPS), 1.0, 0.0),
                          axis=0, keepdims=True))
        return e, ealpha, alpha, include, T_excl, w, new_carry, new_done
    log1m = jnp.where(m, jnp.log1p(-alpha), 0.0)
    if PREFIX_MXU:
        # inclusive prefix as tril @ log1m at HIGHEST (3-pass f32
        # emulation, abs error ~1e-5 on |log1m|<=9 vs the bf16 default's
        # O(0.1) divergence)
        cum = jax.lax.dot_general(
            _lower_tri(), log1m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    else:
        # exact f32 inclusive prefix on the VPU
        cum = _cumsum_sublane(log1m)
    log_T_incl = carry + cum                                   # [S, NPX]
    include = m & (log_T_incl >= LOG_T_EPS) & (done < 0.5)
    T_excl = jnp.exp(log_T_incl - log1m)
    w = jnp.where(include, alpha * T_excl, 0.0)
    new_carry = carry + jnp.sum(jnp.where(include, log1m, 0.0),
                                axis=0, keepdims=True)
    new_done = jnp.maximum(
        done, jnp.max(jnp.where(m & (log_T_incl < LOG_T_EPS), 1.0, 0.0),
                      axis=0, keepdims=True))
    return e, ealpha, alpha, include, T_excl, w, new_carry, new_done


def _tile_center(t, grid_x, tile_w: int, tile_h: int):
    cx = ((t % grid_x) * tile_w + tile_w // 2).astype(jnp.float32)
    cy = ((t // grid_x) * tile_h + tile_h // 2).astype(jnp.float32)
    return cx, cy


def _fwd_kernel(starts_ref, counts_ref, grid_x_ref,
                pay_hbm, img_ref, obs_hbm,
                pay_buf, obs_buf, obs_prev, acc_ref, carry_ref, done_ref,
                in_sems, obs_sem, *, tile_w: int, tile_h: int):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    tile_cx, tile_cy = _tile_center(t, grid_x_ref[0], tile_w, tile_h)
    v = _pixel_basis(tile_w, tile_h)
    # align-free segments: a tile's pairs start mid-chunk at row ``head``
    # of chunk ``base_c`` (aligned callers pass 128-multiple starts and
    # head == 0 — the same kernel serves both layouts)
    base_c = start // S_CHUNK
    head = start - base_c * S_CHUNK
    n_chunks = pl.cdiv(head + count, S_CHUNK)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, S_CHUNK), 1)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    carry_ref[...] = (jnp.ones_like(carry_ref) if LINEAR_T
                      else jnp.zeros_like(carry_ref))
    done_ref[...] = jnp.zeros_like(done_ref)

    def dma_in(slot, ci):
        # pay_hbm is [A/128, ROWS, 128]: per-chunk blocks already in the
        # [ROWS, 128] math layout (built by a batched 128x24 transpose on
        # the XLA side — the full [A,24]->[24,A] transpose measured ~8 ms
        # of the 29 ms forward, experiments/ab_forward5). Lane dim 128
        # keeps the HBM memref unpadded and DMA slices tile-aligned.
        return pltpu.make_async_copy(pay_hbm.at[pl.ds(base_c + ci, 1)],
                                     pay_buf.at[slot], in_sems.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        dma_in(0, 0).start()
        # the first chunk may be shared with the PREVIOUS tile (head>0):
        # its rows < head were already written — read-merge them (grid
        # steps run sequentially on the core, so the previous tile's
        # write has retired)
        @pl.when(head > 0)
        def _():
            rmw = pltpu.make_async_copy(obs_hbm.at[pl.ds(base_c, 1), :],
                                        obs_prev, obs_sem)
            rmw.start()
            rmw.wait()

        def cond(state):
            ci, all_done = state
            return (ci < n_chunks) & (all_done < 0.5)

        def body(state):
            ci, _ = state
            slot = ci % 2

            @pl.when(ci + 1 < n_chunks)
            def _():
                dma_in((ci + 1) % 2, ci + 1).start()
            dma_in(slot, ci).wait()

            raw = pay_buf[slot, 0]
            (_, _, _, include, T_excl, w,
             new_carry, new_done) = _chunk_state(
                raw, v, tile_cx, tile_cy, head + count - ci * S_CHUNK,
                carry_ref[...], done_ref[...], lo=head - ci * S_CHUNK)

            acc_ref[...] += jax.lax.dot_general(
                raw[6:22], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [16,S]x[S,NPX]

            obs = jnp.sum(jnp.where(include & (T_excl > 0.5), 1.0, 0.0),
                          axis=1, keepdims=True)      # [S, 1]
            obs_row = jax.lax.transpose(obs, (1, 0))
            obs_buf[...] = jnp.where((ci == 0) & (lane < head),
                                     obs_prev[...], obs_row)
            obs_dma = pltpu.make_async_copy(
                obs_buf, obs_hbm.at[pl.ds(base_c + ci, 1), :], obs_sem)
            obs_dma.start()
            carry_ref[...] = new_carry
            done_ref[...] = new_done
            obs_dma.wait()
            # whole-tile early exit once every pixel terminated (CUDA's
            # __syncthreads_count(done) == BLOCK_SIZE, forward.cu:340-342)
            return ci + 1, jnp.min(new_done)

        final_ci, _ = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), jnp.zeros(())))

        # early exit leaves one prefetched DMA in flight — retire it
        @pl.when(final_ci < n_chunks)
        def _():
            dma_in(final_ci % 2, final_ci).wait()

        # zero the obs rows of skipped chunks (the HBM output is
        # uninitialized; stale rows would corrupt the observe scatter).
        # final_ci >= 1 here (the loop body runs at least once), so
        # skipped chunks never contain a previous tile's rows.
        @pl.when(final_ci < n_chunks)
        def _():
            obs_buf[...] = jnp.zeros_like(obs_buf)

            def zbody(ci, _):
                zdma = pltpu.make_async_copy(
                    obs_buf, obs_hbm.at[pl.ds(base_c + ci, 1), :], obs_sem)
                zdma.start()
                zdma.wait()
                return 0

            jax.lax.fori_loop(final_ci, n_chunks, zbody, 0)

    img_ref[0, 0:16] = acc_ref[...]
    img_ref[0, 16:17] = (carry_ref[...] if LINEAR_T
                         else jnp.exp(carry_ref[...]))
    img_ref[0, 17:18] = done_ref[...]


def _blend_fwd_impl(pay3, starts, counts, grid_x: int, n_tiles: int,
                    tile_w: int, tile_h: int):
    A = pay3.shape[0] * S_CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, 18, NPX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 1, ROWS, S_CHUNK), jnp.float32),
            pltpu.VMEM((1, S_CHUNK), jnp.float32),
            pltpu.VMEM((1, S_CHUNK), jnp.float32),
            pltpu.VMEM((16, NPX), jnp.float32),
            pltpu.VMEM((1, NPX), jnp.float32),
            pltpu.VMEM((1, NPX), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ])
    img, obs = pl.pallas_call(
        functools.partial(_fwd_kernel, tile_w=tile_w, tile_h=tile_h),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 18, NPX), jnp.float32),
            jax.ShapeDtypeStruct((A // S_CHUNK, S_CHUNK), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, counts, jnp.array([grid_x], jnp.int32), pay3)
    return img, obs


def _bwd_kernel(starts_ref, counts_ref, grid_x_ref,
                pay_hbm, gimg_ref, img_ref,
                packed_hbm,
                pay_buf, out_buf, out_prev, carry_ref, done_ref, tot_ref,
                in_sems, out_sem, *, tile_w: int, tile_h: int):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    tile_cx, tile_cy = _tile_center(t, grid_x_ref[0], tile_w, tile_h)
    v = _pixel_basis(tile_w, tile_h)
    base_c = start // S_CHUNK
    head = start - base_c * S_CHUNK
    n_chunks = pl.cdiv(head + count, S_CHUNK)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (1, ROWS, S_CHUNK), 2)

    carry_ref[...] = (jnp.ones_like(carry_ref) if LINEAR_T
                      else jnp.zeros_like(carry_ref))
    done_ref[...] = jnp.zeros_like(done_ref)

    g = gimg_ref[0, 0:16]                            # [16, NPX]
    g_T = gimg_ref[0, 16:17]                         # [1, NPX]
    T_final = img_ref[0, 16:17]
    acc = img_ref[0, 0:16]
    tot_ref[...] = jnp.sum(acc * g, axis=0, keepdims=True)

    def dma_in(slot, ci):
        return pltpu.make_async_copy(pay_hbm.at[pl.ds(base_c + ci, 1)],
                                     pay_buf.at[slot], in_sems.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        dma_in(0, 0).start()
        # shared head chunk: merge the previous tile's already-written
        # dpay rows (sequential grid => the write has retired)
        @pl.when(head > 0)
        def _():
            rmw = pltpu.make_async_copy(packed_hbm.at[pl.ds(base_c, 1)],
                                        out_prev, out_sem)
            rmw.start()
            rmw.wait()

        def cond(state):
            ci, _, all_done = state
            return (ci < n_chunks) & (all_done < 0.5)

        def body(state):
            ci, prefix_carry, _ = state
            slot = ci % 2

            @pl.when(ci + 1 < n_chunks)
            def _():
                dma_in((ci + 1) % 2, ci + 1).start()
            dma_in(slot, ci).wait()

            raw = pay_buf[slot, 0]
            (e, ealpha, alpha, include, T_excl, w,
             new_carry, new_done) = _chunk_state(
                raw, v, tile_cx, tile_cy, head + count - ci * S_CHUNK,
                carry_ref[...], done_ref[...], lo=head - ci * S_CHUNK)

            chg = jax.lax.dot_general(
                raw[6:22], g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [S, NPX]
            contrib = w * chg
            prefix = _cumsum_sublane(contrib) + prefix_carry
            suffix = tot_ref[...] - prefix            # strict suffix
            one_m_a = jnp.maximum(1.0 - alpha, 1e-6)
            dalpha = jnp.where(
                include,
                T_excl * chg - (suffix + T_final * g_T) / one_m_a,
                0.0)
            not_clamped = (ealpha < ALPHA_MAX).astype(jnp.float32)
            dpower = dalpha * alpha * not_clamped
            dop = dalpha * e * not_clamped

            du = jax.lax.dot_general(
                dpower, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [S, 8]
            duT = jax.lax.transpose(du, (1, 0))       # [8, S] rows du0..du5
            dop_sum = jax.lax.transpose(
                jnp.sum(dop, axis=1, keepdims=True), (1, 0))   # [1, S]

            # chain rule u(raw) -> raw rows ([1,S] vector algebra)
            _, xsl, ysl, a, b, c = _local_u(raw, tile_cx, tile_cy)
            du0, du1, du2 = duT[0:1], duT[1:2], duT[2:3]
            du3, du4, du5 = duT[3:4], duT[4:5], duT[5:6]
            dxs = du0 * (-(a * xsl + b * ysl)) + du1 * a + du2 * b
            dys = du0 * (-(c * ysl + b * xsl)) + du1 * b + du2 * c
            da = du0 * (-0.5 * xsl * xsl) + du1 * xsl - 0.5 * du3
            db = du0 * (-(xsl * ysl)) + du1 * ysl + du2 * xsl - du5
            dc = du0 * (-0.5 * ysl * ysl) + du2 * ysl - 0.5 * du4

            dch = jax.lax.dot_general(
                g, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [16, S]

            # exact abs screen grads (backward.cu:663-666 semantics)
            xsT = jax.lax.transpose(xsl, (1, 0))      # [S, 1]
            ysT = jax.lax.transpose(ysl, (1, 0))
            aT = jax.lax.transpose(a, (1, 0))
            bT = jax.lax.transpose(b, (1, 0))
            cT = jax.lax.transpose(c, (1, 0))
            dx = xsT - v[1:2]
            dy = ysT - v[2:3]
            dmx = dpower * (-(aT * dx + bT * dy))
            dmy = dpower * (-(cT * dy + bT * dx))
            absx = jax.lax.transpose(
                jnp.sum(jnp.abs(dmx), axis=1, keepdims=True), (1, 0))
            absy = jax.lax.transpose(
                jnp.sum(jnp.abs(dmy), axis=1, keepdims=True), (1, 0))

            parts = [dxs, dys, da, db, dc, dop_sum, dch, absx, absy]
            if ROWS > 24:
                parts.append(jnp.zeros((ROWS - 24, S_CHUNK), jnp.float32))
            packed = jnp.concatenate(parts, axis=0)[None]
            out_buf[...] = jnp.where((ci == 0) & (lane3 < head),
                                     out_prev[...], packed)
            odma = pltpu.make_async_copy(
                out_buf, packed_hbm.at[pl.ds(base_c + ci, 1)], out_sem)
            odma.start()

            carry_ref[...] = new_carry
            done_ref[...] = new_done
            new_prefix = prefix_carry + jnp.sum(contrib, axis=0, keepdims=True)
            odma.wait()
            # early exit mirrors the forward (once every pixel terminated
            # no later splat has include=1, so its dpay rows are zero)
            return ci + 1, new_prefix, jnp.min(new_done)

        final_ci, _, _ = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32),
                         jnp.zeros((1, NPX), jnp.float32),
                         jnp.zeros(())))

        # retire the in-flight prefetch and zero the skipped chunks' rows
        # (the packed HBM output is uninitialized; final_ci >= 1, so the
        # zeroed chunks never hold a previous tile's rows)
        @pl.when(final_ci < n_chunks)
        def _():
            dma_in(final_ci % 2, final_ci).wait()
            out_buf[...] = jnp.zeros_like(out_buf)

            def zbody(ci, _):
                zdma = pltpu.make_async_copy(
                    out_buf, packed_hbm.at[pl.ds(base_c + ci, 1)], out_sem)
                zdma.start()
                zdma.wait()
                return 0

            jax.lax.fori_loop(final_ci, n_chunks, zbody, 0)


def _blend_bwd_impl(pay3, starts, counts, img, gimg,
                    grid_x: int, n_tiles: int, tile_w: int, tile_h: int):
    A = pay3.shape[0] * S_CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, 18, NPX), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 18, NPX), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, 1, ROWS, S_CHUNK), jnp.float32),
            pltpu.VMEM((1, ROWS, S_CHUNK), jnp.float32),
            pltpu.VMEM((1, ROWS, S_CHUNK), jnp.float32),
            pltpu.VMEM((1, NPX), jnp.float32),
            pltpu.VMEM((1, NPX), jnp.float32),
            pltpu.VMEM((1, NPX), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ])
    packed, = pl.pallas_call(
        functools.partial(_bwd_kernel, tile_w=tile_w, tile_h=tile_h),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((A // S_CHUNK, ROWS, S_CHUNK),
                                        jnp.float32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, counts, jnp.array([grid_x], jnp.int32), pay3, gimg, img)
    return packed


# ------------------------------------------------- custom-vjp pair blend

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def blend_pairs(pay3, abs_hook, starts, counts, grid_x, n_tiles,
                tile_w, tile_h):
    """(img [n_tiles,18,NPX], obs [A/128,128]) from the raw pair payload.

    pay3 [A/128, 24, 128]: per-chunk blocks in the [rows, splats] math
    layout (rows: xs, ys, a, b, c, opacity, ch0..ch15; global pixel-space
    xs/ys — the kernel shifts to tile-local). abs_hook [A,2] zeros; its
    cotangent carries the exact abs screen-gradients.
    """
    return _blend_fwd_impl(pay3, starts, counts, grid_x, n_tiles,
                           tile_w, tile_h)


def _bp_fwd(pay3, abs_hook, starts, counts, grid_x, n_tiles,
            tile_w, tile_h):
    img, obs = _blend_fwd_impl(pay3, starts, counts, grid_x, n_tiles,
                               tile_w, tile_h)
    return (img, obs), (pay3, starts, counts, img)


def _bp_bwd(grid_x, n_tiles, tile_w, tile_h, res, cot):
    pay3, starts, counts, img = res
    gimg, _ = cot
    packed = _blend_bwd_impl(pay3, starts, counts, img, gimg,
                             grid_x, n_tiles, tile_w, tile_h)
    dpay = packed.at[:, 22:].set(0.0)     # abs rows are not payload grads
    dhook = packed[:, 22:24].transpose(0, 2, 1).reshape(-1, 2)
    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return dpay, dhook, f0(starts), f0(counts)


blend_pairs.defvjp(_bp_fwd, _bp_bwd)


# --------------------------------------------------------- outer wrapper

def blend_tiles_pallas(lists: TileLists, mean2d, conic, opacity, channels,
                       grid_x: int, grid_y: int, cfg,
                       mean2d_abs_hook=None):
    """Drop-in replacement for blend_tiles_xla (same return contract) using
    the fused kernel. Requires cfg.tile_w * cfg.tile_h == 1024 (the kernel
    flattens each tile onto 1024 lanes; the rectangle shape is free).

    ``mean2d_abs_hook``: optional [P,2] zeros whose gradient receives the
    per-splat summed |screen gradient| (pixel units)."""
    assert cfg.tile_w * cfg.tile_h == NPX, \
        "pallas blend requires tile_w*tile_h == 1024"
    n_tiles = grid_x * grid_y
    P = mean2d.shape[0]
    C = channels.shape[1]
    assert C <= 16

    # ---- staging: map per-splat payload rows into blend-chunk order ----
    # payload [P+1, ROWS] (sentinel zero row at P). optimization_barrier
    # prevents XLA from fusing concat+gather+transpose into a single
    # 32-pass strided fusion (measured 68ms fused vs ~1ms staged).
    pad_cols = jnp.zeros((P, ROWS - 6 - C), jnp.float32)
    payload = jnp.concatenate(
        [mean2d, conic, opacity.reshape(-1, 1), channels, pad_cols,
         ], axis=1)
    payload = jnp.concatenate(
        [payload, jnp.zeros((1, ROWS), payload.dtype)], axis=0)
    payload = jax.lax.optimization_barrier(payload)

    align_free = (cfg.align_free and cfg.max_pairs is not None
                  and not cfg.payload_depth_rank)
    if align_free:
        # ALIGN-FREE staging (round 3): gather payload rows ONCE in
        # sorted-pair order and hand the kernel the TRUE (unaligned)
        # tile ranges; head rows of shared chunks are masked in-kernel.
        # This deletes the second A-sized gather (sorted ids -> aligned
        # slots) and the cummax alignment maps of build_aligned_pairs —
        # the staging stage measured 11.4 ms of the 23 ms forward and
        # two chained 640k-row gathers are ~3.1 ms each in isolation
        # (experiments/ab_staging2.py, ab_gather2.py). Budget-dropped
        # pairs carry the sid sentinel P (binning), so they gather the
        # zero row and scatter gradients/observe counts into slot P,
        # which is sliced off.
        L = lists.point_list.shape[0]
        Lp = ((L + S_CHUNK - 1) // S_CHUNK) * S_CHUNK
        slot_splat = lists.point_list
        if Lp != L:
            slot_splat = jnp.concatenate(
                [slot_splat, jnp.full((Lp - L,), P, jnp.int32)])
        slot_splat = jnp.minimum(slot_splat, P)
        starts, counts = lists.tile_starts, lists.tile_counts
        n_slots = Lp
    else:
        ap = build_aligned_pairs(lists, n_tiles)
        slot_splat = jnp.where(ap.ids < 0, P, ap.ids)         # [A]
        starts, counts = ap.starts, ap.counts
        n_slots = ap.src.shape[0]

    pay_rm = jnp.take(payload, slot_splat, axis=0)            # [A, 24]
    pay_rm = jax.lax.optimization_barrier(pay_rm)
    # [A/128, 24, 128] chunk blocks: batched local transposes instead of
    # the global [A,24]->[24,A] transpose (measured ~8 ms cheaper)
    pay3 = pay_rm.reshape(-1, S_CHUNK, ROWS).transpose(0, 2, 1)

    if mean2d_abs_hook is not None:
        hook = jnp.take(
            jnp.concatenate([mean2d_abs_hook,
                             jnp.zeros((1, 2), jnp.float32)], 0),
            slot_splat, axis=0)
    else:
        hook = jnp.zeros((n_slots, 2), jnp.float32)

    img, obs = blend_pairs(pay3, hook, starts, counts,
                           grid_x, n_tiles, cfg.tile_w, cfg.tile_h)

    accum = img[:, :C, :]
    T = img[:, 16, :]
    obs_flat = jax.lax.stop_gradient(obs).reshape(-1)
    # sentinel slots (padding / dropped pairs) index P -> mode='drop'.
    # Align-free trailing chunks beyond the last tile's range are never
    # written by the kernel; their slots are sentinel-P too, so any
    # garbage drops here as well.
    observe = jnp.zeros((P,), jnp.int32).at[slot_splat].add(
        obs_flat.astype(jnp.int32), mode='drop')
    return accum, T, observe
