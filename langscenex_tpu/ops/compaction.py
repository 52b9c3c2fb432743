"""Pallas stream compaction for the binning sort (round 5).

The rasterizer's dominant forward cost is the (tile, depth-rank) pair
sort (docs/KERNELS.md §12b/§14): the broadcast enumeration emits a
STATIC [P*K1 + sum(B_i*K_i)] slot domain (~1.78M slots at the bench
scene) of which only <= ``max_pairs`` (~540k) survive the conic cull and
budget mask — the XLA variadic sort spends ~70% of its passes moving
sentinel slots. The GPU reference never pays this: duplicateWithKeys
writes pairs compactly via atomic offsets before cub::RadixSort
(cuda_rasterizer/rasterizer_impl.cu:299-318). TPU has no scatter
hardware worth using (measured 205M rows/s — worse than the sort), but
a SEQUENTIAL-grid Pallas kernel can compact in ~2 linear passes:

  - the TPU grid executes in order on one core, so a running output
    cursor lives in SMEM scratch across grid steps;
  - each chunk packs its valid elements front-of-row with a 128-wide
    in-row bitonic partition (stable: valid keep lane order), computes
    per-row output offsets from a 2-D prefix count, merges rows into a
    chunk-local output window at lane granularity, and DMAs the window
    to HBM at the (dynamic, row-aligned) cursor;
  - windows OVERLAP: each chunk writes its full static-size window, the
    garbage tail is overwritten by the next chunk's window (sequential
    retirement — the same trick rasterize_pallas' head-merge uses), and
    the partial boundary row is re-merged from a VMEM carry row;
  - slots never written keep their values from a sentinel-prefilled
    output buffer (input_output_aliases), so the tail reads exactly like
    the sorted sentinel tail of the uncompacted path.

Compaction preserves enumeration order and valid pair keys are unique
(tile << 22 | per-splat depth rank), so sorting the compacted stream
yields BIT-IDENTICAL (point_list, tile_starts, tile_counts) to sorting
the full domain — only the sort now runs on <= max_pairs slots.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
CH_ROWS = 128                  # rows per chunk (chunk = CH_ROWS*LANES elems)
OB_ROWS = CH_ROWS + 4          # output window: data rows + boundary slack


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _row_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)


def _cumsum_lanes(x):
    """Inclusive prefix sum along the lane axis (log-step roll+add)."""
    lane = _lane_iota(x.shape)
    k = 1
    while k < x.shape[-1]:
        x = x + jnp.where(lane >= k, pltpu.roll(x, k, len(x.shape) - 1), 0)
        k *= 2
    return x


def _cumsum_rows(x):
    """Inclusive prefix sum along the sublane (row) axis."""
    row = _row_iota(x.shape)
    k = 1
    while k < x.shape[-2]:
        x = x + jnp.where(row >= k, pltpu.roll(x, k, len(x.shape) - 2), 0)
        k *= 2
    return x


def _partition_rows(key, sid):
    """In-row partition: sort each row's 128 lanes ascending BY KEY,
    carrying sid — valid keys (< sent_min) land in the leading lanes.
    Order within the valid prefix is arbitrary (the caller's global
    sort re-orders everything anyway), which saves the third
    lane-index stream a stable partition would need. All rows run in
    parallel as whole-block ops; partners are lane rolls (2j | 128 for
    j <= 64, so groups never cross the wraparound)."""
    lane = _lane_iota(key.shape)
    n = key.shape[-1]
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            first = (lane & j) == 0
            asc = (lane & k) == 0 if k < n else jnp.ones_like(first)
            take_min = first == asc

            def partner(x):
                fwd = pltpu.roll(x, n - j, len(x.shape) - 1)   # i -> i+j
                bwd = pltpu.roll(x, j, len(x.shape) - 1)       # i -> i-j
                return jnp.where(first, fwd, bwd)

            pp = partner(key)
            # bitwise, not where(bool, bool, bool): Mosaic cannot
            # truncate the i8 select result back to i1
            swap = (take_min & (pp < key)) | (~take_min & (pp > key))
            key = jnp.where(swap, pp, key)
            sid = jnp.where(swap, partner(sid), sid)
            j //= 2
        k *= 2
    return key, sid


def _var_roll_right(x, off):
    """Per-row lane roll right by ``off`` [R,1] (log-shift decomposition,
    wraparound intended: wrapped lanes feed the next output row)."""
    b = 1
    while b < LANES:
        hit = (off & b) != 0
        x = jnp.where(hit, pltpu.roll(x, b, len(x.shape) - 1), x)
        b *= 2
    return x


def _compact_kernel(key_ref, sid_ref, okey_in, osid_in, okey_hbm, osid_hbm,
                    ob_k, ob_s, carry_k, carry_s, cursor_ref, sems,
                    *, sent_min: int, sent_fill_key: int,
                    sent_fill_sid: int):
    # okey_in/osid_in are the sentinel-prefilled buffers aliased onto the
    # outputs — never read; all writes go through the output refs.
    del okey_in, osid_in
    c = pl.program_id(0)
    slot = c % 2

    @pl.when(c == 0)
    def _():
        cursor_ref[0] = 0
        carry_k[...] = jnp.full_like(carry_k, sent_fill_key)
        carry_s[...] = jnp.full_like(carry_s, sent_fill_sid)

    # previous use of this window slot must have retired before rewrite
    @pl.when(c >= 2)
    def _():
        pltpu.make_async_copy(ob_k.at[slot], ob_k.at[slot],
                              sems.at[slot, 0]).wait()
        pltpu.make_async_copy(ob_s.at[slot], ob_s.at[slot],
                              sems.at[slot, 1]).wait()

    key = key_ref[...]                                   # [CH_ROWS, LANES]
    sid = sid_ref[...]
    mask = key < sent_min
    mi = mask.astype(jnp.int32)
    incl = _cumsum_lanes(mi)
    c_r = incl[:, LANES - 1:LANES]                       # [R, 1] row counts
    rb_incl = _cumsum_rows(c_r)
    rowbase = rb_incl - c_r                              # exclusive
    total_c = jnp.sum(mi)

    cursor = cursor_ref[0]
    base_row = cursor // LANES
    cur_mod = cursor - base_row * LANES
    local_start = cur_mod + rowbase                      # [R, 1]
    off = jnp.remainder(local_start, LANES)
    qrow = local_start // LANES                          # [R, 1] <= OB_ROWS-2

    # partition: valid lanes to the row front (by-key, order-free)
    lane = _lane_iota(key.shape)
    pk, ps = _partition_rows(key, sid)

    # pre-roll every row to its output lane phase (wrapped lanes feed
    # the row's SECOND destination row via the mhi mask)
    pk = _var_roll_right(pk, off)
    ps = _var_roll_right(ps, off)

    # lane masks for the two destination rows of each source row
    end = off + c_r                                      # [R, 1]
    mlo = ((lane >= off) & (lane < jnp.minimum(end, LANES))
           ).astype(jnp.float32)
    mhi = (lane < (end - LANES)).astype(jnp.float32)

    # ---- one-hot MXU merge: every output lane receives EXACTLY ONE
    # source element (destination intervals are disjoint by
    # construction), so OB = M @ D with one-hot M is exact. int32 values
    # ride as two 16-bit halves (<= 2^16, exact in f32 HIGHEST passes;
    # single-term sums, no accumulation growth).
    qT = jax.lax.transpose(qrow, (1, 0)).astype(jnp.float32)   # [1, R]
    qio = _row_iota((OB_ROWS, CH_ROWS)).astype(jnp.float32)
    m_lo = (qT == qio).astype(jnp.float32)               # [OBR, R]
    m_hi = (qT == qio - 1.0).astype(jnp.float32)
    M = jnp.concatenate([m_lo, m_hi], axis=1)            # [OBR, 2R]

    def halves(x):
        h = jax.lax.shift_right_logical(x, 16).astype(jnp.float32)
        l = (x & 0xffff).astype(jnp.float32)
        return h, l

    kh, kl = halves(pk)
    sh, sl = halves(ps)
    ones = jnp.ones_like(kh)
    streams = []
    for v in (kh, kl, sh, sl, ones):
        streams.append(jnp.concatenate([v * mlo, v * mhi], axis=0))
    D = jnp.concatenate(streams, axis=1)                 # [2R, 5*LANES]
    OB = jax.lax.dot_general(
        M, D, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)             # [OBR, 5*LANES]
    okh = OB[:, 0 * LANES:1 * LANES].astype(jnp.int32)
    okl = OB[:, 1 * LANES:2 * LANES].astype(jnp.int32)
    osh = OB[:, 2 * LANES:3 * LANES].astype(jnp.int32)
    osl = OB[:, 3 * LANES:4 * LANES].astype(jnp.int32)
    cov = OB[:, 4 * LANES:5 * LANES] > 0.5
    okey = jax.lax.shift_left(okh, 16) | okl
    osid = jax.lax.shift_left(osh, 16) | osl

    # uncovered lanes: carry on the boundary row, sentinel elsewhere
    rio = _row_iota((OB_ROWS, LANES))
    base_k = jnp.where(rio == 0, jnp.broadcast_to(carry_k[...],
                                                  (OB_ROWS, LANES)),
                       sent_fill_key)
    base_s = jnp.where(rio == 0, jnp.broadcast_to(carry_s[...],
                                                  (OB_ROWS, LANES)),
                       sent_fill_sid)
    ob_k[slot] = jnp.where(cov, okey, base_k)
    ob_s[slot] = jnp.where(cov, osid, base_s)

    # carry = the partial row at the new cursor (sentinel beyond it)
    new_end = cur_mod + total_c
    lr = new_end // LANES
    carry_k[...] = ob_k[slot, pl.ds(lr, 1)]
    carry_s[...] = ob_s[slot, pl.ds(lr, 1)]
    cursor_ref[0] = cursor + total_c

    dk = pltpu.make_async_copy(
        ob_k.at[slot], okey_hbm.at[pl.ds(base_row, OB_ROWS)], sems.at[slot, 0])
    ds_ = pltpu.make_async_copy(
        ob_s.at[slot], osid_hbm.at[pl.ds(base_row, OB_ROWS)], sems.at[slot, 1])
    dk.start()
    ds_.start()

    # retire outstanding DMAs on the last step
    @pl.when(c == pl.num_programs(0) - 1)
    def _():
        dk.wait()
        ds_.wait()

        @pl.when(pl.num_programs(0) >= 2)
        def _():
            other = (c + 1) % 2
            pltpu.make_async_copy(ob_k.at[other], ob_k.at[other],
                                  sems.at[other, 0]).wait()
            pltpu.make_async_copy(ob_s.at[other], ob_s.at[other],
                                  sems.at[other, 1]).wait()


def compact_pairs(key: jnp.ndarray, sid: jnp.ndarray, sent_min: int,
                  budget: int, sent_fill_key: int,
                  sent_fill_sid: int, interpret: bool = False):
    """Compact (key, sid) streams: valid slots (key < sent_min) move to
    the front — in ARBITRARY order (the in-row partition sorts by key;
    callers sort the compacted stream anyway) — and the tail is
    (sent_fill_key, sent_fill_sid). Requires the true valid count <=
    ``budget`` (the binning budget mask guarantees it). Returns padded
    [~budget + window] streams — callers sort and slice."""
    A = key.shape[0]
    ch = CH_ROWS * LANES
    A_pad = ((A + ch - 1) // ch) * ch
    if A_pad != A:
        key = jnp.concatenate(
            [key, jnp.full((A_pad - A,), sent_fill_key, key.dtype)])
        sid = jnp.concatenate(
            [sid, jnp.full((A_pad - A,), sent_fill_sid, sid.dtype)])
    n_chunks = A_pad // ch
    out_rows = (min(budget, A_pad) + LANES - 1) // LANES + OB_ROWS + 1

    okey0 = jnp.full((out_rows, LANES), sent_fill_key, jnp.int32)
    osid0 = jnp.full((out_rows, LANES), sent_fill_sid, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((CH_ROWS, LANES), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CH_ROWS, LANES), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, OB_ROWS, LANES), jnp.int32),
            pltpu.VMEM((2, OB_ROWS, LANES), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ])
    okey, osid = pl.pallas_call(
        functools.partial(_compact_kernel, sent_min=sent_min,
                          sent_fill_key=sent_fill_key,
                          sent_fill_sid=sent_fill_sid),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((out_rows, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((out_rows, LANES), jnp.int32)],
        input_output_aliases={2: 0, 3: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(key.reshape(-1, LANES), sid.reshape(-1, LANES), okey0, osid0)
    return okey.reshape(-1), osid.reshape(-1)


def compact_pairs_ref(key, sid, sent_min, sent_fill_key, sent_fill_sid):
    """Pure-XLA reference (argsort-based) for tests."""
    valid = key < sent_min
    order = jnp.argsort(jnp.where(valid, 0, 1), stable=True)
    k = jnp.where(valid[order], key[order], sent_fill_key)
    s = jnp.where(valid[order], sid[order], sent_fill_sid)
    return k, s
