"""Tile binning: duplicate splats into (tile, depth)-sorted pair lists.

Replaces the reference's duplicateWithKeys + cub RadixSort + identifyTileRanges
(cuda_rasterizer/rasterizer_impl.cu:70-130,285-328) with a static-shape XLA
formulation. Two-tier broadcast enumeration:

- **Tier 1** enumerates the first ``K1 = max_tiles_per_splat`` tiles of every
  splat on a ``[P, K1]`` grid — per-splat scalars broadcast along the K axis,
  the layout XLA vectorizes essentially for free (measured 6.7 ms for the
  full build at 100k splats / 1.6M pairs on v5e, vs 69 ms for a gather-form
  run-length expansion over the flat pair buffer: per-slot gathers and
  vector-divisor int div/mod in the [A] domain are ~10x the broadcast form,
  experiments/ab_binning.py).
- **Tier 2** catches the OVERFLOW tiles (k >= K1) of the ``B = big_splats``
  largest splats on a ``[B, n_tiles - K1]`` grid, so no splat is truncated
  mid-rect as long as at most B splats exceed K1 tiles. Mid-rect truncation
  is what stalled reference-scale training (the hard color/alpha cliff at the
  cut pushes scale gradients UP — grow-to-cover feedback, docs/KERNELS.md §8);
  ``k_overflowed`` reports a tier-2 register overflow so the trainer can grow
  ``big_splats`` (a recompile), bounding any truncation to a few iterations.

A ``max_pairs`` budget caps the kept pairs by WHOLE SPLATS in id order (plus
at most one mid-rect split at the boundary): per-splat kept-pair offsets come
from an exclusive cumsum, and pairs past the budget are dropped before the
sort — the same drop policy the buffer-fill formulation had, so adaptive
growth semantics are unchanged. ``num_pairs`` always reports TRUE demand
(f32-accumulated, saturated — an int32 cumsum would wrap past 2^31 demanded
pairs and a wrapped-negative total would read as "no overflow").

The pair list is lexicographically sorted by (tile, depth) with
``lax.sort(num_keys=2)``; per-tile ranges come from ``searchsorted`` (a few
hundred queries — fine; at millions of queries it compiles to while-loops).

Everything is integer bookkeeping under ``stop_gradient`` — gradients flow
through the blend, not the binning (same as CUDA).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import ProcessedSplats


class CullSpec(NamedTuple):
    """Per-splat data for exact per-tile conic culling (tile_cull).

    A (splat, tile) pair is droppable iff every pixel of the tile fails
    the blend's own alpha >= 1/255 test, i.e. iff the MINIMUM of the
    conic quadratic Q(d) = a dx^2 + 2b dx dy + c dy^2 over the tile
    rectangle exceeds qmax = 2*ln(255*opacity) (+ f32 margin). The min is
    closed-form (0 if the mean lies inside the rect, else the min over
    the 4 edges — each a clamped 1-D quadratic vertex), so the cull is
    EXACT: output is unchanged, only provably-invisible pairs drop.
    This is what kills the AABB corners (a circle covers ~79% of its
    bounding square) and most of the rect of elongated splats (whose
    AABB is sized by the major axis but whose support is a thin ellipse).
    """
    mean2d: jnp.ndarray      # [P,2] pixel-space means
    conic: jnp.ndarray       # [P,3] (a, b, c) inverse 2D covariance
    qmax: jnp.ndarray        # [P] support threshold 2*ln(255*op) + margin
    tile_w: int
    tile_h: int


def _rect_qmin(a, b, c, lx, hx, ly, hy):
    """Exact min of Q(dx,dy) = a dx^2 + 2b dx dy + c dy^2 over
    [lx,hx]x[ly,hy] for PSD conics (a,c > 0). Broadcasts elementwise."""
    a = jnp.maximum(a, 1e-12)
    c = jnp.maximum(c, 1e-12)
    inside = (lx <= 0.0) & (0.0 <= hx) & (ly <= 0.0) & (0.0 <= hy)

    def edge_x(ex):           # dx fixed at ex, dy free
        dy = jnp.clip(-b * ex / c, ly, hy)
        return (a * ex) * ex + 2.0 * (b * ex) * dy + (c * dy) * dy

    def edge_y(ey):           # dy fixed at ey, dx free
        dx = jnp.clip(-b * ey / a, lx, hx)
        return (a * dx) * dx + 2.0 * (b * dx) * ey + (c * ey) * ey

    q = jnp.minimum(jnp.minimum(edge_x(lx), edge_x(hx)),
                    jnp.minimum(edge_y(ly), edge_y(hy)))
    return jnp.where(inside, 0.0, q)


class TileLists(NamedTuple):
    point_list: jnp.ndarray    # [A] splat ids in (tile, depth) order
    tile_starts: jnp.ndarray   # [n_tiles] int32 start index into point_list
    tile_counts: jnp.ndarray   # [n_tiles] int32
    num_pairs: jnp.ndarray     # [] int32 total demanded pairs (may exceed A;
                               #    saturated at int32 max — see _demand)
    overflowed: jnp.ndarray    # [] bool: demand > max_pairs budget (truncated)
    k_overflowed: jnp.ndarray = None  # [] bool: > big_splats splats exceeded
                               #    K1 tiles (tier-2 register overflow)
    num_big: jnp.ndarray = None  # [] int32 TRUE count of splats exceeding
                               #    K1 tiles (so growth can jump straight
                               #    to 1.25x instead of doubling)
    perm: jnp.ndarray = None   # [P] depth order (rank -> original splat id);
                               #    set only by the depth_presort builder with
                               #    return_ranks=True, where point_list holds
                               #    depth RANKS instead of original ids


def _demand(tt: jnp.ndarray, budget: int):
    """(num_pairs int32 saturated, overflowed bool) from per-splat tile
    counts vs a kept-pair budget."""
    total_f = jnp.sum(tt.astype(jnp.float32))
    overflowed = total_f > budget
    num_pairs = jnp.minimum(total_f, float(2 ** 31 - 1)).astype(jnp.int32)
    return num_pairs, overflowed


def _budget_offsets(kept_tt: jnp.ndarray):
    """Exclusive cumsum of kept-pair counts, f32 to survive >2^31 demand
    (exact to 2^24 kept pairs — far beyond any real budget)."""
    c = jnp.cumsum(kept_tt.astype(jnp.float32))
    return c - kept_tt.astype(jnp.float32)


def _enumerate_two_tier(tt, rect_min, rect_w, depth, sid_base, K1, K2, B,
                        grid_x, n_tiles, budget, cull=None,
                        extra_tiers=()):
    """Broadcast-enumerate pair (tile_key, depth_key, sid) streams.

    ``tt``/``rect_min``/``rect_w``/``depth``/``sid_base`` are per-splat
    arrays in the caller's chosen order (id order or depth-rank order);
    ``sid_base[p]`` is the value written into ``point_list``. Returns the
    concatenated [P*K1 + sum(B_i*K_i) + B*K2] streams with budget-dropped
    / invalid entries keyed to the ``n_tiles`` sentinel, the tier
    overflow flag, the true big-splat count, and the kept-pair demand
    (f32; None without culling — callers then use the AABB demand).
    Pairs of splat p occupy budget offsets [off[p], off[p]+kept[p]), so
    dropping `offset >= budget` kills whole trailing splats with at most
    one mid-rect split — the documented truncation policy (measured in
    post-cull pairs when ``cull`` is given, so a budget sized to culled
    demand drops nothing).

    ``extra_tiers``: optional ((B_i, K_i), ...) mid tiers between tier 1
    and the final catch-all tier — tier i enumerates tile slots
    [S_i, S_i + K_i) (S_i = K1 + sum of earlier mid widths) for the
    top-B_i splats by tile count. This shrinks the SORT DOMAIN (the
    dominant forward cost, docs/KERNELS.md §12b) at small K1 without
    truncating: a mid-sized splat no longer needs the [B, n_tiles - K1]
    catch-all register, so K1 can drop below the tile-count tail.
    Exact iff at most B_i splats exceed S_i tiles for every tier
    (``k_overflowed`` reports any violation). The final (B, K2) tier
    keeps the full-grid catch-all semantics.

    ``cull``: optional :class:`CullSpec` with per-splat rows ALREADY in
    the caller's order; enables the exact per-tile conic cull."""
    P = tt.shape[0]
    n_big = jnp.sum((tt > K1).astype(jnp.int32))

    def tile_xy(rm, rw, kk):
        kx = kk % rw[:, None]
        ky = kk // rw[:, None]
        return rm[:, 0:1] + kx, rm[:, 1:2] + ky

    def cull_keep(cl, tx, ty):
        """Exact conic-support test per (splat-row, tile): keep iff some
        pixel of the tile can pass the blend's alpha >= 1/255 gate."""
        mx, my, ca, cb, cc, qmax = cl
        lx = (tx * cull.tile_w).astype(jnp.float32) - mx[:, None]
        ly = (ty * cull.tile_h).astype(jnp.float32) - my[:, None]
        hx = lx + (cull.tile_w - 1)
        hy = ly + (cull.tile_h - 1)
        qmin = _rect_qmin(ca[:, None], cb[:, None], cc[:, None],
                          lx, hx, ly, hy)
        return qmin <= qmax[:, None]

    if cull is not None:
        cl = (cull.mean2d[:, 0], cull.mean2d[:, 1], cull.conic[:, 0],
              cull.conic[:, 1], cull.conic[:, 2], cull.qmax)
    else:
        cl = None

    # ---- tier 1: first K1 tiles of every splat ----------------------
    k = jnp.arange(K1, dtype=jnp.int32)
    tx1, ty1 = tile_xy(rect_min, rect_w, k[None, :])
    tile_id1 = ty1 * grid_x + tx1                    # [P, K1]
    in_rect1 = k[None, :] < tt[:, None]

    if cull is not None:
        keep1 = in_rect1 & cull_keep(cl, tx1, ty1)   # [P, K1]
        k1i = keep1.astype(jnp.int32)
        rank1 = jnp.cumsum(k1i, axis=1) - k1i        # exclusive in-splat rank
        ctt1 = jnp.sum(k1i, axis=1)                  # [P] kept tier-1 pairs
    else:
        keep1 = in_rect1
        rank1 = jnp.broadcast_to(k[None, :], (P, K1))
        ctt1 = jnp.minimum(tt, K1)

    # ---- mid tiers + final catch-all: one shared top_k --------------
    # tier list: (B_i, slot start S_i, width K_i); catch-all last
    specs = []
    start = K1
    for (Bi, Ki) in extra_tiers:
        Bi = min(Bi, P)
        Ki = min(Ki, max(n_tiles - start, 0))
        if Bi > 0 and Ki > 0:
            specs.append((Bi, start, Ki))
        start += Ki
    K2_eff = min(K2, max(n_tiles - start, 0))
    if B > 0 and K2_eff > 0:
        specs.append((min(B, P), start, K2_eff))

    if not specs:
        k_overflowed = (n_big > 0 if K2 > 0 or extra_tiers
                        else jnp.zeros((), bool))
        demand_f = (jnp.sum(ctt1.astype(jnp.float32))
                    if cull is not None else None)
        off = _budget_offsets(ctt1 if cull is not None
                              else jnp.minimum(tt, K1))
        valid1 = keep1 & (off[:, None] + rank1 < budget)
        key_tile1 = jnp.where(valid1, tile_id1, n_tiles).reshape(-1)
        key_depth1 = jnp.broadcast_to(depth[:, None], (P, K1)).reshape(-1)
        sid1 = jnp.where(valid1, sid_base[:, None], P).reshape(-1)
        return (key_tile1.astype(jnp.int32), key_depth1, sid1,
                k_overflowed, n_big, demand_f)

    B_max = max(s[0] for s in specs)
    if B_max <= 1024:
        top_tt, top_idx = jax.lax.top_k(tt, B_max)   # shared, descending
    else:
        # large-register top_k is ~6 ms at B=40k/P=100k on v5e (device
        # A/B ab_sortdomain2) while a full [P] variadic sort is ~0.5 ms
        # (same engine the rank_key depth argsort rides). The payload is
        # a LOCAL arange — top_idx values are positional row indices
        # into rect_min/rect_w/cull, which only coincide with sid_base
        # when the caller passes the identity permutation.
        stt, sidx = jax.lax.sort(
            (-tt, jnp.arange(P, dtype=jnp.int32)), num_keys=1)
        top_tt, top_idx = -stt[:B_max], sidx[:B_max]

    # exactness: every splat with tt > S_i must fit tier i's register
    k_overflowed = jnp.zeros((), bool)
    for (Bi, Si, Ki) in specs:
        k_overflowed |= jnp.sum((tt > Si).astype(jnp.int32)) > Bi

    # running kept-count per splat (in-splat rank base for later tiers)
    ctt_run = ctt1
    # running per-splat coverage for the no-cull kept computation
    cov_run = jnp.minimum(tt, K1)

    tiers_out = []                                   # (keep, rank, idx, ...)
    for (Bi, Si, Ki) in specs:
        big_tt = top_tt[:Bi]
        big_idx = top_idx[:Bi]
        captured = big_tt > Si                       # [Bi]
        rw_i = rect_w[big_idx]
        rm_i = rect_min[big_idx]
        ki = Si + jnp.arange(Ki, dtype=jnp.int32)    # [Ki]
        tx_i, ty_i = tile_xy(rm_i, rw_i, ki[None, :])
        tile_id_i = ty_i * grid_x + tx_i             # [Bi, Ki]
        in_rect_i = captured[:, None] & (ki[None, :] < big_tt[:, None])
        if cull is not None:
            cl_i = tuple(v[big_idx] for v in cl)
            keep_i = in_rect_i & cull_keep(cl_i, tx_i, ty_i)
            kii = keep_i.astype(jnp.int32)
            rank_i = ctt_run[big_idx][:, None] + jnp.cumsum(kii, axis=1) - kii
            ctt_i = jnp.sum(kii, axis=1)             # [Bi]
            ctt_run = ctt_run.at[big_idx].add(
                jnp.where(captured, ctt_i, 0), mode='drop')
        else:
            keep_i = in_rect_i
            rank_i = jnp.broadcast_to(ki[None, :], (Bi, Ki))
            cov_i = jnp.where(captured,
                              jnp.clip(big_tt - Si, 0, Ki), 0)
            cov_run = cov_run.at[big_idx].add(cov_i, mode='drop')
        tiers_out.append((keep_i, rank_i, big_idx, tile_id_i, Bi, Ki))

    # per-splat kept counts -> budget offsets (whole-splat truncation)
    if cull is not None:
        kept = ctt_run
        demand_f = jnp.sum(kept.astype(jnp.float32))
    else:
        kept = cov_run
        demand_f = None
    off = _budget_offsets(kept)                      # [P] f32

    # Invalid/budget-dropped pairs carry the SID SENTINEL ``P`` too (not
    # just the tile sentinel): the align-free blend path gathers payload
    # rows for EVERY sorted slot, so dropped slots must resolve to the
    # zero sentinel row (and their gradient/observe scatters to row P,
    # which callers slice off). Valid pairs are unaffected; the aligned
    # path never reads beyond per-tile counts either way.
    valid1 = keep1 & (off[:, None] + rank1 < budget)
    key_tiles = [jnp.where(valid1, tile_id1, n_tiles).reshape(-1)]
    key_depths = [jnp.broadcast_to(depth[:, None], (P, K1)).reshape(-1)]
    sids = [jnp.where(valid1, sid_base[:, None], P).reshape(-1)]

    for (keep_i, rank_i, big_idx, tile_id_i, Bi, Ki) in tiers_out:
        # no-cull rank_i is the global slot index k — exactly the
        # in-splat rank whenever the splat's lower tiers all captured
        # it, which non-overflow guarantees (tt > S_i > S_j implies
        # membership in every smaller-threshold register's top-B_j as
        # long as that register did not overflow; overflow is flagged
        # and budget-dropping merely turns conservative).
        valid_i = keep_i & (off[big_idx][:, None] + rank_i < budget)
        key_tiles.append(jnp.where(valid_i, tile_id_i, n_tiles).reshape(-1))
        key_depths.append(jnp.broadcast_to(
            depth[big_idx][:, None], (Bi, Ki)).reshape(-1))
        sids.append(jnp.where(valid_i, sid_base[big_idx][:, None],
                              P).reshape(-1))

    return (jnp.concatenate(key_tiles).astype(jnp.int32),
            jnp.concatenate(key_depths),
            jnp.concatenate(sids),
            k_overflowed, n_big, demand_f)


def _depth_perm(dkey: jnp.ndarray, sid_base: jnp.ndarray,
                use_engine: bool, interpret: bool = False):
    """Depth-order permutation (rank -> splat id), stable on ties.

    ``use_engine``: ride the bitonic engine (ops/sort_engine.py) —
    IEEE non-negative floats are order-isomorphic to their int32 bit
    patterns (depths are > 0 past the frustum cull; culled rows carry
    +inf = 0x7f800000), so bitcast keys sort identically, and
    tie_sid=True keeps lax.sort's stable id order on equal depths (so
    ranks, and therefore the composited output, stay bit-identical on
    scenes with f32-quantized depth collisions)."""
    P = dkey.shape[0]
    if not use_engine:
        _, perm = jax.lax.sort((dkey, sid_base), num_keys=1)
        return perm
    from .sort_engine import bitonic_sort_pairs
    np2 = max(1024, 1 << (P - 1).bit_length())
    ik = jax.lax.bitcast_convert_type(dkey, jnp.int32)
    if np2 != P:
        ik = jnp.concatenate([ik, jnp.full(
            (np2 - P,), jnp.int32(2 ** 31 - 1))])
        sb = jnp.concatenate([sid_base, jnp.full(
            (np2 - P,), jnp.int32(P))])
    else:
        sb = sid_base
    _, perm = bitonic_sort_pairs(ik, sb, tie_sid=True, interpret=interpret)
    return perm[:P]


def _tile_ranges(sorted_tile: jnp.ndarray, n_tiles: int):
    tile_starts = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32),
        side='left').astype(jnp.int32)
    tile_ends = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32),
        side='right').astype(jnp.int32)
    return tile_starts, tile_ends - tile_starts


def _finish(key_tile, key_depth, sid, n_tiles, max_pairs):
    """(tile, depth) 2-key sort + optional slice + per-tile ranges.
    Budget-masking upstream guarantees every surviving pair sorts into
    the first ``max_pairs`` slots (invalid pairs carry the sentinel)."""
    sorted_tile, _, point_list = jax.lax.sort(
        (key_tile, key_depth, sid), num_keys=2)
    if max_pairs is not None and max_pairs < sorted_tile.shape[0]:
        sorted_tile = sorted_tile[:max_pairs]
        point_list = point_list[:max_pairs]
    tile_starts, tile_counts = _tile_ranges(sorted_tile, n_tiles)
    return point_list, tile_starts, tile_counts


def build_tile_lists(proc: ProcessedSplats, grid_x: int, grid_y: int,
                     max_tiles_per_splat: int = 32,
                     max_pairs: int | None = None,
                     big_splats: int = 256,
                     cull: CullSpec | None = None,
                     extra_tiers: tuple = (),
                     rank_key: bool = False,
                     key_only: bool = False,
                     compact: bool = False,
                     pallas_sort: bool = False) -> TileLists:
    """Build depth-sorted per-tile splat lists.

    ``max_tiles_per_splat`` (K1) sizes the tier-1 enumeration;
    ``big_splats`` (B) sizes the tier-2 register for splats exceeding K1
    tiles (exact up to the full grid — no mid-rect truncation while at
    most B splats are that big; ``k_overflowed`` reports otherwise).
    ``max_pairs`` caps the KEPT pairs — whole trailing splats (by id)
    are dropped past the budget, ``overflowed`` reports it, and
    ``num_pairs`` is the true demand so adaptive growth can jump
    straight to it. ``cull`` enables the exact per-tile conic cull
    (CullSpec docstring); demand/overflow are then measured post-cull.

    ``extra_tiers``: ((B_i, K_i), ...) mid tiers between tier 1 and the
    catch-all (see _enumerate_two_tier) — lets K1 shrink (smaller sort
    domain) while staying exact on tile-count tails the two-tier layout
    could only truncate or pay [B, n_tiles-K1] for.

    ``rank_key``: sort ONE packed int32 key (tile in the high bits,
    per-splat DEPTH RANK in the low 22) + the sid payload instead of the
    2-key 3-stream (tile, f32 depth, sid) sort. The rank is computed in
    ID order (one [P] argsort + inverse scatter — no payload or
    enumeration permutes, unlike depth_presort), so pair order matches
    (tile, depth) with deterministic tie-breaking by depth rank.
    Auto-falls back when (n_tiles+1) << 22 | rank would overflow int32.

    ``compact`` (requires ``rank_key`` + ``max_pairs``): run the Pallas
    stream-compaction kernel (ops/compaction.py) over the enumerated
    (key, sid) streams BEFORE the sort, so the sort runs on the
    <= max_pairs valid slots instead of the full static enumeration
    domain (~3.3x larger at the bench scene). Valid keys are unique
    (tile<<22 | depth rank), so the sorted lists are bit-identical.

    ``key_only`` (requires ``rank_key``): sort ONLY the packed key — a
    1-operand sort, half the stream traffic of rank_key's (key, sid)
    pair — and RECOVER the sid payload after truncation: the rank bits
    index the depth argsort permutation (``sid = perm[rank]``), one
    [max_pairs]-sized gather from a [P] table instead of a full payload
    stream through the multi-pass sort merge. Bit-identical lists.
    """
    n_tiles = grid_x * grid_y
    P = proc.depth.shape[0]
    K1 = min(max_tiles_per_splat, n_tiles)
    K2 = n_tiles - K1
    B = min(big_splats, P)
    budget = max_pairs if max_pairs is not None else P * K1 + B * K2

    tt = jax.lax.stop_gradient(proc.tiles_touched)     # [P], 0 for culled
    depth = jax.lax.stop_gradient(proc.depth)
    rect_w = jnp.maximum(proc.rect_max[:, 0] - proc.rect_min[:, 0], 1)
    sid_base = jnp.arange(P, dtype=jnp.int32)

    use_rank = (rank_key and P < (1 << 22)
                and (n_tiles + 1) * (1 << 22) + P < 2 ** 31)
    if use_rank:
        # rank_of_id[p] = depth rank of splat p, in ID order: one [P]
        # sort + inverse scatter; culled splats (tt == 0) sink last so
        # real ranks stay dense (irrelevant to order — their pairs are
        # sentinel-keyed anyway).
        dkey = jnp.where(tt > 0, depth, jnp.inf)
        perm = _depth_perm(dkey, sid_base,
                           use_engine=compact and pallas_sort
                           and jax.default_backend() == "tpu")
        rank_of_id = jnp.zeros((P,), jnp.int32).at[perm].set(sid_base)
        depth_key = rank_of_id                          # int32 [P]
    else:
        depth_key = depth

    (key_tile, key_depth, sid, k_overflowed, num_big,
     demand_f) = _enumerate_two_tier(
        tt, proc.rect_min, rect_w, depth_key, sid_base, K1, K2, B,
        grid_x, n_tiles, budget, cull=cull, extra_tiers=extra_tiers)
    if use_rank:
        # invalid pairs carry (n_tiles, real rank) — still sorts after
        # every valid pair since tile occupies the high bits
        key = key_tile * (1 << 22) + key_depth
        if compact and max_pairs is not None and not key_only:
            # shrink the sort domain to the budget before sorting
            from .compaction import compact_pairs
            interp = jax.default_backend() != "tpu"
            ckey, csid = compact_pairs(
                key, sid, sent_min=n_tiles << 22, budget=max_pairs,
                sent_fill_key=n_tiles << 22, sent_fill_sid=P,
                interpret=interp)
            if pallas_sort:
                # bitonic engine wants a power-of-two domain; all valid
                # slots sit in the first <= max_pairs positions, so the
                # stream can be sliced to next_pow2(max_pairs) (or
                # sentinel-padded up) without losing pairs
                from .sort_engine import bitonic_sort_pairs
                nsort = max(1024, 1 << (max_pairs - 1).bit_length())
                L = ckey.shape[0]
                if L >= nsort:
                    ckey, csid = ckey[:nsort], csid[:nsort]
                else:
                    ckey = jnp.concatenate([ckey, jnp.full(
                        (nsort - L,), n_tiles << 22, jnp.int32)])
                    csid = jnp.concatenate([csid, jnp.full(
                        (nsort - L,), P, jnp.int32)])
                sorted_key, point_list = bitonic_sort_pairs(
                    ckey, csid, interpret=interp)
            else:
                sorted_key, point_list = jax.lax.sort((ckey, csid),
                                                      num_keys=1)
            if max_pairs < sorted_key.shape[0]:
                sorted_key = sorted_key[:max_pairs]
                point_list = point_list[:max_pairs]
        elif key_only:
            # 1-operand sort; sid recovered from the rank bits post-
            # truncation (rank bits are always a REAL splat's rank, so
            # perm[rank] is in-bounds; the sentinel is restored from the
            # tile bits). Saves a full [A] payload stream through the
            # sort's multi-pass merge.
            sorted_key = jax.lax.sort(key)
            if max_pairs is not None and max_pairs < sorted_key.shape[0]:
                sorted_key = sorted_key[:max_pairs]
            tile_sorted = sorted_key >> 22
            rank = sorted_key & ((1 << 22) - 1)
            point_list = jnp.where(tile_sorted < n_tiles, perm[rank],
                                   jnp.int32(P))
        else:
            sorted_key, point_list = jax.lax.sort((key, sid), num_keys=1)
            if max_pairs is not None and max_pairs < sorted_key.shape[0]:
                sorted_key = sorted_key[:max_pairs]
                point_list = point_list[:max_pairs]
        tile_starts, tile_counts = _tile_ranges(sorted_key >> 22, n_tiles)
    else:
        point_list, tile_starts, tile_counts = _finish(
            key_tile, key_depth, sid, n_tiles, max_pairs)

    if demand_f is None:
        num_pairs, overflowed = _demand(tt, budget)
    else:
        overflowed = demand_f > budget
        num_pairs = jnp.minimum(demand_f, float(2 ** 31 - 1)).astype(jnp.int32)
    return TileLists(point_list=point_list, tile_starts=tile_starts,
                     tile_counts=tile_counts,
                     num_pairs=num_pairs,
                     overflowed=overflowed | k_overflowed,
                     k_overflowed=k_overflowed, num_big=num_big)


def build_tile_lists_depth_presort(proc: ProcessedSplats, grid_x: int,
                                   grid_y: int,
                                   max_tiles_per_splat: int = 32,
                                   max_pairs: int | None = None,
                                   big_splats: int = 256,
                                   return_ranks: bool = False,
                                   cull: CullSpec | None = None,
                                   packed_key: bool = False) -> TileLists:
    """Same contract as :func:`build_tile_lists`, enumerated in DEPTH
    order: splats are [P]-sorted by depth first and pairs keyed by
    (tile, depth RANK) — deterministic on depth ties, and the
    ``max_pairs`` budget drops the FARTHEST splats first (a strictly
    better truncation policy than trailing-id). ``overflowed`` reports
    identically, so growth logic is unchanged.

    ``return_ranks=True``: ``point_list`` holds depth RANKS and ``perm``
    maps rank -> original id. Within every tile the ranks are then
    MONOTONICALLY INCREASING, so a blend payload table permuted into
    depth order is read with locally coherent ascending row indices —
    the A-row payload gather (the measured transaction-bound cost,
    KERNELS.md §6) becomes near-sequential instead of random.
    """
    n_tiles = grid_x * grid_y
    P = proc.depth.shape[0]
    K1 = min(max_tiles_per_splat, n_tiles)
    K2 = n_tiles - K1
    B = min(big_splats, P)
    budget = max_pairs if max_pairs is not None else P * K1 + B * K2

    tt0 = jax.lax.stop_gradient(proc.tiles_touched)      # [P], 0 for culled
    depth0 = jax.lax.stop_gradient(proc.depth)
    # depth-order the splats; culled splats sink to the end
    dkey = jnp.where(tt0 > 0, depth0, jnp.inf)
    _, perm = jax.lax.sort((dkey, jnp.arange(P, dtype=jnp.int32)),
                           num_keys=1)
    tt = tt0[perm]
    rect_min = proc.rect_min[perm]
    rect_w = jnp.maximum(proc.rect_max[:, 0] - proc.rect_min[:, 0], 1)[perm]
    rank = jnp.arange(P, dtype=jnp.int32)
    if cull is not None:
        cull = cull._replace(mean2d=cull.mean2d[perm],
                             conic=cull.conic[perm],
                             qmax=cull.qmax[perm])

    # depth key = RANK (same order as depth, deterministic on ties)
    (key_tile, key_rank, sid, k_overflowed, num_big,
     demand_f) = _enumerate_two_tier(
        tt, rect_min, rect_w, rank, rank, K1, K2, B,
        grid_x, n_tiles, budget, cull=cull)
    if (packed_key and P <= (1 << 22)
            and (n_tiles + 1) * (1 << 22) + P < 2 ** 31):
        # (tile, rank) fit one int32: tile (<=2^9-1 incl. sentinel) in the
        # high bits, rank (<2^22) low — a SINGLE-key sort moves 2 streams
        # instead of 3 (the sort is the largest forward line after the
        # align-free staging, KERNELS.md §12). Exactly the same order:
        # both components are non-negative ints, so lexicographic
        # (tile, rank) == numeric tile*2^22 + rank.
        key = key_tile * (1 << 22) + key_rank
        sorted_key, point_list = jax.lax.sort((key, sid), num_keys=1)
        if max_pairs is not None and max_pairs < sorted_key.shape[0]:
            sorted_key = sorted_key[:max_pairs]
            point_list = point_list[:max_pairs]
        tile_starts, tile_counts = _tile_ranges(
            sorted_key >> 22, n_tiles)
    else:
        point_list, tile_starts, tile_counts = _finish(
            key_tile, key_rank, sid, n_tiles, max_pairs)
    if not return_ranks:
        # keep the SID SENTINEL P through the rank->id permutation
        point_list = jnp.where(point_list >= P, P,
                               perm[jnp.minimum(point_list, P - 1)])

    if demand_f is None:
        num_pairs, overflowed = _demand(tt, budget)
    else:
        overflowed = demand_f > budget
        num_pairs = jnp.minimum(demand_f, float(2 ** 31 - 1)).astype(jnp.int32)
    return TileLists(point_list=point_list, tile_starts=tile_starts,
                     tile_counts=tile_counts,
                     num_pairs=num_pairs,
                     overflowed=overflowed | k_overflowed,
                     k_overflowed=k_overflowed, num_big=num_big,
                     perm=perm if return_ranks else None)
