"""Pallas bitonic sort engine for (key, sid) int32 pair streams.

The second half of the round-5 sort-domain attack (docs/KERNELS.md §16):
after ops/compaction.py shrinks the pair stream to the max_pairs budget,
the remaining cost is XLA's variadic sort itself — a general-purpose
multi-pass merge measured far off the HBM roofline at this size. This
engine is a hand-scheduled bitonic network:

  - **local phase**: one kernel instance per S-element block runs the
    full bitonic network for stages k = 2..S entirely in VMEM
    (S = 2^16: 512 KB of key+sid per block). Every compare-exchange
    step is whole-block vector ops: partners at distance j are lane
    rolls (j < 128) or sublane rolls (j >= 128) — i ^ j pairing never
    crosses the wraparound because 2j divides the axis length.
  - **merge phase**: for stages k = 2S..N, the cross-block steps
    (j >= S) reshape the [N] stream to [N/(2j), 2, j] so each partner
    PAIR of blocks is adjacent on axis 1 — one grid instance loads both
    [1, 2, S] halves and compare-exchanges them elementwise; the
    direction bit ((i & k) == 0) is constant per instance and comes off
    the program ids. The j < S tail of each stage is one local-finish
    kernel. All calls alias input->output buffers (in-place chain).

For N = 2^19, S = 2^16 that is 1 local + 6 cross + 3 finish calls
(~10 passes of 4 MB r+w each) vs lax.sort's generic merge cascade.

Bit-identity contract (matches the compaction caller): the network is
NOT stable, but binning's valid keys are UNIQUE (tile << 22 | per-splat
depth rank) and sentinel slots carry one uniform (key, sid) — so the
sorted output is identical to lax.sort((key, sid), num_keys=1)
wherever it is observable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
S_BLOCK = 1 << 16              # elements per local block


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _row_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)


def _partner(x, j):
    """Value at index i ^ j along the flattened [R, 128] block (j a
    power of two < R*128)."""
    R, L = x.shape[-2], x.shape[-1]
    ax = len(x.shape) - 1
    if j < L:
        first = (_lane_iota(x.shape) & j) == 0
        return first, jnp.where(first, pltpu.roll(x, L - j, ax),
                                pltpu.roll(x, j, ax))
    jr = j // L
    first = (_row_iota(x.shape) & jr) == 0
    return first, jnp.where(first, pltpu.roll(x, R - jr, ax - 1),
                            pltpu.roll(x, jr, ax - 1))


def _ce(key, sid, j, k, base, S, tie_sid=False):
    """One bitonic compare-exchange step (k, j) on a [R, 128] block
    whose first element has global index ``base`` (a multiple of S).
    ``tie_sid``: order equal keys by sid (lexicographic) — matches
    lax.sort's stable id order when sids are the original indices."""
    first, pk = _partner(key, j)
    _, ps = _partner(sid, j)
    if k < LANES:
        asc = (_lane_iota(key.shape) & k) == 0
    elif k < S:
        asc = (_row_iota(key.shape) & (k // LANES)) == 0
    else:
        asc = (base & k) == 0                      # scalar, broadcasts
    take_min = first == asc
    lt = pk < key
    gt = pk > key
    if tie_sid:
        eq = pk == key
        lt = lt | (eq & (ps < sid))
        gt = gt | (eq & (ps > sid))
    swap = (take_min & lt) | (~take_min & gt)
    return jnp.where(swap, pk, key), jnp.where(swap, ps, sid)


def _local_kernel(key_ref, sid_ref, okey_ref, osid_ref, *, S, stages,
                  tie_sid=False):
    """Run the (k, j) steps of ``stages`` entirely in VMEM."""
    base = pl.program_id(0) * S
    key = key_ref[0]
    sid = sid_ref[0]
    for (k, j) in stages:
        key, sid = _ce(key, sid, j, k, base, S, tie_sid)
    okey_ref[0] = key
    osid_ref[0] = sid


def _cross_kernel(key_ref, sid_ref, okey_ref, osid_ref, *, k, j, S,
                  tie_sid=False):
    """Compare-exchange the two adjacent [S] halves of a partner pair
    at stride j (axis-1 of the [N/(2j), 2, j] view selects the pair;
    the grid's second axis walks the j/S sub-blocks)."""
    o = pl.program_id(0)
    a_k = key_ref[0, 0]
    b_k = key_ref[0, 1]
    a_s = sid_ref[0, 0]
    b_s = sid_ref[0, 1]
    asc = ((o * 2 * j) & k) == 0                   # scalar per pair
    lt = b_k < a_k
    gt = b_k > a_k
    if tie_sid:
        eq = b_k == a_k
        lt = lt | (eq & (b_s < a_s))
        gt = gt | (eq & (b_s > a_s))
    swap = (asc & lt) | (jnp.logical_not(asc) & gt)
    okey_ref[0, 0] = jnp.where(swap, b_k, a_k)
    okey_ref[0, 1] = jnp.where(swap, a_k, b_k)
    osid_ref[0, 0] = jnp.where(swap, b_s, a_s)
    osid_ref[0, 1] = jnp.where(swap, a_s, b_s)


def _steps(k, j_hi, j_lo=1):
    j = j_hi
    out = []
    while j >= j_lo:
        out.append((k, j))
        j //= 2
    return out


def _stages_local(S):
    out = []
    k = 2
    while k <= S:
        out += _steps(k, k // 2)
        k *= 2
    return out


def bitonic_sort_pairs(key: jnp.ndarray, sid: jnp.ndarray,
                       interpret: bool = False,
                       s_block: int = S_BLOCK,
                       tie_sid: bool = False):
    """Sort (key, sid) by key ascending. len must be a power of two
    >= 1024. Equal keys: arbitrary payload order (see module
    docstring for when that is observably identical to lax.sort)."""
    N = key.shape[0]
    assert N >= 1024 and (N & (N - 1)) == 0, N
    S = min(N, s_block)
    M = N // S
    R = S // LANES

    def local_call(key, sid, stages):
        spec = pl.BlockSpec((1, R, LANES), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_local_kernel, S=S, stages=stages,
                              tie_sid=tie_sid),
            grid=(M,),
            in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((M, R, LANES), jnp.int32)] * 2,
            input_output_aliases={0: 0, 1: 1},
            interpret=interpret,
        )(key.reshape(M, R, LANES), sid.reshape(M, R, LANES))

    def cross_call(key, sid, k, j):
        s = j // S                                 # sub-blocks per half
        outer = N // (2 * j)
        spec = pl.BlockSpec((1, 2, R, LANES), lambda o, i: (o, 0, i, 0),
                            memory_space=pltpu.VMEM)
        shape = (outer, 2, s * R, LANES)
        kk, ss = pl.pallas_call(
            functools.partial(_cross_kernel, k=k, j=j, S=S,
                              tie_sid=tie_sid),
            grid=(outer, s),
            in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct(shape, jnp.int32)] * 2,
            input_output_aliases={0: 0, 1: 1},
            interpret=interpret,
        )(key.reshape(shape), sid.reshape(shape))
        return kk, ss

    # local phase: full network up to stage S
    kk, ss = local_call(key, sid, _stages_local(S))
    # merge phase
    k = 2 * S
    while k <= N:
        j = k // 2
        while j >= S:
            kk, ss = cross_call(kk.reshape(-1), ss.reshape(-1), k, j)
            j //= 2
        kk, ss = local_call(kk.reshape(-1), ss.reshape(-1),
                            _steps(k, S // 2, 1))
        k *= 2
    return kk.reshape(-1), ss.reshape(-1)
