"""Bitonic sort engine vs lax.sort (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langscenex_tpu.ops.sort_engine import bitonic_sort_pairs


def _check(key, sid, s_block):
    kk, ss = bitonic_sort_pairs(jnp.asarray(key), jnp.asarray(sid),
                                interpret=True, s_block=s_block)
    rk, rs = jax.lax.sort((jnp.asarray(key), jnp.asarray(sid)), num_keys=1)
    np.testing.assert_array_equal(np.asarray(kk), np.asarray(rk))
    # payloads identical wherever keys are unique; grouped-equal where not
    key_np = np.asarray(key)
    if len(np.unique(key_np)) == key_np.size:
        np.testing.assert_array_equal(np.asarray(ss), np.asarray(rs))
    else:
        # same multiset of (key, sid) pairs
        a = np.stack([np.asarray(kk), np.asarray(ss)], 1)
        b = np.stack([np.asarray(rk), np.asarray(rs)], 1)
        a = a[np.lexsort((a[:, 1], a[:, 0]))]
        b = b[np.lexsort((b[:, 1], b[:, 0]))]
        np.testing.assert_array_equal(a, b)


def test_single_block():
    rng = np.random.default_rng(0)
    N = 2048
    key = rng.permutation(N).astype(np.int32)        # unique
    sid = rng.integers(0, 1 << 22, N).astype(np.int32)
    _check(key, sid, s_block=2048)


def test_multi_block_merge():
    """N/s_block = 4: exercises cross-block merges + local finishes."""
    rng = np.random.default_rng(1)
    N = 4096
    key = rng.permutation(N).astype(np.int32)
    sid = rng.integers(0, 1 << 22, N).astype(np.int32)
    _check(key, sid, s_block=1024)


def test_duplicates_and_sentinels():
    """Binning-like stream: unique valid keys + a uniform sentinel
    tail — the exact observability contract."""
    rng = np.random.default_rng(2)
    N = 4096
    nvalid = 1500
    SENT = 345 << 22
    key = np.full(N, SENT, np.int32)
    key[:nvalid] = rng.choice(SENT, nvalid, replace=False).astype(np.int32)
    key = rng.permutation(key)
    sid = np.where(key < SENT, rng.integers(0, 100000, N), 100000
                   ).astype(np.int32)
    kk, ss = bitonic_sort_pairs(jnp.asarray(key), jnp.asarray(sid),
                                interpret=True, s_block=1024)
    rk, rs = jax.lax.sort((jnp.asarray(key), jnp.asarray(sid)), num_keys=1)
    np.testing.assert_array_equal(np.asarray(kk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(ss), np.asarray(rs))


def test_presorted_and_reversed():
    N = 2048
    key = np.arange(N, dtype=np.int32)
    sid = np.arange(N, dtype=np.int32) + 7
    _check(key, sid, s_block=1024)
    _check(key[::-1].copy(), sid, s_block=1024)


def test_tie_sid_matches_stable_sort():
    """tie_sid=True == lax.sort's stable order on duplicate keys."""
    rng = np.random.default_rng(9)
    N = 4096
    key = rng.integers(0, 50, N).astype(np.int32)     # heavy duplicates
    sid = np.arange(N, dtype=np.int32)
    rngp = rng.permutation(N)
    key, sid = key[rngp], sid[rngp]
    kk, ss = bitonic_sort_pairs(jnp.asarray(key), jnp.asarray(sid),
                                interpret=True, s_block=1024,
                                tie_sid=True)
    rk, rs = jax.lax.sort((jnp.asarray(key), jnp.asarray(sid)), num_keys=2)
    np.testing.assert_array_equal(np.asarray(kk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(ss), np.asarray(rs))
