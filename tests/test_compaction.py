"""Pallas stream compaction vs the argsort reference (interpret mode)."""
import numpy as np
import jax.numpy as jnp
import pytest

from langscenex_tpu.ops.compaction import (compact_pairs, compact_pairs_ref,
                                           CH_ROWS, LANES)

SENT_MIN = 345 << 22          # bench-scale tile sentinel
FILL_K = 345 << 22
FILL_S = 100_000


def _run(key, sid, budget):
    ck, cs = compact_pairs(jnp.asarray(key), jnp.asarray(sid), SENT_MIN,
                           budget, FILL_K, FILL_S, interpret=True)
    rk, rs = compact_pairs_ref(jnp.asarray(key), jnp.asarray(sid), SENT_MIN,
                               FILL_K, FILL_S)
    n = int(np.sum(key < SENT_MIN))
    assert n <= budget
    ck, cs = np.asarray(ck), np.asarray(cs)
    rk, rs = np.asarray(rk), np.asarray(rs)
    # the valid prefix is the same (key, sid) MULTISET (order within the
    # prefix is arbitrary — the by-key in-row partition reorders; the
    # caller's global sort is what fixes order)
    a = np.stack([ck[:n], cs[:n]], 1)
    b = np.stack([rk[:n], rs[:n]], 1)
    np.testing.assert_array_equal(a[np.lexsort((a[:, 1], a[:, 0]))],
                                  b[np.lexsort((b[:, 1], b[:, 0]))])
    # everything past the valid prefix is exactly the sentinel fill
    assert np.all(ck[n:] == FILL_K)
    assert np.all(cs[n:] == FILL_S)


@pytest.mark.parametrize("seed,density", [(0, 0.3), (1, 0.05), (2, 0.9)])
def test_random_streams(seed, density):
    rng = np.random.default_rng(seed)
    A = 3 * CH_ROWS * LANES + 517          # non-multiple: exercises padding
    valid = rng.uniform(size=A) < density
    key = np.where(valid,
                   rng.integers(0, SENT_MIN, A),
                   SENT_MIN + rng.integers(0, 1000, A)).astype(np.int32)
    sid = rng.integers(0, FILL_S, A).astype(np.int32)
    _run(key, sid, int(valid.sum()) + 7)


def test_adversarial_rows():
    """Full rows, empty rows, single-element rows — boundary phases."""
    rng = np.random.default_rng(3)
    rows = []
    for r in range(2 * CH_ROWS + 3):
        kind = r % 4
        if kind == 0:
            m = np.ones(LANES, bool)            # full row
        elif kind == 1:
            m = np.zeros(LANES, bool)           # empty row
        elif kind == 2:
            m = np.zeros(LANES, bool)
            m[rng.integers(0, LANES)] = True    # singleton
        else:
            m = rng.uniform(size=LANES) < 0.5
        rows.append(m)
    valid = np.concatenate(rows)
    A = valid.size
    key = np.where(valid, rng.integers(0, SENT_MIN, A),
                   SENT_MIN).astype(np.int32)
    sid = rng.integers(0, FILL_S, A).astype(np.int32)
    _run(key, sid, int(valid.sum()))


def test_all_valid_and_all_invalid():
    A = CH_ROWS * LANES
    rng = np.random.default_rng(4)
    key = rng.integers(0, SENT_MIN, A).astype(np.int32)
    sid = rng.integers(0, FILL_S, A).astype(np.int32)
    _run(key, sid, A)
    _run(np.full(A, SENT_MIN, np.int32), sid, 128)


def test_sorted_equivalence():
    """Sorting the compacted stream == sorting the full domain (the
    binning contract: unique valid keys, sentinel tail)."""
    import jax
    rng = np.random.default_rng(5)
    A = CH_ROWS * LANES + 999
    valid = rng.uniform(size=A) < 0.25
    # unique keys for the valid slots (like tile<<22|rank)
    perm = rng.permutation(A).astype(np.int32)
    key = np.where(valid, perm, SENT_MIN).astype(np.int32)
    sid = rng.integers(0, FILL_S, A).astype(np.int32)
    budget = int(valid.sum()) + 13

    ck, cs = compact_pairs(jnp.asarray(key), jnp.asarray(sid), SENT_MIN,
                           budget, FILL_K, FILL_S, interpret=True)
    sk_c, ss_c = jax.lax.sort((ck, cs), num_keys=1)
    sk_f, ss_f = jax.lax.sort((jnp.asarray(key),
                               jnp.where(jnp.asarray(key) < SENT_MIN,
                                         jnp.asarray(sid), FILL_S)),
                              num_keys=1)
    n = budget
    np.testing.assert_array_equal(np.asarray(sk_c)[:n], np.asarray(sk_f)[:n])
    np.testing.assert_array_equal(np.asarray(ss_c)[:n], np.asarray(ss_f)[:n])


def test_binning_bit_identical():
    """build_tile_lists(compact=True) == compact=False on a real scene
    (rank-key path, budget cap, conic cull) — the wire-in contract."""
    import jax.numpy as jnp
    from langscenex_tpu.ops import transforms as tf
    from langscenex_tpu.ops.binning import build_tile_lists, CullSpec
    from langscenex_tpu.ops.projection import RasterCamera, preprocess

    W, H = 256, 128
    rng = np.random.default_rng(7)
    P = 4000
    fovx = 1.0
    fovy = tf.focal2fov(tf.fov2focal(fovx, W), H)
    cam = RasterCamera(
        w2c=jnp.eye(4),
        proj=jnp.asarray(tf.projection_matrix(0.01, 100, fovx, fovy)),
        width=W, height=H, tan_fovx=float(np.tan(fovx / 2)),
        tan_fovy=float(np.tan(fovy / 2)))
    means = np.stack([rng.uniform(-2, 2, P), rng.uniform(-1, 1, P),
                      rng.uniform(2, 8, P)], -1).astype(np.float32)
    scales = np.exp(rng.uniform(-4, -1.5, (P, 3))).astype(np.float32)
    quats = rng.normal(size=(P, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = jnp.asarray(rng.uniform(0.2, 0.95, P).astype(np.float32))
    gx, gy = (W + 31) // 32, (H + 31) // 32
    proc = preprocess(jnp.asarray(means), jnp.asarray(scales),
                      jnp.asarray(quats), cam, tile_w=32, tile_h=32,
                      opacity=opac,
                      colors_precomp=jnp.asarray(
                          rng.uniform(0, 1, (P, 3)).astype(np.float32)))
    op = jnp.where(proc.visible, opac, 0.0)
    qmax = 2.0 * jnp.log(jnp.maximum(255.0 * op, 1e-12)) + 0.05
    cull = CullSpec(mean2d=proc.mean2d, conic=proc.conic, qmax=qmax,
                    tile_w=32, tile_h=32)
    # sized to this scene's measured tail: tt>8 = 335, tt>16 = 4,
    # culled demand 11,308 — exact (k_overflowed False), uncapped
    kw = dict(max_tiles_per_splat=8, max_pairs=12000, big_splats=16,
              cull=cull, extra_tiers=((512, 8),), rank_key=True)
    a = build_tile_lists(proc, gx, gy, **kw)
    b = build_tile_lists(proc, gx, gy, **kw, compact=True)
    np.testing.assert_array_equal(np.asarray(a.point_list),
                                  np.asarray(b.point_list))
    np.testing.assert_array_equal(np.asarray(a.tile_starts),
                                  np.asarray(b.tile_starts))
    np.testing.assert_array_equal(np.asarray(a.tile_counts),
                                  np.asarray(b.tile_counts))
    assert not bool(a.overflowed) and not bool(b.overflowed)


def test_binning_pallas_sort_bit_identical():
    """compact_sort + pallas bitonic engine == plain lax.sort lists."""
    import jax.numpy as jnp
    from langscenex_tpu.ops import transforms as tf
    from langscenex_tpu.ops.binning import build_tile_lists, CullSpec
    from langscenex_tpu.ops.projection import RasterCamera, preprocess

    W, H = 256, 128
    rng = np.random.default_rng(7)
    P = 4000
    fovx = 1.0
    fovy = tf.focal2fov(tf.fov2focal(fovx, W), H)
    cam = RasterCamera(
        w2c=jnp.eye(4),
        proj=jnp.asarray(tf.projection_matrix(0.01, 100, fovx, fovy)),
        width=W, height=H, tan_fovx=float(np.tan(fovx / 2)),
        tan_fovy=float(np.tan(fovy / 2)))
    means = np.stack([rng.uniform(-2, 2, P), rng.uniform(-1, 1, P),
                      rng.uniform(2, 8, P)], -1).astype(np.float32)
    scales = np.exp(rng.uniform(-4, -1.5, (P, 3))).astype(np.float32)
    quats = rng.normal(size=(P, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = jnp.asarray(rng.uniform(0.2, 0.95, P).astype(np.float32))
    gx, gy = (W + 31) // 32, (H + 31) // 32
    proc = preprocess(jnp.asarray(means), jnp.asarray(scales),
                      jnp.asarray(quats), cam, tile_w=32, tile_h=32,
                      opacity=opac,
                      colors_precomp=jnp.asarray(
                          rng.uniform(0, 1, (P, 3)).astype(np.float32)))
    op = jnp.where(proc.visible, opac, 0.0)
    qmax = 2.0 * jnp.log(jnp.maximum(255.0 * op, 1e-12)) + 0.05
    cull = CullSpec(mean2d=proc.mean2d, conic=proc.conic, qmax=qmax,
                    tile_w=32, tile_h=32)
    kw = dict(max_tiles_per_splat=8, max_pairs=12000, big_splats=16,
              cull=cull, extra_tiers=((512, 8),), rank_key=True)
    a = build_tile_lists(proc, gx, gy, **kw)
    b = build_tile_lists(proc, gx, gy, **kw, compact=True,
                         pallas_sort=True)
    np.testing.assert_array_equal(np.asarray(a.point_list),
                                  np.asarray(b.point_list))
    np.testing.assert_array_equal(np.asarray(a.tile_starts),
                                  np.asarray(b.tile_starts))
    np.testing.assert_array_equal(np.asarray(a.tile_counts),
                                  np.asarray(b.tile_counts))


def test_depth_perm_engine_matches_stable_sort():
    """The engine-backed depth permutation (bitcast f32 keys + tie_sid)
    == lax.sort's stable order, INCLUDING duplicate depths and culled
    +inf rows — the TPU-only rank path, driven via interpret mode."""
    from langscenex_tpu.ops.binning import _depth_perm

    rng = np.random.default_rng(11)
    P = 3000
    depth = rng.uniform(2.0, 10.0, P).astype(np.float32)
    depth[rng.integers(0, P, 300)] = np.float32(5.25)   # forced ties
    dkey = np.where(rng.uniform(size=P) < 0.1,
                    np.float32(np.inf), depth)          # culled rows
    sid = np.arange(P, dtype=np.int32)
    a = _depth_perm(jnp.asarray(dkey), jnp.asarray(sid), use_engine=False)
    b = _depth_perm(jnp.asarray(dkey), jnp.asarray(sid), use_engine=True,
                    interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
