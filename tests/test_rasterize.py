import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langscenex_tpu.ops.projection import RasterCamera, preprocess
from langscenex_tpu.ops.binning import build_tile_lists
from langscenex_tpu.ops.rasterize import (RasterConfig, rasterize,
                                          blend_tiles_xla, ALPHA_MIN)
from langscenex_tpu.ops import transforms as tf
from naive_raster import naive_blend


def make_camera(W=64, H=32, fov=0.8, z_offset=0.0):
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = z_offset
    fovx, fovy = fov, fov * H / W
    proj = tf.projection_matrix(0.01, 100.0, fovx, fovy)
    return RasterCamera(w2c=jnp.asarray(w2c), proj=jnp.asarray(proj),
                        width=W, height=H,
                        tan_fovx=float(np.tan(fovx / 2)),
                        tan_fovy=float(np.tan(fovy / 2)))


def random_scene(P=50, seed=0, spread=1.0, zmin=2.0, zmax=6.0):
    rng = np.random.default_rng(seed)
    means = np.zeros((P, 3), np.float32)
    means[:, 0] = rng.uniform(-spread, spread, P)
    means[:, 1] = rng.uniform(-spread * 0.5, spread * 0.5, P)
    means[:, 2] = rng.uniform(zmin, zmax, P)
    scales = np.exp(rng.uniform(-3.5, -2.0, (P, 3))).astype(np.float32)
    quats = rng.normal(size=(P, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opacity = rng.uniform(0.2, 0.95, P).astype(np.float32)
    colors = rng.uniform(0, 1, (P, 3)).astype(np.float32)
    return means, scales, quats, opacity, colors


SMALL_CFG = RasterConfig(tile_w=16, tile_h=8, max_tiles_per_splat=64,
                         chunk=16, max_splats_per_tile=128)


class TestBlendVsNaive:
    def test_matches_sequential_semantics(self):
        """Vectorized blend must reproduce the literal sequential CUDA
        semantics on a single-tile image, including sticky termination."""
        rng = np.random.default_rng(7)
        P, H, W = 40, 8, 16
        mean2d = rng.uniform(-2, W + 2, (P, 2)).astype(np.float32)
        mean2d[:, 1] = rng.uniform(-2, H + 2, P)
        # random positive-definite conics
        a = rng.uniform(0.05, 0.8, P)
        c = rng.uniform(0.05, 0.8, P)
        b = rng.uniform(-1, 1, P) * np.sqrt(a * c) * 0.8
        conic = np.stack([a, b, c], -1).astype(np.float32)
        opacity = rng.uniform(0.3, 0.99, P).astype(np.float32)
        channels = rng.uniform(0, 1, (P, 3)).astype(np.float32)
        bg = np.array([0.1, 0.2, 0.3], np.float32)
        order = np.argsort(rng.normal(size=P)).astype(np.int32)

        golden, golden_T, golden_obs = naive_blend(
            list(order), mean2d, conic, opacity, channels, H, W, bg)

        # Drive blend_tiles_xla directly with a single tile covering the image
        from langscenex_tpu.ops.binning import TileLists
        cfg = RasterConfig(tile_w=W, tile_h=H, chunk=8, max_splats_per_tile=40)
        lists = TileLists(point_list=jnp.asarray(order),
                          tile_starts=jnp.array([0], jnp.int32),
                          tile_counts=jnp.array([P], jnp.int32),
                          num_pairs=jnp.array(P), overflowed=jnp.array(False))
        accum, T, obs = blend_tiles_xla(
            lists, jnp.asarray(mean2d), jnp.asarray(conic),
            jnp.asarray(opacity), jnp.asarray(channels), 1, 1, cfg)
        img = np.asarray(accum[0]).reshape(3, H, W) + np.asarray(T[0]).reshape(H, W) * bg[:, None, None]
        np.testing.assert_allclose(img, golden, atol=1e-5)
        np.testing.assert_allclose(np.asarray(T[0]).reshape(H, W), golden_T, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(obs), golden_obs)

    def test_high_opacity_termination(self):
        """Dense stack of near-opaque splats exercises the T<1e-4 sticky
        termination path."""
        P, H, W = 60, 8, 8
        mean2d = np.full((P, 2), 3.5, np.float32)
        conic = np.tile(np.array([[0.5, 0.0, 0.5]], np.float32), (P, 1))
        opacity = np.full(P, 0.95, np.float32)
        rng = np.random.default_rng(8)
        channels = rng.uniform(0, 1, (P, 3)).astype(np.float32)
        bg = np.zeros(3, np.float32)
        order = np.arange(P, dtype=np.int32)

        golden, golden_T, golden_obs = naive_blend(
            list(order), mean2d, conic, opacity, channels, H, W, bg)
        from langscenex_tpu.ops.binning import TileLists
        cfg = RasterConfig(tile_w=W, tile_h=H, chunk=16, max_splats_per_tile=64)
        lists = TileLists(point_list=jnp.asarray(order),
                          tile_starts=jnp.array([0], jnp.int32),
                          tile_counts=jnp.array([P], jnp.int32),
                          num_pairs=jnp.array(P), overflowed=jnp.array(False))
        accum, T, obs = blend_tiles_xla(
            lists, jnp.asarray(mean2d), jnp.asarray(conic),
            jnp.asarray(opacity), jnp.asarray(channels), 1, 1, cfg)
        img = np.asarray(accum[0]).reshape(3, H, W)
        np.testing.assert_allclose(img, golden, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(obs), golden_obs)


class TestEndToEnd:
    def test_single_splat_analytic(self):
        """One isotropic splat at the optical axis: pixel alpha is
        analytically o*exp(-0.5 d^2 / sigma2) with sigma2 = (f s / z)^2+0.3."""
        cam = make_camera(W=64, H=32)
        s, z, o = 0.05, 3.0, 0.8
        means = jnp.array([[0.0, 0.0, z]])
        scales = jnp.full((1, 3), s)
        quats = jnp.array([[1.0, 0, 0, 0]])
        color = jnp.array([[1.0, 0.5, 0.25]])
        bg = jnp.zeros(3)
        out = rasterize(means, scales, quats, jnp.array([o]), cam, bg,
                        colors_precomp=color, cfg=SMALL_CFG)
        sigx2 = (cam.focal_x * s / z) ** 2 + 0.3
        sigy2 = (cam.focal_y * s / z) ** 2 + 0.3
        cxp, cyp = (cam.width - 1) / 2, (cam.height - 1) / 2
        img = np.asarray(out.color)
        for (px, py) in [(32, 16), (30, 14), (35, 16)]:
            d2 = (px - cxp) ** 2 / sigx2 + (py - cyp) ** 2 / sigy2
            alpha = o * np.exp(-0.5 * d2)
            if alpha < ALPHA_MIN:
                alpha = 0.0
            np.testing.assert_allclose(img[:, py, px], alpha * np.asarray(color[0]),
                                       atol=2e-3)

    def test_front_occludes_back(self):
        cam = make_camera(W=32, H=32, fov=0.6)
        means = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 5.0]])
        scales = jnp.full((2, 3), 0.2)
        quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
        colors = jnp.array([[1.0, 0, 0], [0, 1.0, 0]])
        opac = jnp.array([0.99, 0.99])
        out = rasterize(means, scales, quats, opac, cam, jnp.zeros(3),
                        colors_precomp=colors, cfg=SMALL_CFG)
        center = np.asarray(out.color[:, 16, 16])
        assert center[0] > 0.9
        assert center[1] < 0.1

    def test_full_pipeline_vs_naive(self):
        """Random scene through the full preprocess+binning+blend matches the
        naive per-pixel oracle fed the same preprocessed values."""
        cam = make_camera(W=48, H=24)
        means, scales, quats, opacity, colors = random_scene(P=80, seed=11)
        out = rasterize(jnp.asarray(means), jnp.asarray(scales),
                        jnp.asarray(quats), jnp.asarray(opacity), cam,
                        jnp.array([0.2, 0.1, 0.0]),
                        colors_precomp=jnp.asarray(colors), cfg=SMALL_CFG)

        proc = preprocess(jnp.asarray(means), jnp.asarray(scales),
                          jnp.asarray(quats), cam,
                          colors_precomp=jnp.asarray(colors),
                          tile_w=SMALL_CFG.tile_w, tile_h=SMALL_CFG.tile_h)
        # naive: global depth order, all splats visible against every pixel
        vis = np.asarray(proc.visible)
        depth = np.asarray(proc.depth)
        order = [int(i) for i in np.argsort(depth, kind='stable') if vis[i]]
        op = np.where(vis, opacity, 0.0)
        golden, golden_T, _ = naive_blend(
            order, np.asarray(proc.mean2d), np.asarray(proc.conic),
            op, np.asarray(proc.rgb), cam.height, cam.width,
            np.array([0.2, 0.1, 0.0], np.float32),
            rect_min=np.asarray(proc.rect_min), rect_max=np.asarray(proc.rect_max),
            tile_w=SMALL_CFG.tile_w, tile_h=SMALL_CFG.tile_h)
        np.testing.assert_allclose(np.asarray(out.color), golden, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.final_T), golden_T, atol=1e-5)

    def test_feature_and_geo_channels(self):
        cam = make_camera(W=32, H=16)
        means, scales, quats, opacity, colors = random_scene(P=30, seed=12)
        P = means.shape[0]
        rng = np.random.default_rng(13)
        lang = rng.uniform(-1, 1, (P, 3)).astype(np.float32)
        inst = rng.uniform(-1, 1, (P, 3)).astype(np.float32)
        allm = np.zeros((P, 5), np.float32)
        allm[:, :3] = rng.normal(size=(P, 3))
        allm[:, 3] = 1.0
        allm[:, 4] = rng.uniform(1, 5, P)
        out = rasterize(jnp.asarray(means), jnp.asarray(scales),
                        jnp.asarray(quats), jnp.asarray(opacity), cam,
                        jnp.zeros(3), colors_precomp=jnp.asarray(colors),
                        language_feature=jnp.asarray(lang),
                        instance_feature=jnp.asarray(inst),
                        all_map=jnp.asarray(allm), cfg=SMALL_CFG)
        assert out.language.shape == (3, 16, 32)
        assert out.instance.shape == (3, 16, 32)
        assert out.all_map.shape == (5, 16, 32)
        assert out.plane_depth.shape == (16, 32)
        # alpha channel of all_map equals 1 - final_T
        np.testing.assert_allclose(np.asarray(out.all_map[3]),
                                   1.0 - np.asarray(out.final_T), atol=1e-4)

    def test_gradients_finite_difference(self):
        cam = make_camera(W=24, H=16)
        means, scales, quats, opacity, colors = random_scene(P=12, seed=14)

        def loss_fn(op):
            out = rasterize(jnp.asarray(means), jnp.asarray(scales),
                            jnp.asarray(quats), op, cam, jnp.zeros(3),
                            colors_precomp=jnp.asarray(colors), cfg=SMALL_CFG)
            return jnp.sum(out.color ** 2)

        op0 = jnp.asarray(opacity)
        g = jax.grad(loss_fn)(op0)
        eps = 1e-3
        for i in [0, 3, 7]:
            lp = loss_fn(op0.at[i].add(eps))
            lm = loss_fn(op0.at[i].add(-eps))
            fd = (lp - lm) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, rtol=2e-2, atol=2e-3)

    def test_mean_gradients(self):
        cam = make_camera(W=24, H=16)
        means, scales, quats, opacity, colors = random_scene(P=12, seed=15)

        def loss_fn(m):
            out = rasterize(m, jnp.asarray(scales), jnp.asarray(quats),
                            jnp.asarray(opacity), cam, jnp.zeros(3),
                            colors_precomp=jnp.asarray(colors), cfg=SMALL_CFG)
            return jnp.sum(out.color ** 2)

        m0 = jnp.asarray(means)
        g = jax.grad(loss_fn)(m0)
        assert np.all(np.isfinite(np.asarray(g)))
        eps = 1e-3
        for (i, j) in [(0, 0), (5, 2)]:
            lp = loss_fn(m0.at[i, j].add(eps))
            lm = loss_fn(m0.at[i, j].add(-eps))
            fd = float(lp - lm) / (2 * eps)
            np.testing.assert_allclose(float(g[i, j]), fd, rtol=5e-2, atol=5e-3)

    def test_mean2d_offset_gradient_path(self):
        """The screen-space gradient hook used for densification stats."""
        cam = make_camera(W=24, H=16)
        means, scales, quats, opacity, colors = random_scene(P=12, seed=16)

        def loss_fn(off):
            out = rasterize(jnp.asarray(means), jnp.asarray(scales),
                            jnp.asarray(quats), jnp.asarray(opacity), cam,
                            jnp.zeros(3), colors_precomp=jnp.asarray(colors),
                            mean2d_offset=off, cfg=SMALL_CFG)
            return jnp.sum(out.color ** 2)

        g = jax.grad(loss_fn)(jnp.zeros((12, 2)))
        assert np.any(np.asarray(g) != 0)
        assert np.all(np.isfinite(np.asarray(g)))


class TestBinning:
    def test_counts_and_order(self):
        cam = make_camera(W=48, H=24)
        means, scales, quats, opacity, colors = random_scene(P=40, seed=17)
        proc = preprocess(jnp.asarray(means), jnp.asarray(scales),
                          jnp.asarray(quats), cam,
                          colors_precomp=jnp.asarray(colors),
                          tile_w=16, tile_h=8)
        gx, gy = 3, 3
        lists = build_tile_lists(proc, gx, gy, max_tiles_per_splat=64)
        assert not bool(lists.overflowed)
        assert int(lists.num_pairs) == int(np.sum(np.asarray(proc.tiles_touched)))
        starts = np.asarray(lists.tile_starts)
        counts = np.asarray(lists.tile_counts)
        pl = np.asarray(lists.point_list)
        depth = np.asarray(proc.depth)
        assert int(np.sum(counts)) == int(lists.num_pairs)
        for t in range(gx * gy):
            ids = pl[starts[t]:starts[t] + counts[t]]
            d = depth[ids]
            assert np.all(np.diff(d) >= 0), f"tile {t} not depth sorted"

    def test_against_bruteforce_oracle(self):
        """Both builders vs a numpy brute-force oracle on scenes with
        culled splats, a full-screen splat, and buffer overflow: per-tile
        id SETS must match exactly; within-tile order must be depth-
        nondecreasing; overflow must drop whole splats by the documented
        policy (trailing-id for the default builder, farthest-depth for
        the presort one) plus at most one mid-rect split."""
        from langscenex_tpu.ops.binning import build_tile_lists_depth_presort
        cam = make_camera(W=48, H=24)
        means, scales, quats, opacity, colors = random_scene(P=50, seed=31)
        means[7, 2] = -1.0                 # behind camera -> culled
        scales[11] = 3.0                   # full-screen splat
        proc = preprocess(jnp.asarray(means), jnp.asarray(scales),
                          jnp.asarray(quats), cam,
                          colors_precomp=jnp.asarray(colors),
                          tile_w=16, tile_h=8)
        gx, gy = 3, 3
        tt = np.asarray(proc.tiles_touched)
        rmin = np.asarray(proc.rect_min)
        rmax = np.asarray(proc.rect_max)
        depth = np.asarray(proc.depth)

        def oracle_pairs(order):
            """Brute-force (tile -> [ids in depth order]) honoring a
            per-splat enumeration order and the A-slot budget."""
            pairs = []          # (slot, tile, id)
            slot = 0
            for i in order:
                w = max(rmax[i, 0] - rmin[i, 0], 1)
                for k in range(int(tt[i])):
                    tx = rmin[i, 0] + k % w
                    ty = rmin[i, 1] + k // w
                    pairs.append((slot, ty * gx + tx, i))
                    slot += 1
            return pairs

        demand = int(tt.sum())
        for builder, order in (
                (build_tile_lists, np.arange(50)),
                (build_tile_lists_depth_presort,
                 np.argsort(np.where(tt > 0, depth, np.inf),
                            kind='stable'))):
            for A in (demand + 8, demand // 2):     # exact fit + overflow
                lists = builder(proc, gx, gy, max_tiles_per_splat=64,
                                max_pairs=A)
                assert bool(lists.overflowed) == (demand > A)
                assert int(lists.num_pairs) == demand
                surviving = [p for p in oracle_pairs(order) if p[0] < A]
                starts = np.asarray(lists.tile_starts)
                counts = np.asarray(lists.tile_counts)
                pl = np.asarray(lists.point_list)
                assert int(counts.sum()) == len(surviving)
                for t in range(gx * gy):
                    got = sorted(pl[starts[t]:starts[t] + counts[t]])
                    want = sorted(i for _, tl, i in surviving if tl == t)
                    assert got == want, f"tile {t} ids differ (A={A})"
                    d = depth[pl[starts[t]:starts[t] + counts[t]]]
                    assert np.all(np.diff(d) >= 0)

    def test_depth_presort_equivalent(self):
        """build_tile_lists_depth_presort: same per-tile id sets in the
        same depth order as the default builder (depths are distinct with
        prob 1, so tie-ordering differences cannot hide here), and the
        full render is bitwise-identical."""
        from langscenex_tpu.ops.binning import build_tile_lists_depth_presort
        from langscenex_tpu.ops.rasterize import rasterize, RasterConfig
        import dataclasses
        cam = make_camera(W=48, H=24)
        means, scales, quats, opacity, colors = random_scene(P=60, seed=23)
        proc = preprocess(jnp.asarray(means), jnp.asarray(scales),
                          jnp.asarray(quats), cam,
                          colors_precomp=jnp.asarray(colors),
                          tile_w=16, tile_h=8)
        gx, gy = 3, 3
        a = build_tile_lists(proc, gx, gy, max_tiles_per_splat=64)
        b = build_tile_lists_depth_presort(proc, gx, gy,
                                           max_tiles_per_splat=64)
        assert int(a.num_pairs) == int(b.num_pairs)
        np.testing.assert_array_equal(np.asarray(a.tile_starts),
                                      np.asarray(b.tile_starts))
        np.testing.assert_array_equal(np.asarray(a.tile_counts),
                                      np.asarray(b.tile_counts))
        sa, ca = np.asarray(a.tile_starts), np.asarray(a.tile_counts)
        pa, pb = np.asarray(a.point_list), np.asarray(b.point_list)
        for t in range(gx * gy):
            np.testing.assert_array_equal(pa[sa[t]:sa[t] + ca[t]],
                                          pb[sa[t]:sa[t] + ca[t]])
        cfg0 = RasterConfig(tile_w=16, tile_h=8)
        out0 = rasterize(jnp.asarray(means), jnp.asarray(scales),
                         jnp.asarray(quats), jnp.asarray(opacity), cam,
                         jnp.zeros(3), colors_precomp=jnp.asarray(colors),
                         cfg=cfg0)
        out1 = rasterize(jnp.asarray(means), jnp.asarray(scales),
                         jnp.asarray(quats), jnp.asarray(opacity), cam,
                         jnp.zeros(3), colors_precomp=jnp.asarray(colors),
                         cfg=dataclasses.replace(cfg0, depth_presort=True))
        np.testing.assert_array_equal(np.asarray(out0.color),
                                      np.asarray(out1.color))

    def test_payload_depth_rank_identical(self):
        """payload_depth_rank: ranks + permuted blend inputs must give a
        bitwise-identical render, identical observe counters, identical
        gradients (incl. through opacity), and per-tile MONOTONE ranks
        (the coherence property the knob exists for)."""
        import dataclasses

        from langscenex_tpu.ops.binning import build_tile_lists_depth_presort
        from langscenex_tpu.ops.rasterize import RasterConfig, rasterize
        cam = make_camera(W=48, H=24)
        means, scales, quats, opacity, colors = random_scene(P=70, seed=31)
        proc = preprocess(jnp.asarray(means), jnp.asarray(scales),
                          jnp.asarray(quats), cam,
                          colors_precomp=jnp.asarray(colors),
                          tile_w=16, tile_h=8)
        gx, gy = 3, 3
        r = build_tile_lists_depth_presort(proc, gx, gy,
                                           max_tiles_per_splat=64,
                                           return_ranks=True)
        assert r.perm is not None
        starts, counts = np.asarray(r.tile_starts), np.asarray(r.tile_counts)
        pl = np.asarray(r.point_list)
        for t in range(gx * gy):
            ranks = pl[starts[t]:starts[t] + counts[t]]
            assert np.all(np.diff(ranks) > 0), f"tile {t} ranks not monotone"
        # perm[rank] must reproduce the id-space point list
        b = build_tile_lists_depth_presort(proc, gx, gy,
                                           max_tiles_per_splat=64)
        perm = np.asarray(r.perm)
        for t in range(gx * gy):
            np.testing.assert_array_equal(
                perm[pl[starts[t]:starts[t] + counts[t]]],
                np.asarray(b.point_list)[starts[t]:starts[t] + counts[t]])

        cfg_a = RasterConfig(tile_w=16, tile_h=8, depth_presort=True)
        cfg_b = dataclasses.replace(cfg_a, payload_depth_rank=True)

        def render(cfg, opac):
            return rasterize(jnp.asarray(means), jnp.asarray(scales),
                             jnp.asarray(quats), opac, cam, jnp.zeros(3),
                             colors_precomp=jnp.asarray(colors), cfg=cfg)

        oa = render(cfg_a, jnp.asarray(opacity))
        ob = render(cfg_b, jnp.asarray(opacity))
        np.testing.assert_array_equal(np.asarray(oa.color),
                                      np.asarray(ob.color))
        np.testing.assert_array_equal(np.asarray(oa.final_T),
                                      np.asarray(ob.final_T))
        np.testing.assert_array_equal(np.asarray(oa.out_observe),
                                      np.asarray(ob.out_observe))

        def loss(cfg):
            def f(opac):
                out = render(cfg, opac)
                return jnp.sum(out.color ** 2)
            return jax.grad(f)(jnp.asarray(opacity))

        np.testing.assert_allclose(np.asarray(loss(cfg_a)),
                                   np.asarray(loss(cfg_b)),
                                   rtol=1e-6, atol=1e-7)


class TestTileCull:
    """tile_cull drops (splat, tile) pairs that provably fail the blend's
    alpha >= 1/255 gate at every pixel: output must be (near-)identical,
    pair demand strictly lower on anisotropic scenes, and every culled
    pair must be verifiably sub-threshold by brute force."""

    def test_rect_qmin_exact(self):
        from langscenex_tpu.ops.binning import _rect_qmin
        rng = np.random.default_rng(0)
        for _ in range(200):
            # random PSD conic
            m = rng.normal(size=(2, 2))
            S = m @ m.T + 0.05 * np.eye(2)
            a, b, c = S[0, 0], S[0, 1], S[1, 1]
            lx, ly = rng.uniform(-20, 10, 2)
            hx, hy = lx + rng.uniform(1, 15), ly + rng.uniform(1, 15)
            got = float(_rect_qmin(jnp.float32(a), jnp.float32(b),
                                   jnp.float32(c), jnp.float32(lx),
                                   jnp.float32(hx), jnp.float32(ly),
                                   jnp.float32(hy)))
            # dense-grid oracle (min over rect sampled at 60x60)
            xs = np.linspace(lx, hx, 60)
            ys = np.linspace(ly, hy, 60)
            X, Y = np.meshgrid(xs, ys)
            Q = a * X * X + 2 * b * X * Y + c * Y * Y
            # closed form must LOWER-bound the sampled min (up to f32
            # eval rounding — the cull's own +0.05 q-margin dwarfs this)
            assert got <= Q.min() * (1 + 1e-5) + 1e-4, (got, Q.min())
            assert got >= Q.min() - 0.3 * max(1.0, Q.min()), (got, Q.min())

    def _scene(self, P=150, seed=11):
        cam = make_camera(W=64, H=32)
        means, scales, quats, opacity, colors = random_scene(P=P, seed=seed)
        # make splats strongly anisotropic so AABBs far overcover support
        rng = np.random.default_rng(seed)
        scales[:, 0] *= rng.uniform(4.0, 10.0, P)
        return cam, means, scales, quats, opacity, colors

    def test_output_identical_fewer_pairs(self):
        import dataclasses
        cam, means, scales, quats, opacity, colors = self._scene()
        cfg0 = RasterConfig(tile_w=16, tile_h=8, max_tiles_per_splat=64,
                            chunk=32, max_splats_per_tile=256,
                            tile_cull=False, use_pallas=False)
        cfg1 = dataclasses.replace(cfg0, tile_cull=True)

        def render(cfg):
            return rasterize(jnp.asarray(means), jnp.asarray(scales),
                             jnp.asarray(quats), jnp.asarray(opacity), cam,
                             jnp.zeros(3), colors_precomp=jnp.asarray(colors),
                             cfg=cfg)
        a, b = render(cfg0), render(cfg1)
        np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(a.final_T),
                                   np.asarray(b.final_T), atol=2e-5)
        np.testing.assert_array_equal(np.asarray(a.out_observe),
                                      np.asarray(b.out_observe))
        assert int(b.num_pairs) < int(a.num_pairs), \
            (int(b.num_pairs), int(a.num_pairs))
        # gradients agree too (binning is bookkeeping; blend sees a
        # subset whose dropped members contribute exactly zero)
        def loss(cfg):
            def f(o):
                out = rasterize(jnp.asarray(means), jnp.asarray(scales),
                                jnp.asarray(quats), o, cam, jnp.zeros(3),
                                colors_precomp=jnp.asarray(colors), cfg=cfg)
                return jnp.sum(out.color ** 2)
            return np.asarray(jax.grad(f)(jnp.asarray(opacity)))
        np.testing.assert_allclose(loss(cfg1), loss(cfg0),
                                   rtol=1e-4, atol=1e-6)

    def test_culled_pairs_are_subthreshold(self):
        """Brute force: every pair the cull REMOVED has alpha < 1/255 at
        every pixel of its tile (so removal is exact, not approximate)."""
        from langscenex_tpu.ops.binning import (CullSpec, build_tile_lists)
        cam, means, scales, quats, opacity, colors = self._scene(P=80, seed=3)
        tw, th = 16, 8
        proc = preprocess(jnp.asarray(means), jnp.asarray(scales),
                          jnp.asarray(quats), cam,
                          colors_precomp=jnp.asarray(colors),
                          tile_w=tw, tile_h=th)
        gx, gy = 4, 4
        op = np.where(np.asarray(proc.visible), opacity, 0.0)
        qmax = 2.0 * np.log(np.maximum(255.0 * op, 1e-12)) + 0.05
        cull = CullSpec(mean2d=proc.mean2d, conic=proc.conic,
                        qmax=jnp.asarray(qmax), tile_w=tw, tile_h=th)
        l0 = build_tile_lists(proc, gx, gy, max_tiles_per_splat=64)
        l1 = build_tile_lists(proc, gx, gy, max_tiles_per_splat=64,
                              cull=cull)

        def pair_set(l):
            s, c, pl = (np.asarray(l.tile_starts), np.asarray(l.tile_counts),
                        np.asarray(l.point_list))
            return {(t, int(i)) for t in range(gx * gy)
                    for i in pl[s[t]:s[t] + c[t]]}
        removed = pair_set(l0) - pair_set(l1)
        assert pair_set(l1) <= pair_set(l0)
        assert len(removed) > 0
        assert int(l1.num_pairs) == len(pair_set(l1))
        mean2d = np.asarray(proc.mean2d)
        conic = np.asarray(proc.conic)
        for t, i in removed:
            tx, ty = t % gx, t // gx
            X, Y = np.meshgrid(np.arange(tx * tw, tx * tw + tw),
                               np.arange(ty * th, ty * th + th))
            dx = X - mean2d[i, 0]
            dy = Y - mean2d[i, 1]
            a_, b_, c_ = conic[i]
            power = -0.5 * (a_ * dx * dx + c_ * dy * dy) - b_ * dx * dy
            alpha = op[i] * np.exp(power)
            assert alpha.max() < 1.0 / 255.0, (t, i, alpha.max())


class TestOpacityAwareBinning:
    """opacity_aware_radius bins with the alpha-support radius
    (covariance.conic_and_radius): output must match 3-sigma binning to
    float-reassociation noise while producing strictly fewer pairs on a
    low-opacity scene, and the reported densify radii must stay 3-sigma."""

    def _render(self, flag, means, scales, quats, opacity, colors, cam):
        cfg = RasterConfig(tile_w=16, tile_h=8, max_tiles_per_splat=64,
                           chunk=32, max_splats_per_tile=256,
                           opacity_aware_radius=flag, use_pallas=False)
        return rasterize(jnp.asarray(means), jnp.asarray(scales),
                         jnp.asarray(quats), jnp.asarray(opacity), cam,
                         jnp.zeros(3), colors_precomp=jnp.asarray(colors),
                         cfg=cfg)

    def test_output_identical_fewer_pairs(self):
        cam = make_camera(W=64, H=32)
        means, scales, quats, _, colors = random_scene(P=120, seed=5)
        rng = np.random.default_rng(5)
        opacity = rng.uniform(0.0, 0.4, 120).astype(np.float32)  # low-o heavy
        a = self._render(False, means, scales, quats, opacity, colors, cam)
        b = self._render(True, means, scales, quats, opacity, colors, cam)
        np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(a.final_T),
                                   np.asarray(b.final_T), atol=2e-5)

        p0 = preprocess(jnp.asarray(means), jnp.asarray(scales),
                        jnp.asarray(quats), cam,
                        colors_precomp=jnp.asarray(colors),
                        tile_w=16, tile_h=8)
        p1 = preprocess(jnp.asarray(means), jnp.asarray(scales),
                        jnp.asarray(quats), cam,
                        colors_precomp=jnp.asarray(colors),
                        tile_w=16, tile_h=8, opacity=jnp.asarray(opacity))
        n0 = int(np.sum(np.asarray(p0.tiles_touched)))
        n1 = int(np.sum(np.asarray(p1.tiles_touched)))
        assert n1 < n0, (n1, n0)
        # densify stats parity: radii of surviving splats stay 3-sigma
        vis = np.asarray(p1.visible)
        np.testing.assert_array_equal(np.asarray(p0.radius)[vis],
                                      np.asarray(p1.radius)[vis])


class TestPackedSort:
    def test_packed_key_matches_two_key(self):
        """depth_presort + packed_key: ONE int32 (tile<<22 | rank) key
        must reproduce the 2-key (tile, rank) sort exactly (both
        components non-negative => lexicographic == numeric)."""
        import numpy as np
        from langscenex_tpu.ops.binning import build_tile_lists_depth_presort
        from langscenex_tpu.ops.projection import preprocess
        cam = make_camera(W=128, H=96)
        rng = np.random.default_rng(7)
        P = 400
        means = jnp.asarray(np.stack(
            [rng.uniform(-2, 2, P), rng.uniform(-0.5, 0.5, P),
             rng.uniform(2, 8, P)], -1), jnp.float32)
        scales = jnp.asarray(np.exp(rng.uniform(-3.5, -1.5, (P, 3))),
                             jnp.float32)
        quats = rng.normal(size=(P, 4))
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
        cols = jnp.asarray(rng.uniform(0, 1, (P, 3)), jnp.float32)
        proc = preprocess(means, scales, jnp.asarray(quats, jnp.float32),
                          cam, colors_precomp=cols, tile_w=32, tile_h=32)
        gx = (cam.width + 31) // 32
        gy = (cam.height + 31) // 32
        for mp in (None, 512):
            a = build_tile_lists_depth_presort(proc, gx, gy, 16,
                                               max_pairs=mp)
            b = build_tile_lists_depth_presort(proc, gx, gy, 16,
                                               max_pairs=mp,
                                               packed_key=True)
            np.testing.assert_array_equal(np.asarray(a.point_list),
                                          np.asarray(b.point_list))
            np.testing.assert_array_equal(np.asarray(a.tile_starts),
                                          np.asarray(b.tile_starts))
            np.testing.assert_array_equal(np.asarray(a.tile_counts),
                                          np.asarray(b.tile_counts))


class TestMultiTierAndRankKey:
    """Round-4 binning options: mid enumeration tiers (small K1, exact)
    and the id-order rank-packed single-key sort."""

    def _scene(self, P=600, seed=11):
        rng = np.random.default_rng(seed)
        means = np.stack([rng.uniform(-2, 2, P), rng.uniform(-1, 1, P),
                          rng.uniform(2, 9, P)], -1).astype(np.float32)
        # heavy-tailed scales: most splats small, a tail of mid/large
        # ones exercising every tier
        ls = rng.uniform(-4.0, -2.0, (P, 3))
        big = rng.random(P) < 0.08
        ls[big] += rng.uniform(1.0, 2.5, (int(big.sum()), 1))
        scales = np.exp(ls).astype(np.float32)
        quats = rng.normal(size=(P, 4)).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
        opacity = rng.uniform(0.2, 0.95, P).astype(np.float32)
        colors = rng.uniform(0, 1, (P, 3)).astype(np.float32)
        return means, scales, quats, opacity, colors

    def _proc(self, cam, means, scales, quats, colors):
        return preprocess(jnp.asarray(means), jnp.asarray(scales),
                          jnp.asarray(quats), cam,
                          colors_precomp=jnp.asarray(colors),
                          tile_w=16, tile_h=8)

    def test_extra_tiers_match_fat_k1(self):
        """K1=4 + mid tiers must reproduce the exact fat-K1 build:
        same per-tile sets, same depth order, no overflow."""
        cam = make_camera(W=128, H=64)
        means, scales, quats, opacity, colors = self._scene()
        proc = self._proc(cam, means, scales, quats, colors)
        gx, gy = 8, 8
        ref = build_tile_lists(proc, gx, gy, max_tiles_per_splat=64,
                               big_splats=64)
        assert not bool(ref.k_overflowed)
        out = build_tile_lists(proc, gx, gy, max_tiles_per_splat=4,
                               big_splats=64,
                               extra_tiers=((256, 12), (128, 16)))
        assert not bool(out.k_overflowed)
        assert int(out.num_pairs) == int(ref.num_pairs)
        rs, rc = np.asarray(ref.tile_starts), np.asarray(ref.tile_counts)
        os_, oc = np.asarray(out.tile_starts), np.asarray(out.tile_counts)
        np.testing.assert_array_equal(rc, oc)
        rp, op = np.asarray(ref.point_list), np.asarray(out.point_list)
        depth = np.asarray(proc.depth)
        for t in range(gx * gy):
            a = rp[rs[t]:rs[t] + rc[t]]
            b = op[os_[t]:os_[t] + oc[t]]
            assert set(a.tolist()) == set(b.tolist()), f"tile {t}"
            assert np.all(np.diff(depth[b]) >= 0), f"tile {t} order"

    def test_extra_tiers_overflow_flag(self):
        """An undersized mid tier must raise k_overflowed."""
        cam = make_camera(W=128, H=64)
        means, scales, quats, opacity, colors = self._scene()
        proc = self._proc(cam, means, scales, quats, colors)
        gx, gy = 8, 8
        out = build_tile_lists(proc, gx, gy, max_tiles_per_splat=2,
                               big_splats=1, extra_tiers=((1, 8),))
        assert bool(out.k_overflowed)

    def test_rank_key_matches_two_key(self):
        """rank_key single-key sort == (tile, depth) 2-key sort when
        depths are distinct (rank order == depth order)."""
        cam = make_camera(W=128, H=64)
        means, scales, quats, opacity, colors = self._scene(seed=23)
        proc = self._proc(cam, means, scales, quats, colors)
        gx, gy = 8, 8
        for mp in (None, 700):
            a = build_tile_lists(proc, gx, gy, max_tiles_per_splat=64,
                                 big_splats=64, max_pairs=mp)
            b = build_tile_lists(proc, gx, gy, max_tiles_per_splat=64,
                                 big_splats=64, max_pairs=mp,
                                 rank_key=True)
            np.testing.assert_array_equal(np.asarray(a.tile_starts),
                                          np.asarray(b.tile_starts))
            np.testing.assert_array_equal(np.asarray(a.tile_counts),
                                          np.asarray(b.tile_counts))
            # same per-tile sets in the same depth order (ties broken
            # deterministically by rank; this scene has distinct depths)
            np.testing.assert_array_equal(np.asarray(a.point_list),
                                          np.asarray(b.point_list))

    def test_rank_key_auto_fallback_big_grid(self):
        """rank_key packs (tile << 22 | rank) into int32 — past 2^9
        tiles it must FALL BACK to the 2-key sort silently and still
        produce correct lists (rank_key_sort is default-on since r4, so
        the fallback is load-bearing for large-grid configs)."""
        cam = make_camera(W=128, H=64)
        means, scales, quats, opacity, colors = self._scene(seed=11)
        proc = self._proc(cam, means, scales, quats, colors)
        gx, gy = 64, 16                      # 1024 tiles > 2^9 ceiling
        a = build_tile_lists(proc, gx, gy, max_tiles_per_splat=64,
                             big_splats=64)
        b = build_tile_lists(proc, gx, gy, max_tiles_per_splat=64,
                             big_splats=64, rank_key=True)
        np.testing.assert_array_equal(np.asarray(a.point_list),
                                      np.asarray(b.point_list))
        np.testing.assert_array_equal(np.asarray(a.tile_starts),
                                      np.asarray(b.tile_starts))

    def test_key_only_matches_rank_key(self):
        """key_only (1-operand sort + sid recovered from the rank bits)
        must reproduce rank_key's lists EXACTLY, including the sid
        sentinel P on invalid/truncated slots."""
        cam = make_camera(W=128, H=64)
        means, scales, quats, opacity, colors = self._scene(seed=31)
        proc = self._proc(cam, means, scales, quats, colors)
        gx, gy = 8, 8
        P = means.shape[0]
        for mp in (None, 700):
            for tiers in ((), ((256, 12), (128, 16))):
                k1 = 64 if not tiers else 4
                a = build_tile_lists(proc, gx, gy, max_tiles_per_splat=k1,
                                     big_splats=64, max_pairs=mp,
                                     extra_tiers=tiers, rank_key=True)
                b = build_tile_lists(proc, gx, gy, max_tiles_per_splat=k1,
                                     big_splats=64, max_pairs=mp,
                                     extra_tiers=tiers, rank_key=True,
                                     key_only=True)
                np.testing.assert_array_equal(np.asarray(a.point_list),
                                              np.asarray(b.point_list))
                np.testing.assert_array_equal(np.asarray(a.tile_starts),
                                              np.asarray(b.tile_starts))
                np.testing.assert_array_equal(np.asarray(a.tile_counts),
                                              np.asarray(b.tile_counts))
                # sentinel preserved: slots outside every tile range are P
                pl = np.asarray(b.point_list)
                covered = np.zeros(pl.shape[0], bool)
                st = np.asarray(b.tile_starts)
                ct = np.asarray(b.tile_counts)
                for t in range(gx * gy):
                    covered[st[t]:st[t] + ct[t]] = True
                assert np.all(pl[covered] < P)

    def test_render_identical_with_tiers_and_rank_key(self):
        """Full rasterize: tiers + rank_key + cull must be bit-identical
        to the baseline config (XLA blend path, CPU)."""
        cam = make_camera(W=128, H=64)
        means, scales, quats, opacity, colors = self._scene(seed=5)
        base = RasterConfig(tile_w=16, tile_h=8, max_tiles_per_splat=64,
                            chunk=16, max_splats_per_tile=256,
                            big_splats=64)
        tiered = RasterConfig(tile_w=16, tile_h=8, max_tiles_per_splat=4,
                              chunk=16, max_splats_per_tile=256,
                              big_splats=64,
                              extra_tiers=((256, 12), (128, 16)),
                              rank_key_sort=True)
        args = (jnp.asarray(means), jnp.asarray(scales),
                jnp.asarray(quats), jnp.asarray(opacity)[:, None], cam,
                jnp.zeros(3))
        o1 = rasterize(*args, colors_precomp=jnp.asarray(colors), cfg=base)
        o2 = rasterize(*args, colors_precomp=jnp.asarray(colors),
                       cfg=tiered)
        np.testing.assert_array_equal(np.asarray(o1.color),
                                      np.asarray(o2.color))
        np.testing.assert_array_equal(np.asarray(o1.final_T),
                                      np.asarray(o2.final_T))


class TestSortBasedRegisters:
    """ADVICE r4: the B_max > 1024 sort-based register branch (taken by
    the exact bench config's 7168-wide tier) vs the lax.top_k branch."""

    def test_sort_branch_matches_topk_branch(self):
        # reuse the heavy-tailed tier scene
        cam = make_camera(W=128, H=64)
        helper = TestMultiTierAndRankKey()
        means, scales, quats, opacity, colors = helper._scene(P=1400, seed=31)
        proc = helper._proc(cam, means, scales, quats, colors)
        gx, gy = 8, 8
        # identical tier THRESHOLDS; register sizes straddle the 1024
        # engine cutoff — both exact, so the sorted lists must be
        # bit-identical (same pair set, same keys)
        a = build_tile_lists(proc, gx, gy, max_tiles_per_splat=4,
                             big_splats=64,
                             extra_tiers=((1000, 12), (128, 16)))
        b = build_tile_lists(proc, gx, gy, max_tiles_per_splat=4,
                             big_splats=64,
                             extra_tiers=((1300, 12), (128, 16)))
        assert not bool(a.k_overflowed) and not bool(b.k_overflowed)
        np.testing.assert_array_equal(np.asarray(a.tile_starts),
                                      np.asarray(b.tile_starts))
        np.testing.assert_array_equal(np.asarray(a.tile_counts),
                                      np.asarray(b.tile_counts))
        # same pair multiset per tile, same depth order => same list
        rs, rc = np.asarray(a.tile_starts), np.asarray(a.tile_counts)
        pa, pb = np.asarray(a.point_list), np.asarray(b.point_list)
        depth = np.asarray(proc.depth)
        for t in range(gx * gy):
            la = pa[rs[t]:rs[t] + rc[t]]
            lb = pb[rs[t]:rs[t] + rc[t]]
            assert set(la.tolist()) == set(lb.tolist()), f"tile {t}"
            assert np.all(np.diff(depth[lb]) >= 0), f"tile {t} order"
