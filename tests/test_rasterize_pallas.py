"""Pallas blend kernel vs the XLA reference path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from langscenex_tpu.ops.projection import RasterCamera, preprocess
from langscenex_tpu.ops.binning import build_tile_lists
from langscenex_tpu.ops.rasterize import (RasterConfig, blend_tiles_xla)
from langscenex_tpu.ops.rasterize_pallas import (blend_tiles_pallas,
                                                 build_aligned_pairs)
from langscenex_tpu.ops import transforms as tf

W, H = 256, 32          # 2x4 grid of 128x8 tiles
CFG = RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=32,
                   chunk=128, max_splats_per_tile=1024)


def make_scene(P=300, seed=0):
    rng = np.random.default_rng(seed)
    fovx = 1.0
    fovy = tf.focal2fov(tf.fov2focal(fovx, W), H)
    cam = RasterCamera(w2c=jnp.eye(4),
                       proj=jnp.asarray(tf.projection_matrix(0.01, 100, fovx, fovy)),
                       width=W, height=H,
                       tan_fovx=float(np.tan(fovx / 2)),
                       tan_fovy=float(np.tan(fovy / 2)))
    means = np.stack([rng.uniform(-2, 2, P), rng.uniform(-0.3, 0.3, P),
                      rng.uniform(2, 8, P)], -1).astype(np.float32)
    scales = np.exp(rng.uniform(-3.5, -1.5, (P, 3))).astype(np.float32)
    quats = rng.normal(size=(P, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, P).astype(np.float32)
    colors = rng.uniform(0, 1, (P, 14)).astype(np.float32)
    return cam, map(jnp.asarray, (means, scales, quats, opac, colors))


def prep(cam, means, scales, quats, opac, colors):
    gx = (W + 127) // 128
    gy = (H + 7) // 8
    proc = preprocess(means, scales, quats, cam,
                      colors_precomp=colors[:, :3], tile_w=128, tile_h=8)
    lists = build_tile_lists(proc, gx, gy, 32)
    op = jnp.where(proc.visible, opac, 0.0)
    return proc, lists, op, gx, gy


class TestAlignedPairs:
    def test_layout(self):
        cam, arrs = make_scene()
        means, scales, quats, opac, colors = arrs
        proc, lists, op, gx, gy = prep(cam, means, scales, quats, opac, colors)
        ap = build_aligned_pairs(lists, gx * gy)
        starts = np.asarray(ap.starts)
        counts = np.asarray(ap.counts)
        ids = np.asarray(ap.ids)
        assert np.all(starts % 128 == 0)
        np.testing.assert_array_equal(counts, np.asarray(lists.tile_counts))
        # every tile's segment contains exactly its sorted pairs
        pl = np.asarray(lists.point_list)
        ts = np.asarray(lists.tile_starts)
        for t in range(gx * gy):
            seg = ids[starts[t]:starts[t] + counts[t]]
            np.testing.assert_array_equal(seg, pl[ts[t]:ts[t] + counts[t]])
        # padding slots are -1
        for t in range(gx * gy - 1):
            padslots = ids[starts[t] + counts[t]:starts[t + 1]]
            assert np.all(padslots == -1)


class TestPallasForward:
    def test_matches_xla_blend(self):
        cam, arrs = make_scene(P=300, seed=1)
        means, scales, quats, opac, colors = arrs
        proc, lists, op, gx, gy = prep(cam, means, scales, quats, opac, colors)

        accum_x, T_x, obs_x = blend_tiles_xla(
            lists, proc.mean2d, proc.conic, op, colors, gx, gy, CFG)
        with pltpu.force_tpu_interpret_mode():
            accum_p, T_p, obs_p = blend_tiles_pallas(
                lists, proc.mean2d, proc.conic, op, colors, gx, gy, CFG)
        np.testing.assert_allclose(np.asarray(accum_p), np.asarray(accum_x),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(T_p), np.asarray(T_x), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(obs_p), np.asarray(obs_x))

    def test_dense_occlusion_termination(self):
        # Near the T<1e-4 sticky-termination threshold, f32 associativity
        # differences (log-space carry vs multiplicative carry) can flip a
        # single splat's inclusion at isolated pixels; tolerances reflect
        # that boundary, not an algorithmic difference.
        cam, arrs = make_scene(P=500, seed=2)
        means, scales, quats, opac, colors = arrs
        opac = jnp.full_like(opac, 0.97)   # force early termination
        proc, lists, op, gx, gy = prep(cam, means, scales, quats, opac, colors)
        accum_x, T_x, obs_x = blend_tiles_xla(
            lists, proc.mean2d, proc.conic, op, colors, gx, gy, CFG)
        with pltpu.force_tpu_interpret_mode():
            accum_p, T_p, obs_p = blend_tiles_pallas(
                lists, proc.mean2d, proc.conic, op, colors, gx, gy, CFG)
        np.testing.assert_allclose(np.asarray(accum_p), np.asarray(accum_x),
                                   atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(T_p), np.asarray(T_x), atol=1e-4)
        od = np.abs(np.asarray(obs_p) - np.asarray(obs_x))
        assert od.max() <= 2 and np.mean(od > 0) < 0.02


class TestPallasBackward:
    def test_grads_match_xla(self):
        cam, arrs = make_scene(P=120, seed=3)
        means, scales, quats, opac, colors = arrs
        proc, lists, op, gx, gy = prep(cam, means, scales, quats, opac, colors)
        tgt = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (gx * gy, 14, 1024)).astype(np.float32))

        def loss_xla(mean2d, conic, o, ch):
            accum, T, _ = blend_tiles_xla(lists, mean2d, conic, o, ch,
                                          gx, gy, CFG)
            return jnp.sum((accum - tgt) ** 2) + jnp.sum(T ** 2)

        def loss_pallas(mean2d, conic, o, ch):
            with pltpu.force_tpu_interpret_mode():
                accum, T, _ = blend_tiles_pallas(lists, mean2d, conic, o, ch,
                                                 gx, gy, CFG)
            return jnp.sum((accum - tgt) ** 2) + jnp.sum(T ** 2)

        args = (proc.mean2d, proc.conic, op, colors)
        gx_ = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(*args)
        with pltpu.force_tpu_interpret_mode():
            gp_ = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*args)
        names = ("mean2d", "conic", "opacity", "channels")
        for a, b, nm in zip(gx_, gp_, names):
            scale = np.maximum(np.abs(np.asarray(a)).max(), 1e-3)
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-3 * scale, rtol=5e-3,
                err_msg=nm)

    def test_abs_hook_grads(self):
        cam, arrs = make_scene(P=80, seed=4)
        means, scales, quats, opac, colors = arrs
        proc, lists, op, gx, gy = prep(cam, means, scales, quats, opac, colors)
        P = int(means.shape[0])

        def loss(mean2d, hook):
            with pltpu.force_tpu_interpret_mode():
                accum, T, _ = blend_tiles_pallas(
                    lists, mean2d, proc.conic, op, colors, gx, gy, CFG,
                    mean2d_abs_hook=hook)
            return jnp.sum(accum ** 2)

        with pltpu.force_tpu_interpret_mode():
            g_signed, g_abs = jax.grad(loss, argnums=(0, 1))(
                proc.mean2d, jnp.zeros((P, 2)))
        g_signed = np.asarray(g_signed)
        g_abs = np.asarray(g_abs)
        assert np.all(g_abs >= -1e-6)
        # |signed| <= abs (triangle inequality over pixels)
        assert np.all(np.abs(g_signed) <= g_abs + 1e-3)
        # and abs is strictly larger somewhere (cancellation exists)
        assert np.any(g_abs > np.abs(g_signed) + 1e-5)


class TestPallasSquareTiles:
    def test_32x32_matches_xla_and_default_tiles(self):
        """The kernel's tile rectangle is a free parameter (pixels are DATA
        on the 1024-lane axis): a 32x32-tile render must match both the XLA
        path at the same tiling and the 128x8 pallas render (grads too)."""
        import dataclasses

        from langscenex_tpu.ops.rasterize import rasterize
        cam, arrs = make_scene(P=300, seed=9)
        means, scales, quats, opac, colors = arrs
        sq = RasterConfig(tile_w=32, tile_h=32, max_tiles_per_splat=32,
                          chunk=128, max_splats_per_tile=1024,
                          use_pallas=True)

        def render(cfg):
            def f(op):
                with pltpu.force_tpu_interpret_mode():
                    out = rasterize(means, scales, quats, op, cam,
                                    jnp.zeros(3), colors_precomp=colors,
                                    cfg=cfg)
                return jnp.sum(out.color ** 2), out.color
            with pltpu.force_tpu_interpret_mode():
                (loss, color), g = jax.value_and_grad(f, has_aux=True)(opac)
            return np.asarray(color), np.asarray(g)

        c_sq, g_sq = render(sq)
        c_xla, g_xla = render(dataclasses.replace(sq, use_pallas=False))
        c_def, _ = render(dataclasses.replace(CFG, use_pallas=True))
        np.testing.assert_allclose(c_sq, c_xla, atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(g_sq, g_xla, atol=2e-3, rtol=5e-3)
        # cross-tiling: different tile-center-relative f32 rounding can
        # flip isolated near-threshold inclusions; bound, don't bit-match
        np.testing.assert_allclose(c_sq, c_def, atol=5e-3, rtol=1e-2)


class TestPallasDepthRank:
    def test_rank_path_matches_id_path(self):
        """payload_depth_rank through the FUSED kernel (interpret mode):
        rank-indexed lists + depth-permuted inputs == id-indexed render."""
        import dataclasses

        from langscenex_tpu.ops.rasterize import rasterize
        cam, arrs = make_scene(P=300, seed=7)
        means, scales, quats, opac, colors = arrs
        base = dataclasses.replace(CFG, use_pallas=True, depth_presort=True)
        rank = dataclasses.replace(base, payload_depth_rank=True)

        def render(cfg):
            with pltpu.force_tpu_interpret_mode():
                return rasterize(means, scales, quats, opac, cam,
                                 jnp.zeros(3), colors_precomp=colors,
                                 cfg=cfg)
        a = render(base)
        b = render(rank)
        np.testing.assert_array_equal(np.asarray(a.color),
                                      np.asarray(b.color))
        np.testing.assert_array_equal(np.asarray(a.final_T),
                                      np.asarray(b.final_T))
        np.testing.assert_array_equal(np.asarray(a.out_observe),
                                      np.asarray(b.out_observe))


class TestAlignFree:
    """Round-3 align-free staging (RasterConfig.align_free): the kernel
    walks TRUE unaligned tile ranges (head-masked shared chunks +
    read-merge-write on chunk boundaries) and the payload is gathered
    ONCE in sorted-pair order. Must be BIT-identical to the aligned
    layout — forward, gradients, and observe counts — including tiles
    sharing a chunk, budget truncation, and the early-exit path."""

    def _render(self, cfg, P=300, seed=3, opac_hi=0.95, grads=False):
        import dataclasses
        from langscenex_tpu.ops.rasterize import rasterize
        rng = np.random.default_rng(seed)
        fovx = 1.0
        fovy = tf.focal2fov(tf.fov2focal(fovx, W), H)
        cam = RasterCamera(
            w2c=jnp.eye(4),
            proj=jnp.asarray(tf.projection_matrix(0.01, 100, fovx, fovy)),
            width=W, height=H, tan_fovx=float(np.tan(fovx / 2)),
            tan_fovy=float(np.tan(fovy / 2)))
        means = jnp.asarray(np.stack(
            [rng.uniform(-2, 2, P), rng.uniform(-0.3, 0.3, P),
             rng.uniform(2, 8, P)], -1), jnp.float32)
        scales = jnp.asarray(np.exp(rng.uniform(-3.5, -1.5, (P, 3))),
                             jnp.float32)
        quats = rng.normal(size=(P, 4))
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
        quats = jnp.asarray(quats, jnp.float32)
        opac = jnp.asarray(rng.uniform(0.2, opac_hi, P), jnp.float32)
        shs = jnp.asarray(
            np.concatenate([rng.uniform(0, 1, (P, 1, 3)),
                            np.zeros((P, 0, 3))], 1), jnp.float32)
        lang = jnp.asarray(rng.uniform(-1, 1, (P, 3)), jnp.float32)
        inst = jnp.asarray(rng.uniform(-1, 1, (P, 3)), jnp.float32)

        def run(op):
            with pltpu.force_tpu_interpret_mode():
                out = rasterize(means, scales, quats, op, cam,
                                jnp.zeros(3), shs=shs, sh_degree=0,
                                language_feature=lang,
                                instance_feature=inst, cfg=cfg)
                return out

        out = run(opac)
        res = {"color": np.asarray(out.color),
               "lang": np.asarray(out.language),
               "T": np.asarray(out.final_T),
               "obs": np.asarray(out.out_observe)}
        if grads:
            def loss(op, m):
                with pltpu.force_tpu_interpret_mode():
                    o = rasterize(m, scales, quats, op, cam, jnp.zeros(3),
                                  shs=shs, sh_degree=0,
                                  language_feature=lang,
                                  instance_feature=inst, cfg=cfg)
                return (jnp.sum(o.color * o.color)
                        + jnp.sum(o.language) + jnp.sum(o.final_T))
            with pltpu.force_tpu_interpret_mode():
                go, gm = jax.grad(loss, argnums=(0, 1))(opac, means)
            res["gop"] = np.asarray(go)
            res["gmeans"] = np.asarray(gm)
        return res

    @pytest.mark.parametrize("max_pairs", [4096, 1024])
    def test_matches_aligned_forward_and_grads(self, max_pairs):
        # NOT bit-equal by construction: the per-chunk transmittance
        # carry splits at different rows (segments start mid-chunk), so
        # f32 prefix rounding differs at ~1e-7. Same pairs, same order,
        # same math — tight tolerances, exact observe counts.
        import dataclasses
        base = dataclasses.replace(CFG, use_pallas=True,
                                   max_pairs=max_pairs, align_free=False)
        free = dataclasses.replace(base, align_free=True)
        a = self._render(base, grads=True)
        b = self._render(free, grads=True)
        for k in ("color", "lang", "T"):
            np.testing.assert_allclose(a[k], b[k], atol=1e-5, rtol=1e-5,
                                       err_msg=k)
        np.testing.assert_array_equal(a["obs"], b["obs"])
        for k in ("gop", "gmeans"):
            np.testing.assert_allclose(a[k], b[k], atol=2e-4, rtol=1e-3,
                                       err_msg=k)

    def test_early_exit_overdraw(self):
        # near-opaque splats drive the early-exit + zero-fill path
        import dataclasses
        base = dataclasses.replace(CFG, use_pallas=True, max_pairs=2048,
                                   align_free=False)
        free = dataclasses.replace(base, align_free=True)
        a = self._render(base, P=500, seed=5, opac_hi=0.999)
        b = self._render(free, P=500, seed=5, opac_hi=0.999)
        for k in ("color", "lang", "T"):
            np.testing.assert_allclose(a[k], b[k], atol=1e-5, rtol=1e-5,
                                       err_msg=k)
        np.testing.assert_array_equal(a["obs"], b["obs"])

    def test_matches_xla_reference(self):
        import dataclasses
        free = dataclasses.replace(CFG, use_pallas=True, max_pairs=4096,
                                   align_free=True)
        xla = dataclasses.replace(CFG, use_pallas=False, max_pairs=4096)
        a = self._render(xla)
        b = self._render(free)
        np.testing.assert_allclose(a["color"], b["color"], atol=1e-5)
        np.testing.assert_allclose(a["T"], b["T"], atol=1e-6)
        np.testing.assert_array_equal(a["obs"], b["obs"])
