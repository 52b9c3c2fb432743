import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langscenex_tpu.ops import losses as L
from langscenex_tpu.ops.knn import mean_dist3_sq, morton_codes
from langscenex_tpu.ops.depth_normal import (depth_to_points_cam,
                                             points_to_normals,
                                             normal_from_depth)


class TestBasicLosses:
    def test_l1_l2(self):
        x = jnp.array([1.0, 2.0, 3.0])
        y = jnp.array([2.0, 2.0, 1.0])
        assert float(L.l1_loss(x, y)) == pytest.approx(1.0)
        assert float(L.l2_loss(x, y)) == pytest.approx(5.0 / 3.0)

    def test_cos(self):
        x = jnp.eye(3)
        assert float(L.cos_loss(x, x)) == pytest.approx(0.0, abs=1e-6)
        y = -x
        assert float(L.cos_loss(x, y)) == pytest.approx(2.0, abs=1e-6)


class TestSSIM:
    def test_identical(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (3, 32, 48)).astype(np.float32))
        assert float(L.ssim(img, img)) == pytest.approx(1.0, abs=1e-4)

    def test_against_torch_reference(self):
        """Cross-check against an independent torch implementation of the
        standard SSIM (gaussian 11x11 sigma 1.5, zero padding)."""
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(1)
        a = rng.uniform(0, 1, (3, 24, 40)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)

        xs = torch.arange(11, dtype=torch.float64) - 5
        g = torch.exp(-(xs ** 2) / (2 * 1.5 ** 2))
        g = (g / g.sum()).float()
        w2 = (g[:, None] @ g[None, :]).expand(3, 1, 11, 11).contiguous()

        def f(x):
            return F.conv2d(torch.from_numpy(x)[None], w2, padding=5, groups=3)

        mu1, mu2 = f(a), f(b)
        s1 = f(a * a) - mu1 ** 2
        s2 = f(b * b) - mu2 ** 2
        s12 = f(a * b) - mu1 * mu2
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        smap = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
            (mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2))
        golden = float(smap.mean())

        ours = float(L.ssim(jnp.asarray(a), jnp.asarray(b)))
        assert ours == pytest.approx(golden, abs=1e-5)

    def test_differentiable(self):
        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.uniform(0, 1, (3, 16, 16)).astype(np.float32))
        b = jnp.asarray(rng.uniform(0, 1, (3, 16, 16)).astype(np.float32))
        g = jax.grad(lambda x: L.ssim(x, b))(a)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_filter_precision_pinned(self):
        """The SSIM filter convs MUST carry HIGHEST precision: TPU convs
        default to bf16 inputs, and the E[x^2]-E[x]^2 variance form then
        catastrophically cancels (observed SSIM of 6.4 / -1.28 in real TPU
        training — garbage loss and gradients that stalled a full run at
        PSNR ~9). CPU ignores precision, so this pins the jaxpr attribute
        rather than the numerics."""
        a = jnp.zeros((3, 16, 16), jnp.float32)
        jx = str(jax.make_jaxpr(lambda x: L.ssim(x, x))(a))
        n_conv = jx.count("conv_general_dilated")
        assert n_conv > 0
        assert jx.count("HIGHEST") >= n_conv, (
            "SSIM filter convs lost precision=HIGHEST — this silently "
            "breaks TPU training (bf16 variance cancellation)")


class TestLNCC:
    def test_identical_patches(self):
        rng = np.random.default_rng(3)
        p = jnp.asarray(rng.uniform(0, 1, (10, 49)).astype(np.float32))
        ncc, mask = L.lncc(p, p)
        np.testing.assert_allclose(np.asarray(ncc), 0.0, atol=1e-4)
        assert np.all(np.asarray(mask))

    def test_affine_invariance(self):
        # NCC is invariant to affine intensity changes
        rng = np.random.default_rng(4)
        p = jnp.asarray(rng.uniform(0, 1, (10, 49)).astype(np.float32))
        q = 2.5 * p + 0.3
        ncc, _ = L.lncc(p, q)
        np.testing.assert_allclose(np.asarray(ncc), 0.0, atol=1e-3)

    def test_uncorrelated(self):
        rng = np.random.default_rng(5)
        p = jnp.asarray(rng.uniform(0, 1, (200, 49)).astype(np.float32))
        q = jnp.asarray(rng.uniform(0, 1, (200, 49)).astype(np.float32))
        ncc, _ = L.lncc(p, q)
        assert float(jnp.mean(ncc)) > 0.5


class TestGrouping:
    def test_semantic_same_group_zero_when_equal_features(self):
        key = jax.random.PRNGKey(0)
        seg = jnp.zeros(100, jnp.int32)
        feat = jnp.ones((100, 3))
        loss = L.loss_semantic_group(key, seg, feat, num=100)
        assert float(loss) == pytest.approx(0.0, abs=1e-4)

    def test_semantic_penalizes_spread(self):
        key = jax.random.PRNGKey(0)
        seg = jnp.zeros(64, jnp.int32)
        rng = np.random.default_rng(6)
        feat = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
        loss = L.loss_semantic_group(key, seg, feat, num=64)
        assert float(loss) > 0.1

    def test_instance_negatives_pushed(self):
        key = jax.random.PRNGKey(1)
        seg = jnp.array([0] * 32 + [1] * 32)
        inst_same = jnp.ones((64, 3)) * 0.5          # all identical -> bad for negatives
        lang = jnp.ones((64, 3))
        loss_bad = L.loss_instance_group(key, seg, inst_same, lang, num=64)
        inst_sep = jnp.concatenate([jnp.zeros((32, 3)), jnp.ones((32, 3)) * 10], 0)
        loss_good = L.loss_instance_group(key, seg, inst_sep, lang, num=64)
        assert float(loss_bad) > float(loss_good)

    def test_cls3d_uniform_is_zero(self):
        key = jax.random.PRNGKey(2)
        rng = np.random.default_rng(7)
        feats = jnp.asarray(rng.normal(size=(500, 3)).astype(np.float32))
        preds = jnp.full((500, 4), 0.25)
        loss = L.loss_cls_3d(key, feats, preds, sample_size=100)
        assert float(loss) == pytest.approx(0.0, abs=1e-5)

    def test_ranking(self):
        e = jnp.array([1.0, 5.0, 3.0, 2.0])
        assert float(L.ranking_loss(e, 0.5)) == pytest.approx(4.0)  # mean(5,3)
        assert float(L.ranking_loss(e, 1.0)) == pytest.approx(2.75)


class TestImageGradWeight:
    def test_border_and_range(self):
        rng = np.random.default_rng(8)
        img = jnp.asarray(rng.uniform(0, 1, (3, 12, 14)).astype(np.float32))
        w = L.image_grad_weight(img)
        assert w.shape == (12, 14)
        assert np.all(np.asarray(w[0]) == 1.0)
        assert np.all(np.asarray(w) >= 0) and np.all(np.asarray(w) <= 1)


class TestKNN:
    def test_regular_grid(self):
        # Regular 1D line with spacing h: 3 NN at distances h, h, 2h ->
        # mean sq = (h^2+h^2+4h^2)/3 = 2h^2 for interior points
        h = 0.5
        pts = np.zeros((50, 3), np.float32)
        pts[:, 0] = np.arange(50) * h
        d = np.asarray(mean_dist3_sq(jnp.asarray(pts), window=8))
        np.testing.assert_allclose(d[2:-2], 2 * h * h, rtol=1e-5)

    def test_random_vs_exact(self):
        rng = np.random.default_rng(9)
        pts = rng.uniform(0, 1, (300, 3)).astype(np.float32)
        approx = np.asarray(mean_dist3_sq(jnp.asarray(pts), window=32))
        # exact brute force
        d2 = np.sum((pts[:, None] - pts[None, :]) ** 2, -1)
        np.fill_diagonal(d2, np.inf)
        exact = np.mean(np.sort(d2, axis=1)[:, :3], axis=1)
        # morton window approximation: demand close match for most points
        rel = np.abs(approx - exact) / np.maximum(exact, 1e-9)
        assert np.median(rel) < 0.05
        assert np.mean(rel < 0.5) > 0.9

    def test_morton_locality(self):
        pts = np.array([[0, 0, 0], [1, 1, 1], [0.01, 0, 0]], np.float32)
        codes = np.asarray(morton_codes(jnp.asarray(pts)))
        assert abs(int(codes[0]) - int(codes[2])) < abs(int(codes[0]) - int(codes[1]))


class TestDepthNormal:
    def test_flat_plane_normal(self):
        # A fronto-parallel plane at depth z has normal (0,0,-1) or (0,0,1)
        H, W = 16, 20
        K = jnp.array([[100.0, 0, 10], [0, 100.0, 8], [0, 0, 1]])
        depth = jnp.full((H, W), 2.0)
        n = np.asarray(normal_from_depth(depth, K))
        inner = n[2:-2, 2:-2]
        assert np.all(np.abs(np.abs(inner[..., 2]) - 1.0) < 1e-4)

    def test_unproject_center(self):
        K = jnp.array([[100.0, 0, 10], [0, 100.0, 8], [0, 0, 1]])
        depth = jnp.full((16, 20), 3.0)
        pts = np.asarray(depth_to_points_cam(depth, K))
        # principal point pixel maps to (0, 0, z)
        np.testing.assert_allclose(pts[8, 10], [0, 0, 3.0], atol=1e-5)

    def test_slanted_plane(self):
        # depth = a*x + c plane: normal should have consistent x component
        H, W = 20, 20
        K = jnp.array([[50.0, 0, 10], [0, 50.0, 10], [0, 0, 1]])
        xs = jnp.arange(W, dtype=jnp.float32)
        depth = 2.0 + 0.01 * xs[None, :].repeat(H, 0)
        n = np.asarray(normal_from_depth(depth, K))
        inner = n[5:-5, 5:-5]
        assert np.std(inner[..., 0]) < 0.05  # consistent orientation


class TestMultiViewDenseNCC:
    """The TPU-first dense windowed NCC (train/multiview.py ncc_dense=True)
    must EXACTLY match the reference's gathered-patch formulation whenever
    the rendered normal/distance field is patch-constant (the homography is
    then identical for every sample of a patch)."""

    def _setup(self, seed=0, H=40, W=56):
        from langscenex_tpu.train.multiview import multi_view_loss
        rng = np.random.default_rng(seed)
        key = jax.random.PRNGKey(seed)
        fx = fy = 60.0
        K = jnp.array([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1.0]])
        # constant fronto-parallel plane at depth 3 (camera frame)
        plane_depth = jnp.full((H, W), 3.0)
        normal = jnp.zeros((3, H, W)).at[2].set(-1.0)
        distance = jnp.full((H, W), 3.0)
        # near camera: small translation
        view_w2c = jnp.eye(4)
        near_w2c = jnp.eye(4).at[0, 3].set(0.15)
        near_depth = jnp.full((H, W), 3.0)
        gt = jnp.asarray(rng.uniform(0, 1, (1, H, W)).astype(np.float32))
        near_gt = jnp.asarray(rng.uniform(0, 1, (1, H, W)).astype(np.float32))
        args = (key, plane_depth, normal, distance, near_depth, gt, near_gt,
                view_w2c, near_w2c, K)
        kw = dict(patch_size=2, sample_num=512)
        return multi_view_loss, args, kw

    def test_dense_equals_patch_on_constant_plane(self):
        mv, args, kw = self._setup()
        out_p = mv(*args, ncc_dense=False, **kw)
        out_d = mv(*args, ncc_dense=True, **kw)
        np.testing.assert_allclose(float(out_d.geo_loss),
                                   float(out_p.geo_loss), rtol=1e-6)
        np.testing.assert_allclose(float(out_d.ncc_loss),
                                   float(out_p.ncc_loss), rtol=2e-4)

    def test_dense_grads_match_patch_on_constant_plane(self):
        """The two forms place per-pixel gradients differently by
        construction (patch: all 49 samples bill the center pixel; dense:
        each sample bills its own pixel), so pointwise fields are not
        comparable — but the TOTAL derivative through a parameter shared
        by every pixel (a global distance/normal perturbation) must
        agree on a constant plane, where the losses are equal."""
        mv, args, kw = self._setup(seed=3)
        key, plane_depth, normal, distance = args[0], args[1], args[2], args[3]
        rest = args[4:]

        def loss(eps, dense):
            o = mv(key, plane_depth, normal, distance + eps, *rest,
                   ncc_dense=dense, **kw)
            return o.ncc_loss

        gp = float(jax.grad(loss)(jnp.zeros(()), False))
        gd = float(jax.grad(loss)(jnp.zeros(()), True))
        assert gp != 0.0
        np.testing.assert_allclose(gd, gp, rtol=5e-2)

        def loss_n(eps, dense):
            o = mv(key, plane_depth, normal + eps * 0.1, distance, *rest,
                   ncc_dense=dense, **kw)
            return o.ncc_loss

        gp = float(jax.grad(loss_n)(jnp.zeros(()), False))
        gd = float(jax.grad(loss_n)(jnp.zeros(()), True))
        np.testing.assert_allclose(gd, gp, rtol=5e-2)
