import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langscenex_tpu.utils.sfm import (resize_to_512, compute_co_vis_masks,
                                      project_points)
from langscenex_tpu.utils import stepfun
from langscenex_tpu.utils.stepfun import (sample, sample_intervals, resample,
                                          weights_to_cdf)
from langscenex_tpu.models.openseg import mask_pool_features
from langscenex_tpu.models.t5 import TextEncoder


class TestSfm:
    def test_resize(self):
        w, h = resize_to_512(1920, 1080)
        assert w == 512 and h % 16 == 0

    def test_covis_two_identical_views(self):
        K = np.array([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]])
        depth = np.full((24, 32), 2.0)
        masks = compute_co_vis_masks([depth, depth], [K, K],
                                     [np.eye(4), np.eye(4)])
        # identical views corroborate everything
        assert masks[0].mean() > 0.95

    def test_covis_disjoint_views(self):
        K = np.array([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]])
        depth = np.full((24, 32), 2.0)
        w2c_b = np.eye(4)
        w2c_b[:3, 3] = [100.0, 0, 0]   # far away
        masks = compute_co_vis_masks([depth, depth], [K, K],
                                     [np.eye(4), w2c_b])
        assert masks[0].mean() < 0.05


class TestStepfun:
    def test_cdf_normalized(self):
        w = jnp.array([1.0, 2.0, 1.0])
        cdf = weights_to_cdf(w)
        assert float(cdf[0]) == 0.0
        assert float(cdf[-1]) == pytest.approx(1.0)

    def test_sampling_concentrates(self):
        t = jnp.array([0.0, 1.0, 2.0, 3.0])
        logits = jnp.array([-100.0, 0.0, -100.0])   # all mass in bin 2
        s = sample(jax.random.PRNGKey(0), t, logits, 64)
        assert float(jnp.mean((s >= 1.0) & (s <= 2.0))) > 0.9

    def test_sample_matches_np_interp(self):
        # the reference's working path is invert_cdf_np (np.interp over
        # the integrated softmax weights); ours must agree bit-close.
        rng = np.random.default_rng(3)
        t = np.sort(rng.uniform(0, 10, 9)).astype(np.float32)
        logits = rng.normal(0, 2, 8).astype(np.float32)
        s = np.asarray(sample(None, jnp.asarray(t), jnp.asarray(logits), 33))
        w = np.exp(logits) / np.exp(logits).sum()
        cw = np.concatenate([[0.0], np.minimum(1, np.cumsum(w[:-1])), [1.0]])
        eps = np.finfo(np.float32).eps
        u = np.linspace(0, 1.0 - eps, 33)
        np.testing.assert_allclose(s, np.interp(u, cw, t), rtol=1e-5,
                                   atol=1e-5)

    def test_sample_intervals_fenceposts(self):
        t = jnp.array([0.0, 1.0, 2.0, 3.0])
        logits = jnp.zeros(3)
        iv = sample_intervals(jax.random.PRNGKey(1), t, logits, 8,
                              domain=(0.0, 3.0))
        iv = np.asarray(iv)
        assert iv.shape == (9,)
        assert np.all(np.diff(iv) > 0) and iv[0] >= 0.0 and iv[-1] <= 3.0

    def test_resample_conserves_mass(self):
        t_old = jnp.array([0.0, 1.0, 2.0, 3.0])
        w_old = jnp.array([0.5, 1.0, 0.25])
        t_new = jnp.linspace(0.0, 3.0, 7)
        w_new = resample(t_new, t_old, w_old)
        assert float(jnp.sum(w_new)) == pytest.approx(1.75, abs=1e-5)

    def test_resample_avg_constant(self):
        # width-averaged resampling of a constant-VALUE step fn is that
        # constant on any interior rebinning
        tp = jnp.array([0.0, 0.5, 2.0, 3.0])
        vp = jnp.array([2.0, 2.0, 2.0])
        t = jnp.array([0.25, 1.0, 2.75])
        v = resample(t, tp, vp, use_avg=True)
        np.testing.assert_allclose(np.asarray(v), [2.0, 2.0], rtol=1e-4)

    def test_query_and_outside(self):
        t = jnp.array([0.0, 1.0, 2.0])
        y = jnp.array([5.0, 7.0])
        tq = jnp.array([-1.0, 0.5, 1.5, 4.0])
        out = np.asarray(stepfun.query(tq, t, y, outside_value=-9.0))
        np.testing.assert_allclose(out, [-9.0, 5.0, 7.0, -9.0])

    def test_lossfun_outer_zero_when_enveloped(self):
        t = jnp.array([0.0, 1.0, 2.0])
        w = jnp.array([0.3, 0.7])
        loss = stepfun.lossfun_outer(t, w, t, w * 1.5)
        assert float(jnp.sum(loss)) == pytest.approx(0.0, abs=1e-6)
        # shrinking the envelope creates loss
        loss2 = stepfun.lossfun_outer(t, w, t, w * 0.25)
        assert float(jnp.sum(loss2)) > 0.0

    def test_distortion_monte_carlo(self):
        rng = np.random.default_rng(0)
        t = np.sort(rng.uniform(0, 4, 5)).astype(np.float32)
        w = rng.uniform(0, 1, 4).astype(np.float32)
        w = w / w.sum()
        got = float(stepfun.lossfun_distortion(jnp.asarray(t),
                                               jnp.asarray(w)))
        # Monte-Carlo double integral (sample x, y from the step pdf)
        n = 200_000
        bins = rng.choice(4, size=(2, n), p=w)
        x = rng.uniform(t[bins[0]], t[bins[0] + 1])
        y = rng.uniform(t[bins[1]], t[bins[1] + 1])
        assert got == pytest.approx(float(np.abs(x - y).mean()), rel=0.02)

    def test_interval_distortion_monte_carlo(self):
        rng = np.random.default_rng(1)
        got = float(stepfun.interval_distortion(0.0, 1.0, 0.5, 2.5))
        x = rng.uniform(0.0, 1.0, 400_000)
        y = rng.uniform(0.5, 2.5, 400_000)
        assert got == pytest.approx(float(np.abs(x - y).mean()), rel=0.02)

    def test_weighted_percentile_median(self):
        t = jnp.array([0.0, 1.0, 2.0])
        w = jnp.array([0.5, 0.5])
        med = stepfun.weighted_percentile(t, w, [50.0])
        assert float(med[0]) == pytest.approx(1.0, abs=1e-5)

    def test_max_dilate_widens_support(self):
        t = jnp.array([0.0, 1.0, 2.0, 3.0])
        w = jnp.array([0.0, 1.0, 0.0])
        t_d, w_d = stepfun.max_dilate_weights(t, w, 0.5, domain=(0.0, 3.0),
                                              renormalize=True)
        lo = np.asarray(t_d)[:-1][np.asarray(w_d) > 1e-6]
        hi = np.asarray(t_d)[1:][np.asarray(w_d) > 1e-6]
        # mass originally on [1,2] must now span [0.5, 2.5]
        assert lo.min() == pytest.approx(0.5, abs=1e-5)
        assert hi.max() == pytest.approx(2.5, abs=1e-5)
        assert float(jnp.sum(w_d)) == pytest.approx(1.0, abs=1e-5)

    def test_blur_stepfun_preserves_mass(self):
        x = jnp.array([0.0, 1.0, 2.0, 4.0])
        y = jnp.array([1.0, 3.0, 0.5])
        xr, yr = stepfun.blur_stepfun(x, y, 0.25)
        xr, yr = np.asarray(xr), np.asarray(yr)
        # integral of the piecewise-linear blur == integral of the input
        area = np.sum(0.5 * (yr[1:] + yr[:-1]) * np.diff(xr))
        want = float(jnp.sum(y * jnp.diff(x)))
        assert area == pytest.approx(want, rel=1e-4)

    def test_inner_outer_bounds(self):
        rng = np.random.default_rng(2)
        t1 = np.sort(rng.uniform(0, 5, 7)).astype(np.float32)
        y1 = rng.uniform(0, 1, 6).astype(np.float32)
        t0 = np.sort(rng.uniform(0, 5, 5)).astype(np.float32)
        inner, outer = stepfun.inner_outer(jnp.asarray(t0), jnp.asarray(t1),
                                           jnp.asarray(y1))
        # true mass per t0 bin via dense numeric integration
        xs = np.linspace(0, 5, 20001)
        dens = np.zeros_like(xs)
        for j in range(6):
            sel = (xs >= t1[j]) & (xs < t1[j + 1])
            dens[sel] = y1[j] / (t1[j + 1] - t1[j])
        for k in range(4):
            sel = (xs >= t0[k]) & (xs < t0[k + 1])
            true = np.trapz(dens[sel], xs[sel])
            assert float(inner[k]) <= true + 2e-2
            assert float(outer[k]) >= true - 2e-2


class TestOpenSegPooling:
    def test_mask_pool(self):
        feat = np.zeros((4, 4, 6), np.float32)
        feat[:, :, :3] = 1.0
        feat[:, :, 3:] = np.array([0, 2, 0, 0])[:, None, None]
        seg = np.full((4, 6), -1, np.int64)
        seg[:, :3] = -1      # background segment (id -1 still pooled)
        seg[:, 3:] = 2
        rows = mask_pool_features(feat, seg)
        assert rows.shape == (2, 4)
        np.testing.assert_allclose(np.linalg.norm(rows, axis=-1), 1.0,
                                   rtol=1e-5)


class TestT5Stub:
    def test_stub_embeddings(self):
        enc = TextEncoder(embed_dim=64)
        out = enc.encode(["a red chair", "a red chair", "something else"])
        assert out.shape == (3, 226, 64)
        np.testing.assert_allclose(out[0], out[1])
        assert np.abs(out[0] - out[2]).max() > 0


class TestConvertCLI:
    def test_autoencoder_roundtrip(self, tmp_path):
        """torch ckpt -> convert_cli -> orbax -> restore == direct map."""
        torch = pytest.importorskip("torch")
        from langscenex_tpu.convert_cli import main
        from langscenex_tpu.utils.convert import convert_autoencoder

        tm = torch.nn.ModuleDict()  # build the reference AE layout
        import sys
        sys.path.insert(0, str(tmp_path))
        # reference layout: encoder/decoder ModuleLists of Linear/BN
        dims_e = [768, 512, 256, 128, 64, 32, 16, 3]
        enc = []
        for i in range(len(dims_e) - 1):
            if i > 0:
                enc.append(torch.nn.BatchNorm1d(dims_e[i]))
                enc.append(torch.nn.ReLU())
            enc.append(torch.nn.Linear(dims_e[i], dims_e[i + 1]))
        dims_d = [3, 16, 32, 64, 128, 256, 512, 768]
        dec = []
        for i in range(len(dims_d) - 1):
            if i > 0:
                dec.append(torch.nn.ReLU())
            dec.append(torch.nn.Linear(dims_d[i], dims_d[i + 1]))
        model = torch.nn.ModuleDict(
            {"encoder": torch.nn.ModuleList(enc),
             "decoder": torch.nn.ModuleList(dec)})
        ckpt = tmp_path / "ae.pth"
        torch.save(model.state_dict(), ckpt)

        out = tmp_path / "orbax_ae"
        rc = main(["--family", "autoencoder", "--input", str(ckpt),
                   "--output", str(out)])
        assert rc == 0
        import orbax.checkpoint as ocp
        restored = ocp.StandardCheckpointer().restore(str(out))
        direct = convert_autoencoder(
            {k: v.numpy() for k, v in model.state_dict().items()})
        import jax
        for (pa, a), (pb, b) in zip(
                sorted(jax.tree_util.tree_leaves_with_path(restored),
                       key=str),
                sorted(jax.tree_util.tree_leaves_with_path(direct),
                       key=str)):
            np.testing.assert_allclose(a, b)


class TestTrainAll:
    """Multi-scene batch driver (train_all.sh parity)."""

    def test_scene_argv_matches_shell_layout(self):
        from langscenex_tpu.train_all import scene_argv
        argv = scene_argv("kitchen", "outputs", "fc/data", "fc/out", [])
        assert ("pipeline.rgb_video_path=outputs/kitchen/rgb/video_ckpt.mp4"
                in argv)
        assert "pipeline.data_path=fc/data/kitchen" in argv
        assert "gaussian.dataset.model_path=fc/out/kitchen" in argv
        assert "gaussian.opt.max_geo_iter=1500" in argv
        # user override beats the batch default
        argv2 = scene_argv("k", "v", "d", "o",
                           ["gaussian.opt.max_geo_iter=99"])
        assert "gaussian.opt.max_geo_iter=99" in argv2
        assert "gaussian.opt.max_geo_iter=1500" not in argv2

    def test_batch_loops_and_reports_failures(self, monkeypatch):
        import langscenex_tpu.train_all as ta
        calls = []

        def fake_entry(argv):
            calls.append(argv)
            if "pipeline.data_path=d/bad" in argv:
                raise RuntimeError("boom")
            return 0

        import langscenex_tpu.entry_point as ep
        monkeypatch.setattr(ep, "main", fake_entry)
        rc = ta.main(["--scenes", "a,bad,c", "--videos", "v",
                      "--data", "d", "--out", "o", "x.y=1"][:]
                     + [])
        assert rc == 1                    # one scene failed
        assert len(calls) == 3            # but the batch continued
        assert all("x.y=1" in c for c in calls)
