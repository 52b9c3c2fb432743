import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langscenex_tpu.utils.sfm import (resize_to_512, compute_co_vis_masks,
                                      project_points)
from langscenex_tpu.utils.stepfun import (sample_intervals, resample,
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
        w = jnp.array([0.0, 100.0, 0.0])
        s = sample_intervals(jax.random.PRNGKey(0), t, w, 64)
        assert float(jnp.mean((s >= 1.0) & (s <= 2.0))) > 0.9

    def test_resample_conserves_mass(self):
        t_old = jnp.array([0.0, 1.0, 2.0, 3.0])
        w_old = jnp.array([0.5, 1.0, 0.25])
        t_new = jnp.linspace(0.0, 3.0, 7)
        w_new = resample(t_new, t_old, w_old)
        assert float(jnp.sum(w_new)) == pytest.approx(1.75, abs=1e-5)


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
