import numpy as np
import pytest

from langscenex_tpu.train.ae import AETrainer, scatter_seg_features


def synth_features(n_clusters=5, per=80, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, 768))
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    feats = np.repeat(centers, per, 0) + 0.05 * rng.normal(
        size=(n_clusters * per, 768))
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    return feats.astype(np.float32), np.repeat(np.arange(n_clusters), per)


class TestAE:
    def test_reconstruction_improves(self):
        feats, _ = synth_features()
        tr = AETrainer()
        # measure initial loss
        rec0 = tr.model.apply({'params': tr.params,
                               'batch_stats': tr.batch_stats},
                              feats[:64], train=False)
        err0 = float(np.mean((np.asarray(rec0) - feats[:64]) ** 2))
        tr.fit(feats, num_epochs=40, eval_from_epoch=30, batch_size=128)
        rec1 = tr.model.apply({'params': tr.params,
                               'batch_stats': tr.batch_stats},
                              feats[:64], train=False)
        err1 = float(np.mean((np.asarray(rec1) - feats[:64]) ** 2))
        assert err1 < err0 * 0.5, f"{err0} -> {err1}"

    def test_latent_is_unit_norm_3d(self):
        feats, _ = synth_features(n_clusters=2, per=20)
        tr = AETrainer()
        z = tr.encode(feats)
        assert z.shape == (feats.shape[0], 3)
        np.testing.assert_allclose(np.linalg.norm(z, axis=-1), 1.0, atol=1e-5)

    def test_clusters_separate_in_latent(self):
        feats, labels = synth_features(n_clusters=3, per=60, seed=2)
        tr = AETrainer()
        tr.fit(feats, num_epochs=60, eval_from_epoch=55, batch_size=128)
        z = tr.encode(feats)
        # within-cluster distance should be much smaller than between
        within, between = [], []
        for a in range(3):
            za = z[labels == a]
            within.append(np.mean(np.linalg.norm(za - za.mean(0), axis=-1)))
            for b in range(a + 1, 3):
                zb = z[labels == b]
                between.append(np.linalg.norm(za.mean(0) - zb.mean(0)))
        assert np.mean(within) < np.mean(between)


def test_scatter_seg_features():
    seg = np.array([[-1, 0], [2, 2]])
    # rows: id -1, id 0, id 2 (id 1 absent)
    rows = np.array([[1, 1, 1], [2, 2, 2], [3, 3, 3]], np.float32)
    out = scatter_seg_features(rows, seg)
    assert out.shape == (3, 2, 2)
    np.testing.assert_array_equal(out[:, 0, 0], [1, 1, 1])
    np.testing.assert_array_equal(out[:, 0, 1], [2, 2, 2])
    np.testing.assert_array_equal(out[:, 1, 0], [3, 3, 3])
    np.testing.assert_array_equal(out[:, 1, 1], [3, 3, 3])
