import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langscenex_tpu.models.cogvideox.vae import (AutoencoderKL3D, VAEConfig,
                                                 CausalConv3d,
                                                 spatial_tile_decode)

TINY = VAEConfig(block_out_channels=(8, 16, 16, 32), layers_per_block=1,
                 latent_channels=4, norm_groups=4)


class TestCausalConv:
    def test_causality(self):
        """Output at frame t must not depend on frames > t."""
        conv = CausalConv3d(4, kernel=(3, 3, 3))
        x = jnp.zeros((1, 5, 8, 8, 2))
        params = conv.init(jax.random.PRNGKey(0), x)
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.normal(size=(1, 5, 8, 8, 2)).astype(np.float32))
        b = a.at[:, 3:].set(rng.normal(size=(1, 2, 8, 8, 2)).astype(np.float32))
        ya = conv.apply(params, a)
        yb = conv.apply(params, b)
        # frames 0..2 identical (only future frames differ)
        np.testing.assert_allclose(np.asarray(ya[:, :3]),
                                   np.asarray(yb[:, :3]), atol=1e-6)
        assert not np.allclose(np.asarray(ya[:, 3:]), np.asarray(yb[:, 3:]))


class TestVAE:
    def test_shapes_and_compression(self):
        model = AutoencoderKL3D(TINY)
        video = jnp.zeros((1, 5, 3, 32, 48))   # T=5 -> T'=(5-1)/4+1=2
        params = model.init(jax.random.PRNGKey(0), video)
        mean, logvar = model.apply(params, video, method=AutoencoderKL3D.encode)
        assert mean.shape == (1, 2, 4, 4, 6)
        dec = model.apply(params, mean, method=AutoencoderKL3D.decode)
        # temporal upsampling: 2 latent frames -> 4+ frames (causal repeat)
        assert dec.shape[2:] == (3, 32, 48)
        assert dec.shape[1] >= 4
        assert np.all(np.isfinite(np.asarray(dec)))

    def test_single_frame(self):
        """Image encode (the pipeline encodes single keyframes)."""
        model = AutoencoderKL3D(TINY)
        img = jnp.zeros((1, 1, 3, 16, 16))
        params = model.init(jax.random.PRNGKey(0), img)
        mean, _ = model.apply(params, img, method=AutoencoderKL3D.encode)
        assert mean.shape == (1, 1, 4, 2, 2)

    def test_tiled_decode_matches_full(self):
        model = AutoencoderKL3D(TINY)
        video = jnp.zeros((1, 1, 3, 64, 64))
        params = model.init(jax.random.PRNGKey(0), video)
        rng = np.random.default_rng(1)
        z = jnp.asarray(rng.normal(size=(1, 1, 4, 8, 8)).astype(np.float32))
        full = model.apply(params, z, method=AutoencoderKL3D.decode)
        tiled = spatial_tile_decode(
            lambda zz: model.apply(params, zz, method=AutoencoderKL3D.decode),
            z, tile=6, overlap=2)
        # GroupNorm statistics are global over (T,H,W), so tiling is an
        # approximation (same as the reference's enable_tiling); with
        # random weights we check structure: same shape, finite, and
        # strongly correlated with the full decode.
        f = np.asarray(full)
        t = np.asarray(tiled)
        assert t.shape == f.shape
        assert np.all(np.isfinite(t))
        corr = np.corrcoef(f.ravel(), t.ravel())[0, 1]
        assert corr > 0.5, f"tiled decode decorrelated: {corr}"


class TestVAEConversion:
    """convert_cogvideox_vae cross-validated numerically against a torch
    mirror with the diffusers AutoencoderKLCogVideoX state_dict layout."""

    MIRROR = {"in_ch": 3, "out_ch": 3, "latent": 4,
              "block_out": (8, 16, 16, 32), "layers": 1, "groups": 4,
              "t_levels": 2}

    def _pair(self, seed=0):
        torch = pytest.importorskip("torch")
        from torch_cvx_vae_mirror import VAEMirror
        from langscenex_tpu.utils.convert import convert_cogvideox_vae
        torch.manual_seed(seed)
        mirror = VAEMirror(self.MIRROR).eval()
        sd = {k: v.numpy() for k, v in mirror.state_dict().items()}
        variables = jax.tree_util.tree_map(jnp.asarray,
                                           convert_cogvideox_vae(sd))
        return mirror, variables

    def test_tree_matches_init(self):
        pytest.importorskip("torch")
        _, converted = self._pair()
        model = AutoencoderKL3D(TINY)
        init = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 5, 3, 32, 32)))
        flat_c = {jax.tree_util.keystr(p): np.shape(v) for p, v in
                  jax.tree_util.tree_leaves_with_path(converted)}
        flat_i = {jax.tree_util.keystr(p): np.shape(v) for p, v in
                  jax.tree_util.tree_leaves_with_path(init)}
        assert flat_c == flat_i, (
            f"missing={sorted(set(flat_i) - set(flat_c))[:6]} "
            f"extra={sorted(set(flat_c) - set(flat_i))[:6]}")

    def test_encode_decode_match_torch(self):
        torch = pytest.importorskip("torch")
        mirror, variables = self._pair(seed=1)
        model = AutoencoderKL3D(TINY)
        rng = np.random.default_rng(2)
        video = rng.uniform(-1, 1, (1, 5, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            t_mean, t_logvar = mirror.encode(torch.tensor(video))
            t_dec = mirror.decode(t_mean)
        f_mean, f_logvar = model.apply(variables, jnp.asarray(video),
                                       method=AutoencoderKL3D.encode)
        np.testing.assert_allclose(np.asarray(f_mean), t_mean.numpy(),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(f_logvar), t_logvar.numpy(),
                                   atol=2e-4, rtol=1e-3)
        f_dec = model.apply(variables, f_mean,
                            method=AutoencoderKL3D.decode)
        assert f_dec.shape == tuple(t_dec.shape)
        np.testing.assert_allclose(np.asarray(f_dec), t_dec.numpy(),
                                   atol=5e-4, rtol=1e-3)
