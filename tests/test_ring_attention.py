"""Ring attention vs dense reference on the 8-device virtual mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from langscenex_tpu.ops.flash_attention import attention_auto
from langscenex_tpu.ops.ring_attention import ring_attention_sharded
from langscenex_tpu.parallel.mesh import make_mesh


def _qkv(B=1, H=2, T=64, D=16, key=0):
    rng = np.random.default_rng(key)
    mk = lambda: jnp.asarray(rng.normal(size=(B, H, T, D))
                             .astype(np.float32))
    return mk(), mk(), mk()


class TestRingAttention:
    def test_matches_dense(self):
        q, k, v = _qkv()
        mesh = make_mesh(n_data=8, n_model=1)
        out = ring_attention_sharded(q, k, v, mesh)
        ref = attention_auto(q, k, v, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_gradients_match_dense(self):
        q, k, v = _qkv(T=32)
        mesh = make_mesh(n_data=4, n_model=2)

        def loss_ring(q, k, v):
            return jnp.sum(jnp.square(ring_attention_sharded(q, k, v, mesh)))

        def loss_dense(q, k, v):
            return jnp.sum(jnp.square(attention_auto(q, k, v,
                                                     dtype=jnp.float32)))

        gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gr, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=2e-4)

    def test_uneven_values_across_shards(self):
        # softmax max lives in one shard only: exercises the online merge
        q, k, v = _qkv(T=64, key=3)
        k = k.at[:, :, 37].set(50.0)   # spike inside shard 4
        mesh = make_mesh(n_data=8, n_model=1)
        out = ring_attention_sharded(q, k, v, mesh)
        ref = attention_auto(q, k, v, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


class TestSequenceParallelDispatch:
    def test_padded_uneven_T(self):
        # T=50 over 8 shards: pad to 56, mask the 6 pad keys
        q, k, v = _qkv(T=50, key=5)
        mesh = make_mesh(n_data=8, n_model=1)
        out = ring_attention_sharded(q, k, v, mesh)
        ref = attention_auto(q, k, v, dtype=jnp.float32)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_dit_forward_under_sequence_parallel(self):
        from langscenex_tpu.models.cogvideox.transformer import (
            CogVideoXTransformer, TransformerConfig)
        from langscenex_tpu.ops.flash_attention import sequence_parallel
        cfg = TransformerConfig(num_layers=2, num_heads=4, head_dim=16,
                                in_channels=8, out_channels=4, patch_size=2,
                                text_embed_dim=16, time_embed_dim=32,
                                attn_dtype=jnp.float32)
        model = CogVideoXTransformer(cfg)
        rng = np.random.default_rng(0)
        lat = jnp.asarray(rng.normal(size=(1, 3, 8, 8, 12))
                          .astype(np.float32))
        txt = jnp.asarray(rng.normal(size=(1, 5, 16)).astype(np.float32))
        t = jnp.array([100], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), lat, txt, t)
        ref = model.apply(params, lat, txt, t)
        mesh = make_mesh(n_data=8, n_model=1)
        with sequence_parallel(mesh):
            out = jax.jit(model.apply)(params, lat, txt, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)
