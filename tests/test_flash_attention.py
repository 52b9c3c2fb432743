import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from langscenex_tpu.ops.flash_attention import flash_attention, attention_auto


def reference_attention(q, k, v):
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum('bhqd,bhkd->bhqk', q, k) * scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum('bhqk,bhkd->bhqd', p, v)


class TestFlashAttention:
    @pytest.mark.parametrize("T,Tk", [(256, 256), (384, 640), (130, 70)])
    def test_matches_reference(self, T, Tk):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(1, 2, T, 64)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, 2, Tk, 64)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(1, 2, Tk, 64)).astype(np.float32))
        ref = reference_attention(q, k, v)
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention(q, k, v, block_q=128, block_k=128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    @pytest.mark.parametrize("T,Tk", [(256, 256), (300, 300), (130, 200)])
    def test_nt_matches_reference(self, T, Tk):
        """Transposed-accumulator no-max kernel (flash_attention_nt),
        incl. non-block-multiple T/Tk (v^T ones-row masking of kv pad)."""
        from langscenex_tpu.ops.flash_attention import flash_attention_nt
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.normal(size=(1, 2, T, 64)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, 2, Tk, 64)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(1, 2, Tk, 64)).astype(np.float32))
        ref = reference_attention(q, k, v)
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention_nt(q, k, v, block_q=128, block_k=128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_nt_bounded_forward_grads_match(self):
        """With NT_BOUNDED_FORWARD on, the bounded_logits custom_vjp
        routes its forward through the transposed kernel; the shared
        Pallas backward must produce identical gradients."""
        import langscenex_tpu.ops.flash_attention as fa
        rng = np.random.default_rng(4)
        q = jnp.asarray(rng.normal(size=(1, 2, 300, 64)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, 2, 300, 64)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(1, 2, 300, 64)).astype(np.float32))

        def loss(q, k, v):
            return jnp.sum(fa.flash_attention(
                q, k, v, block_q=128, block_k=128,
                bounded_logits=True) ** 2)

        grad = jax.grad(loss, argnums=(0, 1, 2))
        try:
            with pltpu.force_tpu_interpret_mode():
                g_std = grad(q, k, v)
            fa.NT_BOUNDED_FORWARD = True
            with pltpu.force_tpu_interpret_mode():
                g_nt = grad(q, k, v)
        finally:
            fa.NT_BOUNDED_FORWARD = False
        for a, b in zip(g_std, g_nt):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)

    def test_extreme_logits_stable(self):
        """Online softmax must survive large score magnitudes."""
        rng = np.random.default_rng(1)
        q = jnp.asarray(20 * rng.normal(size=(1, 1, 128, 64)).astype(np.float32))
        k = jnp.asarray(20 * rng.normal(size=(1, 1, 128, 64)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(1, 1, 128, 64)).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention(q, k, v, block_q=64, block_k=64)
        assert np.all(np.isfinite(np.asarray(out)))
        ref = reference_attention(q, k, v)
        # log2-domain softmax rounds max-subtraction slightly differently
        # than exp at |logits|~2000; 5e-4 abs is rounding, not drift
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-4, rtol=1e-3)

    def test_attention_auto_cpu_path(self):
        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.normal(size=(1, 2, 64, 32)).astype(np.float32))
        out = attention_auto(q, q, q, dtype=jnp.float32)
        ref = reference_attention(q, q, q)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)


class TestFlashAttentionH2:
    """Head-pair-packed kernel (full-MXU-shape matmuls at D=64)."""

    @pytest.mark.parametrize("T,Tk", [(256, 256), (384, 640), (130, 70)])
    def test_matches_reference(self, T, Tk):
        from langscenex_tpu.ops.flash_attention import flash_attention_h2
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(1, 4, T, 64)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, 4, Tk, 64)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(1, 4, Tk, 64)).astype(np.float32))
        ref = reference_attention(q, k, v)
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention_h2(q, k, v, block_q=128, block_k=128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_extreme_logits_stable(self):
        from langscenex_tpu.ops.flash_attention import flash_attention_h2
        rng = np.random.default_rng(1)
        q = jnp.asarray(20 * rng.normal(size=(1, 2, 128, 64)).astype(np.float32))
        k = jnp.asarray(20 * rng.normal(size=(1, 2, 128, 64)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(1, 2, 128, 64)).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention_h2(q, k, v, block_q=64, block_k=64)
        assert np.all(np.isfinite(np.asarray(out)))
        ref = reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-3)


class TestFlashAttentionNoMax:
    """bounded_logits=True: no-running-max softmax (exact when logits are
    far from exp2's f32 range — the qk-LayerNormed DiT regime)."""

    @pytest.mark.parametrize("T,Tk", [(256, 256), (384, 640), (130, 70)])
    def test_matches_reference(self, T, Tk):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(1, 2, T, 64)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, 2, Tk, 64)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(1, 2, Tk, 64)).astype(np.float32))
        ref = reference_attention(q, k, v)
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention(q, k, v, block_q=128, block_k=128,
                                  bounded_logits=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_qk_normed_regime(self):
        """LayerNormed q/k rows (the DiT's norm_q/norm_k): logits stay
        |s| <= ~sqrt(D), squarely inside the no-max kernel's domain."""
        rng = np.random.default_rng(3)
        q = rng.normal(size=(1, 2, 192, 64)).astype(np.float32)
        k = rng.normal(size=(1, 2, 192, 64)).astype(np.float32)
        q = (q - q.mean(-1, keepdims=True)) / q.std(-1, keepdims=True)
        k = (k - k.mean(-1, keepdims=True)) / k.std(-1, keepdims=True)
        v = jnp.asarray(rng.normal(size=(1, 2, 192, 64)).astype(np.float32))
        q, k = jnp.asarray(q), jnp.asarray(k)
        ref = reference_attention(q, k, v)
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention(q, k, v, block_q=64, block_k=64,
                                  bounded_logits=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


class TestFlashAttentionBackward:
    """custom_vjp Pallas backward kernels (dq / dk+dv) vs dense-attention
    autodiff — the DiT fine-tune path backprops through flash attention
    at the full 17.8k sequence on TPU."""

    @pytest.mark.parametrize("T,Tk,bounded", [
        (128, 128, False), (128, 128, True),
        (192, 320, False), (130, 70, True)])
    def test_grads_match_reference(self, T, Tk, bounded):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(1, 2, T, 64)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, 2, Tk, 64)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(1, 2, Tk, 64)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(1, 2, T, 64)).astype(np.float32))

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(
                q, k, v, block_q=64, block_k=64,
                bounded_logits=bounded) * w)

        def loss_ref(q, k, v):
            return jnp.sum(reference_attention(q, k, v) * w)

        with pltpu.force_tpu_interpret_mode():
            gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4,
                err_msg=f"d{name} mismatch (bounded={bounded})")
