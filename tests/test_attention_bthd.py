"""Native-layout [B,T,H,D] bounded flash forward vs attention_auto."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from langscenex_tpu.ops.flash_attention import (_flash_fwd_impl_bthd,
                                                attention_auto,
                                                attention_bthd)


def _mk(B=1, T=300, H=4, D=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, H, D)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    return q, k, v


def test_kernel_matches_dense():
    q, k, v = _mk()
    with pltpu.force_tpu_interpret_mode():
        out, l2 = _flash_fwd_impl_bthd(q, k, v, 1.0 / 8.0, 128, 128)
    tr = lambda x: x.transpose(0, 2, 1, 3)
    ref = attention_auto(tr(q), tr(k), tr(v), scale=1.0 / 8.0,
                         dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(tr(ref)), atol=2e-5, rtol=2e-5)


def test_nondivisible_tail():
    """T=300 with 128-blocks: 2 tail blocks exercise the clamp/mask."""
    q, k, v = _mk(T=300, seed=1)
    with pltpu.force_tpu_interpret_mode():
        out, _ = _flash_fwd_impl_bthd(q, k, v, 0.125, 256, 128)
    tr = lambda x: x.transpose(0, 2, 1, 3)
    ref = tr(attention_auto(tr(q), tr(k), tr(v), scale=0.125,
                            dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_dispatch_fallback_matches():
    """CPU dispatch (fallback path) equals the transposed reference."""
    q, k, v = _mk(T=64, seed=2)
    out = attention_bthd(q, k, v, dtype=jnp.float32)
    tr = lambda x: x.transpose(0, 2, 1, 3)
    ref = tr(attention_auto(tr(q), tr(k), tr(v), dtype=jnp.float32,
                            bounded_logits=True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_bthd_grad_matches_dense():
    """custom_vjp backward (restaged) vs autodiff of dense attention."""
    from langscenex_tpu.ops.flash_attention import _flash_bthd
    q, k, v = _mk(T=256, H=2, seed=3)

    def loss_bthd(q, k, v):
        return jnp.sum(jnp.square(
            _flash_bthd(q, k, v, 0.125, 128, 128)))

    def loss_ref(q, k, v):
        tr = lambda x: x.transpose(0, 2, 1, 3)
        logits = jnp.einsum('bhqd,bhkd->bhqk', tr(q), tr(k)) * 0.125
        p = jax.nn.softmax(logits, -1)
        return jnp.sum(jnp.square(jnp.einsum('bhqk,bhkd->bhqd', p, tr(v))))

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_bthd, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)
