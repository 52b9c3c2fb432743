"""Fused LNZ kernel vs the flax LayerNorm formulation."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from langscenex_tpu.ops.ln_modulate import (_lnz_fwd_pallas, _lnz_ref,
                                            ln_modulate)


def _mk(B=2, T=700, H=256, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, H)) * 2, dtype)
    gamma = jnp.asarray(rng.normal(size=(H,)) * 0.5 + 1, dtype)
    beta = jnp.asarray(rng.normal(size=(H,)) * 0.1, dtype)
    mods = [jnp.asarray(rng.normal(size=(B, H)) * 0.3, dtype)
            for _ in range(4)]
    return (x, gamma, beta, *mods)


def test_pallas_matches_ref():
    args = _mk()
    with pltpu.force_tpu_interpret_mode():
        y = _lnz_fwd_pallas(*args, text_len=226, interpret=True)
    ref = _lnz_ref(*args, text_len=226)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ref_matches_flax_layernorm():
    """The reference math == nn.LayerNorm(eps=1e-5) + modulation."""
    import flax.linen as nn
    x, gamma, beta, sc, sh, tsc, tsh = _mk(seed=1)
    Tt = 226
    ln = nn.LayerNorm(epsilon=1e-5)
    n = ln.apply({"params": {"scale": gamma, "bias": beta}}, x)
    nt = n[:, :Tt] * (1 + tsc[:, None]) + tsh[:, None]
    nv = n[:, Tt:] * (1 + sc[:, None]) + sh[:, None]
    want = jnp.concatenate([nt, nv], axis=1)
    got = _lnz_ref(x, gamma, beta, sc, sh, tsc, tsh, Tt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_custom_vjp_matches_autodiff():
    args = _mk(B=1, T=300, H=128, seed=2)

    def loss_fused(*a):
        return jnp.sum(jnp.square(ln_modulate(*a, 226)))

    def loss_ref(*a):
        return jnp.sum(jnp.square(_lnz_ref(*a, 226)))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
