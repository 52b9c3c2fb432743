"""Fused LayerNorm + adaLN modulation (CogVideoXLayerNormZero) kernel.

The DiT's modulation path (2x LayerNormZero + gated residuals per
block) measured ~400 ms of the 6.02 s B=2 denoise step, ~3x the
minimal HBM traffic — XLA materializes an f32 copy of the [B, T, 3072]
stream for the stats and re-reads across the norm/modulate boundary,
and a hand-restructured jnp version measured IDENTICAL
(experiments/ab_mlp2.py: 75.4 vs 75.6 ms per 8-layer skeleton). This
kernel does the whole unit in one read + one write: per [bt, H] block
in VMEM — f32 stats (sum, sum-of-squares), normalize, gamma/beta, and
the per-stream (text prefix / video suffix) shift-scale composed as
y = n * A + C with A = gamma*(1+scale_eff), C = beta*(1+scale_eff) +
shift_eff selected per row.

Backward is plain XLA (jax.custom_vjp): the standard LayerNorm
backward plus the modulation chain — training steps already pay far
larger costs, only the inference forward needs the fused pass.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5


def _lnz_kernel(x_ref, gamma_ref, beta_ref, sc_ref, sh_ref, tsc_ref,
                tsh_ref, y_ref, *, text_len: int, bt: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)                   # [bt, H]
    H = x.shape[-1]
    s1 = jnp.sum(x, axis=-1, keepdims=True) / H
    s2 = jnp.sum(x * x, axis=-1, keepdims=True) / H
    inv = jax.lax.rsqrt(jnp.maximum(s2 - s1 * s1, 0.0) + EPS)
    n = (x - s1) * inv                                 # [bt, H]

    row = jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0) + t * bt
    # arithmetic blend, not where([bt,1] bool, [1,H], [1,H]): the i1
    # broadcast trips a Mosaic relayout bug ("non-singleton logical
    # dimension is replicated in destination but not in source")
    m = (row < text_len).astype(jnp.float32)           # [bt, 1]
    # per-batch mod vectors ride as FULL [B, H] refs (a (1, H) block of
    # a [B>1, H] array violates Mosaic's last-two-dims rule), and the
    # row is picked by a static-slice scalar blend (a dynamic sublane
    # load of a bf16 [B, H] ref fails Mosaic's tile-alignment prover)
    def pick(ref):
        rows = ref[...].astype(jnp.float32)            # [B, H]
        out = rows[0:1]
        for i in range(1, rows.shape[0]):
            w = (b == i).astype(jnp.float32)
            out = out * (1.0 - w) + rows[i:i + 1] * w
        return out                                     # [1, H]

    sc = m * pick(tsc_ref) + (1.0 - m) * pick(sc_ref)  # [bt, H]
    sh = m * pick(tsh_ref) + (1.0 - m) * pick(sh_ref)
    one_sc = 1.0 + sc
    A = gamma_ref[0].astype(jnp.float32) * one_sc
    C = beta_ref[0].astype(jnp.float32) * one_sc + sh
    y_ref[0] = (n * A + C).astype(y_ref.dtype)


def _lnz_fwd_pallas(x, gamma, beta, sc, sh, tsc, tsh, text_len: int,
                    interpret: bool = False):
    B, T, H = x.shape
    bt = 128   # f32 intermediates: bt=512 blew the 16 MB scoped vmem
    Tp = ((T + bt - 1) // bt) * bt
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    g2 = jnp.broadcast_to(gamma[None], (1, H))
    b2 = jnp.broadcast_to(beta[None], (1, H))
    vec = pl.BlockSpec((1, H), lambda b, t: (0, 0),
                       memory_space=pltpu.VMEM)
    bvec = pl.BlockSpec((B, H), lambda b, t: (0, 0),
                        memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        functools.partial(_lnz_kernel, text_len=text_len, bt=bt),
        grid=(B, Tp // bt),
        in_specs=[
            pl.BlockSpec((1, bt, H), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            vec, vec, bvec, bvec, bvec, bvec,
        ],
        out_specs=pl.BlockSpec((1, bt, H), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, H), x.dtype),
        interpret=interpret,
    )(x, g2, b2, sc, sh, tsc, tsh)
    return y[:, :T]


def _lnz_ref(x, gamma, beta, sc, sh, tsc, tsh, text_len):
    """Reference math (the LayerNormZero formulation, fast-variance)."""
    xf = x.astype(jnp.float32)
    s1 = jnp.mean(xf, -1, keepdims=True)
    s2 = jnp.mean(xf * xf, -1, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(s2 - s1 * s1, 0.0) + EPS)
    n = ((xf - s1) * inv) * gamma + beta
    nt = n[:, :text_len] * (1 + tsc[:, None]) + tsh[:, None]
    nv = n[:, text_len:] * (1 + sc[:, None]) + sh[:, None]
    return jnp.concatenate([nt, nv], axis=1).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def ln_modulate(x, gamma, beta, sc, sh, tsc, tsh, text_len: int):
    """Fused LNZ: LN(x)*gamma+beta then per-stream (1+scale)/shift.
    x [B,T,H]; gamma/beta [H]; sc/sh/tsc/tsh [B,H]. Pallas forward on
    TPU, reference math elsewhere."""
    if jax.default_backend() == "tpu":
        return _lnz_fwd_pallas(x, gamma, beta, sc, sh, tsc, tsh, text_len)
    return _lnz_ref(x, gamma, beta, sc, sh, tsc, tsh, text_len)


def _lnz_vjp_fwd(x, gamma, beta, sc, sh, tsc, tsh, text_len):
    y = ln_modulate(x, gamma, beta, sc, sh, tsc, tsh, text_len)
    return y, (x, gamma, beta, sc, sh, tsc, tsh)


def _lnz_vjp_bwd(text_len, res, g):
    # plain-XLA backward via jax.vjp of the reference math (training
    # steps remat the block anyway; only the fwd needs the fused pass)
    x, gamma, beta, sc, sh, tsc, tsh = res
    _, vjp = jax.vjp(
        lambda *a: _lnz_ref(*a, text_len), x, gamma, beta, sc, sh, tsc,
        tsh)
    return vjp(g)


ln_modulate.defvjp(_lnz_vjp_fwd, _lnz_vjp_bwd)
