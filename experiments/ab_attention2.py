"""Attention VPU-cost probes: mask overhead + exp2 softmax variant."""
import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from langscenex_tpu.ops.flash_attention import flash_attention, NEG_INF

B, H, D = 1, 48, 64
PEAK = 197e12


def timed(name, fn, T, n=8):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.bfloat16)
    flops = 4.0 * B * H * T * T * D
    try:
        def body(qq, kk, vv):
            def step(carry, _):
                out = fn(qq + carry.astype(jnp.bfloat16) * 0, kk, vv)
                return jnp.sum(out[:, :, 0, :]).astype(jnp.float32), None
            return jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                None, length=n)[0]
        jfn = jax.jit(body)
        float(jfn(q, k, v))
        t0 = time.perf_counter()
        float(jfn(q, k, v))
        dt = (time.perf_counter() - t0) / n
        print(f"{name:40s} {dt*1e3:8.2f} ms   MFU {flops/dt/PEAK*100:5.1f}%",
              flush=True)
    except Exception as e:
        print(f"{name:40s} FAILED {type(e).__name__} {str(e)[:90]}",
              flush=True)


LOG2E = math.log2(math.e)


def _exp2_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                 *, kv_len, block_k, needs_mask):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if needs_mask:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)
    # s is pre-scaled by scale*log2(e): all softmax algebra in log2 domain
    m_prev = m_ref[...]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[...] = m_new

    @pl.when(kb == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
                    ).astype(o_ref.dtype)


def flash_exp2(q, k, v, block_q=1024, block_k=1024):
    Bq, Hq, T, Dd = q.shape
    Tk = k.shape[2]
    scale = LOG2E / math.sqrt(Dd)
    bq, bk = min(block_q, T), min(block_k, Tk)
    Tp = ((T + bq - 1) // bq) * bq
    Tkp = ((Tk + bk - 1) // bk) * bk
    q = q * jnp.asarray(scale, q.dtype)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Tp - T), (0, 0))).reshape(
        Bq * Hq, Tp, Dd)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Tkp - Tk), (0, 0))).reshape(
        Bq * Hq, Tkp, Dd)
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Tkp - Tk), (0, 0))).reshape(
        Bq * Hq, Tkp, Dd)
    out = pl.pallas_call(
        functools.partial(_exp2_kernel, kv_len=Tk, block_k=bk,
                          needs_mask=(Tkp != Tk)),
        grid=(Bq * Hq, Tp // bq, Tkp // bk),
        in_specs=[pl.BlockSpec((1, bq, Dd), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, bk, Dd), lambda b, i, j: (b, j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, bk, Dd), lambda b, i, j: (b, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, bq, Dd), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bq * Hq, Tp, Dd), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, 1), jnp.float32),
                        pltpu.VMEM((bq, 1), jnp.float32),
                        pltpu.VMEM((bq, Dd), jnp.float32)],
    )(qp, kp, vp)
    return out.reshape(Bq, Hq, Tp, Dd)[:, :, :T]


if __name__ == "__main__":
    timed("current T=17776 (masked)",
          lambda q, k, v: flash_attention(q, k, v), 17776)
    timed("current T=18432 (mask-free)",
          lambda q, k, v: flash_attention(q, k, v), 18432)
    timed("exp2 T=17776 (masked)",
          lambda q, k, v: flash_exp2(q, k, v), 17776)
    timed("exp2 T=18432 (mask-free)",
          lambda q, k, v: flash_exp2(q, k, v), 18432)
    timed("current bq2048 bk1024 T=17776",
          lambda q, k, v: flash_attention(q, k, v, block_q=2048), 17776)


def _exp2_bf16_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    # exp2 evaluated in bf16 (2 lanes/ALU); stats stay f32
    p = jnp.exp2((s - m_new).astype(jnp.bfloat16))
    alpha = jnp.exp2(m_prev - m_new)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(
        p.astype(jnp.float32), axis=1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p, v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[...] = m_new

    @pl.when(kb == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
                    ).astype(o_ref.dtype)


def flash_exp2_bf16(q, k, v, block_q=1024, block_k=1024):
    Bq, Hq, T, Dd = q.shape
    scale = LOG2E / math.sqrt(Dd)
    q = q * jnp.asarray(scale, q.dtype)
    qp = q.reshape(Bq * Hq, T, Dd)
    kp = k.reshape(Bq * Hq, T, Dd)
    vp = v.reshape(Bq * Hq, T, Dd)
    out = pl.pallas_call(
        _exp2_bf16_kernel,
        grid=(Bq * Hq, T // block_q, T // block_k),
        in_specs=[pl.BlockSpec((1, block_q, Dd), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, block_k, Dd), lambda b, i, j: (b, j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, block_k, Dd), lambda b, i, j: (b, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, block_q, Dd), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bq * Hq, T, Dd), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, 1), jnp.float32),
                        pltpu.VMEM((block_q, 1), jnp.float32),
                        pltpu.VMEM((block_q, Dd), jnp.float32)],
    )(qp, kp, vp)
    return out.reshape(Bq, Hq, T, Dd)


if __name__ == "__main__" and False:
    pass
