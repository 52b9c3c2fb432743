"""Flash attention (online-softmax, non-causal) as a Pallas TPU kernel.

The TriMap DiT attends over ~17.8k joint text+video tokens
(pipeline.py:284-291,480-497); materialized [T,T] logits at that length
are tens of GB, so the denoiser needs a streaming attention kernel on TPU
(SURVEY.md §5 long-context note). Standard flash-attention recurrence:
per (batch*head, q-block), stream k/v blocks, keep running max m and
normalizer l, rescale the accumulator.

Kernel layout: grid (BH, num_q_blocks, num_k_blocks) with the k axis as
the innermost (sequential) dimension — accumulators live in VMEM scratch
across k steps. Matmuls in bf16 on the MXU with f32 accumulation.
"""
from __future__ import annotations

import contextlib
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


_LOG2E = math.log2(math.e)
_PAD_BIAS = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, l2_ref, m_ref, acc_ref):
    kb = pl.program_id(2)
    is_first = kb == 0
    is_last = kb == pl.num_programs(2) - 1

    @pl.when(is_first)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                        # [Bq, D+1] (pre-scaled; col D = 1)
    k = k_ref[0]                        # [Bk, D+1] (col D = pad bias)
    v = v_ref[0]                        # [Bk, D+1] (col D = 1: see below)
    # padded kv positions carry a -1e9 bias COLUMN instead of a mask:
    # the D=64 contraction pads to the MXU's 128 depth anyway, so the
    # extra column is free, and it deletes the per-element iota+select
    # (measured ~7 ms of the 65 ms at 48x17776x64)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Bq, Bk]

    m_prev = m_ref[...]                 # [Bq, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    # log2-domain online softmax: scale*log2(e) is folded into q, so
    # exp2 replaces exp (cheaper on the VPU)
    p = jnp.exp2(s - m_new)             # [Bq, Bk]
    alpha = jnp.exp2(m_prev - m_new)
    # the softmax normalizer rides as acc column D: v carries a ones
    # column, so sum(p) comes out of the PV matmul (free on the MXU —
    # D+1 <= 128 output lanes either way) instead of a [Bq,Bk]-wide VPU
    # reduce, and the l-recurrence (l*alpha + sum(p)) IS the acc
    # recurrence on that column
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Bq, D+1]
    m_ref[...] = m_new

    @pl.when(is_last)
    def _():
        D = o_ref.shape[-1]
        l = jnp.maximum(acc_ref[:, D:D + 1], 1e-30)
        o_ref[0] = (acc_ref[:, :D] / l).astype(o_ref.dtype)
        # log2-domain logsumexp per row — the backward residual.
        # l2 rides as [BH, Tp, 1] so its (1, bq, 1) block satisfies
        # Mosaic's (8,128)-divisible-or-full rule (a [BH, Tp] layout
        # with (1, bq) blocks fails to lower: dim -2 is 1 of 48).
        l2_ref[0] = m_ref[...] + jnp.log2(l)


def _attn_kernel_nomax(q_ref, k_ref, v_ref, o_ref, l2_ref, acc_ref):
    """Softmax WITHOUT the running max: p = exp2(s) directly.

    Safe whenever the natural logits are bounded by ~80 (exp2 operand
    ~115 < the f32/bf16 exponent ceiling of 127): with qk-LayerNorm
    (CogVideoX norm_q/norm_k) |s·scale| <= sqrt(D)·O(1) ~ 10, so the
    shifted and unshifted softmax are identical up to normalization.
    Deletes the bk-wide max-reduce, the subtract, and the alpha
    rescales from the VPU chain — the measured MFU binder at D=64
    (docs/KERNELS.md §6). The normalizer rides as acc column D via v's
    ones column (see _attn_kernel), so the only [Bq,Bk]-wide VPU op
    left is the exp2 itself."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                        # [Bq, D+1] (pre-scaled; col D = 1)
    k = k_ref[0]                        # [Bk, D+1] (col D = pad bias)
    v = v_ref[0]                        # [Bk, D+1] (col D = 1)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Bq, Bk]
    p = jnp.exp2(s)
    acc_ref[...] = acc_ref[...] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Bq, D+1]

    @pl.when(kb == pl.num_programs(2) - 1)
    def _():
        D = o_ref.shape[-1]
        l = jnp.maximum(acc_ref[:, D:D + 1], 1e-30)
        o_ref[0] = (acc_ref[:, :D] / l).astype(o_ref.dtype)
        l2_ref[0] = jnp.log2(l)        # logsumexp2 (m == 0 here)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float | None = None,
                    block_q: int = 1024, block_k: int = 1024,
                    bounded_logits: bool = False) -> jnp.ndarray:
    """[B,H,T,D] q,k,v -> [B,H,T,D]. Non-causal full attention.

    1024x1024 blocks measured ~1.6x faster than 512x512 at the DiT's
    18k-token/48-head shape; 2048 blocks exceed VMEM. Padded kv tokens
    are handled by a bias feature column (see kernel docstring); softmax
    runs in the log2 domain. Measured 65.3 -> ~58 ms at 48x17776x64
    (experiments/ab_attention2.py).

    ``bounded_logits=True`` selects the no-running-max kernel
    (_attn_kernel_nomax): exact for qk-LayerNormed models whose logits
    cannot approach exp2's f32 range (|natural logits| << 80).

    Differentiable: jax.custom_vjp with Pallas backward kernels
    (_bwd_dq_kernel / _bwd_dkv_kernel) — the DiT fine-tune path
    backprops through this at the full 17.8k sequence."""
    D = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    return _flash(q, k, v, float(scale), int(block_q), int(block_k),
                  bool(bounded_logits))


def _fwd_prep(q, k, v, scale, block_q, block_k):
    """Scale-fold + pad to block multiples + bias column (see kernel
    docstring). Returns [BH, T, D]-layout operands and the dim tuple."""
    B, H, T, D = q.shape
    Tk = k.shape[2]
    bq = min(block_q, T)
    bk = min(block_k, Tk)
    Tp = ((T + bq - 1) // bq) * bq
    Tkp = ((Tk + bk - 1) // bk) * bk
    q = q * jnp.asarray(scale * _LOG2E, q.dtype)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Tp - T), (0, 1)),
                 constant_values=1.0)    # col D = 1 everywhere
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Tkp - Tk), (0, 0)))
    bias = jnp.where(jnp.arange(Tkp) < Tk, 0.0, _PAD_BIAS
                     ).astype(k.dtype)[None, None, :, None]
    kp = jnp.concatenate(
        [kp, jnp.broadcast_to(bias, (B, H, Tkp, 1))], axis=-1)
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Tkp - Tk), (0, 0)))
    qp = qp.reshape(B * H, Tp, D + 1)
    kp = kp.reshape(B * H, Tkp, D + 1)
    vp = vp.reshape(B * H, Tkp, D)
    return qp, kp, vp, (B, H, T, Tk, D, bq, bk, Tp, Tkp)


def _flash_fwd_impl(q, k, v, scale, block_q, block_k, bounded_logits):
    if bounded_logits and NT_BOUNDED_FORWARD:
        return _flash_fwd_impl_t(q, k, v, scale, block_q, block_k)
    qp, kp, vp, (B, H, T, Tk, D, bq, bk, Tp, Tkp) = _fwd_prep(
        q, k, v, scale, block_q, block_k)
    # ones column on v: the softmax normalizer becomes acc column D of
    # the PV matmul (kernel docstrings). Padded kv rows keep it too —
    # their p is already ~0 through the k bias column.
    vp = jnp.concatenate(
        [vp, jnp.ones((B * H, Tkp, 1), vp.dtype)], axis=-1)
    grid = (B * H, Tp // bq, Tkp // bk)
    scratch = [pltpu.VMEM((bq, D + 1), jnp.float32)]
    if not bounded_logits:
        scratch.insert(0, pltpu.VMEM((bq, 1), jnp.float32))  # running max
    out, l2 = pl.pallas_call(
        _attn_kernel_nomax if bounded_logits else _attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D + 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D + 1), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D + 1), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Tp, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Tp, 1), jnp.float32),
        ],
        scratch_shapes=scratch,
    )(qp, kp, vp)
    return out.reshape(B, H, Tp, D)[:, :, :T], l2[..., 0]


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, l2_ref, dvec_ref,
                   dq_ref, acc_ref, *, scale):
    """dq = scale · Σ_k ds @ k with ds = p ∘ (do@vᵀ − D), p recomputed
    from the saved row logsumexp (no second online softmax)."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                        # [Bq, D+1] (scaled; col D = 1)
    k = k_ref[0]                        # [Bk, D+1] (col D = pad bias)
    v = v_ref[0]                        # [Bk, D]
    do = do_ref[0]                      # [Bq, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Bq, Bk]
    p = jnp.exp2(s - l2_ref[0])         # normalized probabilities
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Bq, Bk]
    ds = p * (dp - dvec_ref[0])
    acc_ref[...] = acc_ref[...] + jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Bq, D+1]

    @pl.when(kb == pl.num_programs(2) - 1)
    def _():
        acc = acc_ref[...]
        dq_ref[0] = (acc[:, :dq_ref.shape[-1]] * scale
                     ).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, l2_ref, dvec_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc):
    """dv = pᵀ @ do; dk = ln2 · dsᵀ @ q̃ (q̃ carries scale·log2e, so the
    ln2 restores plain scale·dsᵀ@q). Grid is (BH, k-blocks, q-blocks)
    with q innermost so the accumulators live per k block."""
    qb_i = pl.program_id(2)

    @pl.when(qb_i == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0]                        # [Bq, D+1]
    k = k_ref[0]                        # [Bk, D+1]
    v = v_ref[0]                        # [Bk, D]
    do = do_ref[0]                      # [Bq, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Bq, Bk]
    p = jnp.exp2(s - l2_ref[0])
    pc = p.astype(do.dtype)
    dv_acc[...] = dv_acc[...] + jax.lax.dot_general(
        pc, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Bk, D]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Bq, Bk]
    ds = (p * (dp - dvec_ref[0])).astype(q.dtype)
    dk_acc[...] = dk_acc[...] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Bk, D+1]

    @pl.when(qb_i == pl.num_programs(2) - 1)
    def _():
        d = dk_ref.shape[-1]
        acc = dk_acc[...]
        dk_ref[0] = (acc[:, :d] * (1.0 / _LOG2E)).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_dq_kernel_t(kx_ref, qTx_ref, v_ref, doT_ref, l2T_ref, dvecT_ref,
                     kT_ref, dqT_ref, acc_ref, *, scale):
    """Transposed dq: everything in [feature, token] layout so the
    dq-producing matmul streams D rows (kT @ dsT) instead of padding a
    65-wide output to 128 lanes (see _attn_kernel_nomax_t).

      sT  [Bk,Bq] = k_ext · qT_ext   (pad-bias column keeps padded p~0)
      pT  [Bk,Bq] = exp2(sT - l2T)
      dpT [Bk,Bq] = v · doT
      dsT         = pT (dpT - dvecT)
      acc [D,Bq] += kT · dsT          (K=Bk full, N=Bq full, M=D streams)
    """
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    kx = kx_ref[0]                      # [Bk, D+1] (col D = pad bias)
    qTx = qTx_ref[0]                    # [D+1, Bq] (row D = 1; scaled)
    v = v_ref[0]                        # [Bk, D]
    doT = doT_ref[0]                    # [D, Bq]
    sT = jax.lax.dot_general(
        kx, qTx, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Bk, Bq]
    pT = jnp.exp2(sT - l2T_ref[0])
    dpT = jax.lax.dot_general(
        v, doT, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Bk, Bq]
    dsT = (pT * (dpT - dvecT_ref[0])).astype(kT_ref.dtype)
    acc_ref[...] = acc_ref[...] + jax.lax.dot_general(
        kT_ref[0], dsT, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [D, Bq]

    @pl.when(kb == pl.num_programs(2) - 1)
    def _():
        dqT_ref[0] = (acc_ref[...] * scale).astype(dqT_ref.dtype)


def _bwd_dkv_kernel_t(qx_ref, kx_ref, v_ref, do_ref, doT_ref, qTx_ref,
                      l2_ref, dvec_ref, dkT_ref, dvT_ref,
                      dk_acc, dv_acc):
    """Transposed dkv: dv^T = doT·p and dk^T = q̃T·ds stream D rows
    through the MXU (full-width N=Bk outputs) instead of padding the
    64/65-wide dv/dk outputs to 128 lanes. Grid (BH, k-blocks, q-blocks)
    with q innermost; accumulators live per k block."""
    qb_i = pl.program_id(2)

    @pl.when(qb_i == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    qx = qx_ref[0]                      # [Bq, D+1] (scaled; col D = 1)
    kx = kx_ref[0]                      # [Bk, D+1] (col D = pad bias)
    v = v_ref[0]                        # [Bk, D]
    do = do_ref[0]                      # [Bq, D]
    doT = doT_ref[0]                    # [D, Bq]
    s = jax.lax.dot_general(
        qx, kx, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Bq, Bk]
    p = jnp.exp2(s - l2_ref[0])
    dv_acc[...] = dv_acc[...] + jax.lax.dot_general(
        doT, p.astype(do.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [D, Bk]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Bq, Bk]
    ds = (p * (dp - dvec_ref[0])).astype(qx.dtype)
    dk_acc[...] = dk_acc[...] + jax.lax.dot_general(
        qTx_ref[0, :dkT_ref.shape[1]], ds, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [D, Bk]

    @pl.when(qb_i == pl.num_programs(2) - 1)
    def _():
        dkT_ref[0] = (dk_acc[...] * (1.0 / _LOG2E)).astype(dkT_ref.dtype)
        dvT_ref[0] = dv_acc[...].astype(dvT_ref.dtype)


def _bwd_fused_kernel_t(kx_ref, qTx_ref, v_ref, doT_ref, l2T_ref,
                        dvecT_ref, kT_ref, dkT_ref, dvT_ref, dq_hbm,
                        dk_acc, dv_acc, dq_buf, dq_sem, *, scale):
    """FUSED transposed backward: ONE kernel produces dq, dk and dv.

    The split dq/dkv kernels each recompute s and dp — 7 [Bq,Bk]-sized
    MXU passes where 5 suffice (s, dp, dq, dk, dv). Everything rides the
    sT [Bk,Bq] feature-major layout (KERNELS.md §11):

      sT   = kx · qTx            pT = exp2(sT − l2T)
      dpT  = v · doT             dsT = pT (dpT − dvecT)
      dvT += doT ·₁ pT           dkT += q̃T ·₁ dsT      (D rows stream)
      dqT[j] (+)= scale · kT · dsT

    Grid (BH, k-blocks, q-blocks) q-innermost: dk/dv accumulate in VMEM
    per k-block; the dq accumulator lives in HBM as an f32 output that
    each k-block READ-MODIFY-WRITES per q-block (initialized at kb==0;
    grid steps run sequentially on the core, so the RMW is race-free —
    ~0.5 MB/step, ~3 ms total at the DiT shape vs the ~38 ms the saved
    s/dp recomputation costs)."""
    kb = pl.program_id(1)
    qb = pl.program_id(2)
    b = pl.program_id(0)
    bq = qTx_ref.shape[-1]
    D = dkT_ref.shape[1]

    @pl.when(qb == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    kx = kx_ref[0]                      # [Bk, D+1] (col D = pad bias)
    qTx = qTx_ref[0]                    # [D+1, Bq] (row D = 1; scaled)
    v = v_ref[0]                        # [Bk, D]
    doT = doT_ref[0]                    # [D, Bq]
    sT = jax.lax.dot_general(
        kx, qTx, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Bk, Bq]
    pT = jnp.exp2(sT - l2T_ref[0])
    dpT = jax.lax.dot_general(
        v, doT, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Bk, Bq]
    dsT = (pT * (dpT - dvecT_ref[0])).astype(kx.dtype)
    dv_acc[...] = dv_acc[...] + jax.lax.dot_general(
        doT, pT.astype(doT.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [D, Bk]
    dk_acc[...] = dk_acc[...] + jax.lax.dot_general(
        qTx[:D], dsT, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [D, Bk]
    contrib = jax.lax.dot_general(
        kT_ref[0], dsT, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # [D, Bq]

    dst = dq_hbm.at[b, :, pl.ds(qb * bq, bq)]

    @pl.when(kb == 0)
    def _():
        dq_buf[...] = contrib

    @pl.when(kb > 0)
    def _():
        rd = pltpu.make_async_copy(dst, dq_buf, dq_sem)
        rd.start()
        rd.wait()
        dq_buf[...] = dq_buf[...] + contrib

    wr = pltpu.make_async_copy(dq_buf, dst, dq_sem)
    wr.start()
    wr.wait()

    @pl.when(qb == pl.num_programs(2) - 1)
    def _():
        dkT_ref[0] = (dk_acc[...] * (1.0 / _LOG2E)).astype(dkT_ref.dtype)
        dvT_ref[0] = dv_acc[...].astype(dvT_ref.dtype)


FUSED_BWD = True     # route the bounded/nt backward through the fused
#                      kernel (split dq + dkv kernels remain for A/B)
_BWD_BLOCK = 1024    # backward block (both axes unless the *_Q/*_K
#                      overrides below are set): 512 was the round-2
#                      default ("s/p/dp/ds all live -> half the fwd
#                      block") but 1024 measured 208.6 -> 179.5 ms
#                      fwd+bwd at the DiT shape (experiments/
#                      ab_attention6.py) — the bigger MXU tiles beat the
#                      VMEM pressure on v5e. 256 is 2.3x WORSE.
_BWD_BLOCK_Q = None  # optional per-axis overrides (None = _BWD_BLOCK)
_BWD_BLOCK_K = None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, scale, block_q, block_k, bounded_logits):
    out, _ = _flash_fwd_impl(q, k, v, scale, block_q, block_k,
                             bounded_logits)
    return out


def _flash_fwd_rule(q, k, v, scale, block_q, block_k, bounded_logits):
    out, l2 = _flash_fwd_impl(q, k, v, scale, block_q, block_k,
                              bounded_logits)
    return out, (q, k, v, out, l2)


def _flash_bwd_rule(scale, block_q, block_k, bounded_logits, res, do):
    q, k, v, out, l2 = res
    return _flash_bwd_core(q, k, v, out, l2, do, scale, block_q, block_k,
                           bounded_logits)


def _flash_bwd_core(q, k, v, out, l2, do, scale, block_q, block_k,
                    bounded_logits):
    bq = min(_BWD_BLOCK_Q or _BWD_BLOCK, block_q)
    bk = min(_BWD_BLOCK_K or _BWD_BLOCK, block_k)
    qp, kp, vp, (B, H, T, Tk, D, bq, bk, Tp, Tkp) = _fwd_prep(
        q, k, v, scale, bq, bk)
    dop = jnp.pad(do, ((0, 0), (0, 0), (0, Tp - T), (0, 0))
                  ).reshape(B * H, Tp, D)
    # D_row = Σ_d do·o (the softmax-jacobian diagonal term)
    dvec = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), -1)
    dvec = jnp.pad(dvec, ((0, 0), (0, 0), (0, Tp - T))
                   ).reshape(B * H, Tp, 1)
    # l2 was written at the forward's padding; re-pad to the backward's
    l2p = jnp.pad(l2[:, :T], ((0, 0), (0, Tp - T))).reshape(B * H, Tp, 1)

    bh = B * H
    nq, nk = Tp // bq, Tkp // bk

    if bounded_logits and NT_BOUNDED_FORWARD and FUSED_BWD:
        # FUSED transposed backward: dq + dk + dv from one kernel
        # (docstring of _bwd_fused_kernel_t)
        qTx = qp.transpose(0, 2, 1)                  # [BH, D+1, Tp]
        doT = dop.transpose(0, 2, 1)                 # [BH, D, Tp]
        kT = kp[:, :, :D].transpose(0, 2, 1)         # [BH, D, Tkp]
        l2T = l2p.transpose(0, 2, 1)                 # [BH, 1, Tp]
        dvecT = dvec.transpose(0, 2, 1)
        dkT, dvT, dqT = pl.pallas_call(
            functools.partial(_bwd_fused_kernel_t, scale=scale),
            grid=(bh, nk, nq),
            in_specs=[
                pl.BlockSpec((1, bk, D + 1), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D + 1, bq), lambda b, i, j: (b, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, D), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, bq), lambda b, i, j: (b, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, bk), lambda b, i, j: (b, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, D, bk), lambda b, i, j: (b, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, bk), lambda b, i, j: (b, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, D, Tkp), k.dtype),
                jax.ShapeDtypeStruct((bh, D, Tkp), v.dtype),
                jax.ShapeDtypeStruct((bh, D, Tp), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((D, bk), jnp.float32),
                            pltpu.VMEM((D, bk), jnp.float32),
                            pltpu.VMEM((D, bq), jnp.float32),
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(kp, qTx, vp, doT, l2T, dvecT, kT)
        dq = dqT.astype(q.dtype).transpose(0, 2, 1)
        dk = dkT.transpose(0, 2, 1)
        dv = dvT.transpose(0, 2, 1)
        dq = dq.reshape(B, H, Tp, D)[:, :, :T]
        dk = dk.reshape(B, H, Tkp, D)[:, :, :Tk]
        dv = dv.reshape(B, H, Tkp, D)[:, :, :Tk]
        return dq, dk, dv

    if bounded_logits and NT_BOUNDED_FORWARD:
        # transposed dq (see _bwd_dq_kernel_t): feature-major operands
        qTx = qp.transpose(0, 2, 1)                  # [BH, D+1, Tp]
        doT = dop.transpose(0, 2, 1)                 # [BH, D, Tp]
        kT = kp[:, :, :D].transpose(0, 2, 1)         # [BH, D, Tkp]
        l2T = l2p.transpose(0, 2, 1)                 # [BH, 1, Tp]
        dvecT = dvec.transpose(0, 2, 1)
        dqT = pl.pallas_call(
            functools.partial(_bwd_dq_kernel_t, scale=scale),
            grid=(bh, nq, nk),
            in_specs=[
                pl.BlockSpec((1, bk, D + 1), lambda b, i, j: (b, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D + 1, bq), lambda b, i, j: (b, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, bq), lambda b, i, j: (b, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, bk), lambda b, i, j: (b, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, D, bq), lambda b, i, j: (b, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, D, Tp), q.dtype),
            scratch_shapes=[pltpu.VMEM((D, bq), jnp.float32)],
        )(kp, qTx, vp, doT, l2T, dvecT, kT)
        dq_arr = dqT.transpose(0, 2, 1)              # [BH, Tp, D]
    else:
        dq_arr = None

    common_specs = dict(
        q=pl.BlockSpec((1, bq, D + 1), lambda b, i, j: (b, i, 0),
                       memory_space=pltpu.VMEM),
        do=pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0),
                        memory_space=pltpu.VMEM),
        row=pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM))
    dq = dq_arr if dq_arr is not None else pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale),
        grid=(bh, nq, nk),
        in_specs=[
            common_specs['q'],
            pl.BlockSpec((1, bk, D + 1), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            common_specs['do'], common_specs['row'], common_specs['row'],
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, Tp, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, D + 1), jnp.float32)],
    )(qp, kp, vp, dop, l2p, dvec)

    if bounded_logits and NT_BOUNDED_FORWARD:
        dkT, dvT = pl.pallas_call(
            _bwd_dkv_kernel_t,
            grid=(bh, nk, nq),
            in_specs=[
                pl.BlockSpec((1, bq, D + 1), lambda b, i, j: (b, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, D + 1), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, D), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, D), lambda b, i, j: (b, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, bq), lambda b, i, j: (b, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D + 1, bq), lambda b, i, j: (b, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, D, bk), lambda b, i, j: (b, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, bk), lambda b, i, j: (b, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((bh, D, Tkp), k.dtype),
                       jax.ShapeDtypeStruct((bh, D, Tkp), v.dtype)],
            scratch_shapes=[pltpu.VMEM((D, bk), jnp.float32),
                            pltpu.VMEM((D, bk), jnp.float32)],
        )(qp, kp, vp, dop, doT, qTx, l2p, dvec)
        dk = dkT.transpose(0, 2, 1)
        dv = dvT.transpose(0, 2, 1)
        dq = dq.reshape(B, H, Tp, D)[:, :, :T]
        dk = dk.reshape(B, H, Tkp, D)[:, :, :Tk]
        dv = dv.reshape(B, H, Tkp, D)[:, :, :Tk]
        return dq, dk, dv

    dk, dv = pl.pallas_call(
        _bwd_dkv_kernel,
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, bq, D + 1), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D + 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((bh, Tkp, D), k.dtype),
                   jax.ShapeDtypeStruct((bh, Tkp, D), v.dtype)],
        scratch_shapes=[pltpu.VMEM((bk, D + 1), jnp.float32),
                        pltpu.VMEM((bk, D), jnp.float32)],
    )(qp, kp, vp, dop, l2p, dvec)

    dq = dq.reshape(B, H, Tp, D)[:, :, :T]
    dk = dk.reshape(B, H, Tkp, D)[:, :, :Tk]
    dv = dv.reshape(B, H, Tkp, D)[:, :, :Tk]
    return dq, dk, dv


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def _attn_kernel_h2(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                    *, kv_len, block_k, needs_mask, d):
    """Two heads per instance, block-diagonally packed so every matmul is
    full MXU shape at D=64: a K=64 contraction costs the same as K=128 on
    the 128x128 systolic array, so packing head pairs doubles useful
    throughput (VERDICT item 5). Layout per step:

      q_pack [Bq, 2D]   = [q_h1 | q_h2]
      K_bd   [2Bk, 2D]  = [[k_h1, 0], [0, k_h2]]
      s2     [Bq, 2Bk]  = q_pack @ K_bd^T   (full 128-deep contraction)
      V_bd   [2Bk, 2D]  = [[v_h1, 0], [0, v_h2]]
      acc    [Bq, 2D]  += p @ V_bd          (full 128-wide output)

    softmax stats are per head: the two Bk-halves of s2 never mix."""
    kb = pl.program_id(2)
    is_first = kb == 0
    is_last = kb == pl.num_programs(2) - 1

    @pl.when(is_first)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q_pack = jnp.concatenate([q_ref[0], q_ref[1]], axis=1)   # [Bq, 2D]
    zpad = jnp.zeros((k_ref.shape[1], d), k_ref.dtype)
    k_bd = jnp.concatenate([
        jnp.concatenate([k_ref[0], zpad], axis=1),
        jnp.concatenate([zpad, k_ref[1]], axis=1)], axis=0)  # [2Bk, 2D]
    v_bd = jnp.concatenate([
        jnp.concatenate([v_ref[0], zpad], axis=1),
        jnp.concatenate([zpad, v_ref[1]], axis=1)], axis=0)

    s2 = jax.lax.dot_general(
        q_pack, k_bd, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [Bq, 2Bk]
    if needs_mask:
        col = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1)
        col = (col % block_k) + kb * block_k
        s2 = jnp.where(col < kv_len, s2, NEG_INF)

    bk = block_k
    s_a, s_b = s2[:, :bk], s2[:, bk:]
    m_prev = m_ref[...]                                      # [Bq, 2]
    m_cur = jnp.concatenate([jnp.max(s_a, 1, keepdims=True),
                             jnp.max(s_b, 1, keepdims=True)], axis=1)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(jnp.concatenate([s_a - m_new[:, 0:1],
                                 s_b - m_new[:, 1:2]], axis=1))
    alpha = jnp.exp(m_prev - m_new)                          # [Bq, 2]
    l_ref[...] = l_ref[...] * alpha + jnp.concatenate(
        [jnp.sum(p[:, :bk], 1, keepdims=True),
         jnp.sum(p[:, bk:], 1, keepdims=True)], axis=1)
    alpha_w = jnp.concatenate(
        [jnp.broadcast_to(alpha[:, 0:1], (alpha.shape[0], d)),
         jnp.broadcast_to(alpha[:, 1:2], (alpha.shape[0], d))], axis=1)
    acc_ref[...] = acc_ref[...] * alpha_w + jax.lax.dot_general(
        p.astype(v_bd.dtype), v_bd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[...] = m_new

    @pl.when(is_last)
    def _():
        l = jnp.maximum(l_ref[...], 1e-30)
        l_w = jnp.concatenate(
            [jnp.broadcast_to(l[:, 0:1], (l.shape[0], d)),
             jnp.broadcast_to(l[:, 1:2], (l.shape[0], d))], axis=1)
        o = acc_ref[...] / l_w
        o_ref[0] = o[:, :d].astype(o_ref.dtype)
        o_ref[1] = o[:, d:].astype(o_ref.dtype)


def flash_attention_h2(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       scale: float | None = None,
                       block_q: int = 1024,
                       block_k: int = 512) -> jnp.ndarray:
    """Head-pair-packed flash attention for D<=64 and even B*H.
    Same contract as flash_attention."""
    B, H, T, D = q.shape
    Tk = k.shape[2]
    assert (B * H) % 2 == 0 and D <= 64
    scale = scale if scale is not None else 1.0 / math.sqrt(D)

    bq = min(block_q, T)
    bk = min(block_k, Tk)
    Tp = ((T + bq - 1) // bq) * bq
    Tkp = ((Tk + bk - 1) // bk) * bk
    q = q * jnp.asarray(scale, q.dtype)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Tkp - Tk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Tkp - Tk), (0, 0)))
    qp = qp.reshape(B * H, Tp, D)
    kp = kp.reshape(B * H, Tkp, D)
    vp = vp.reshape(B * H, Tkp, D)

    grid = (B * H // 2, Tp // bq, Tkp // bk)
    out = pl.pallas_call(
        functools.partial(_attn_kernel_h2, kv_len=Tk, block_k=bk,
                          needs_mask=(Tkp != Tk), d=D),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, bq, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bk, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bk, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, bq, D), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 2), jnp.float32),
            pltpu.VMEM((bq, 2), jnp.float32),
            pltpu.VMEM((bq, 2 * D), jnp.float32),
        ],
    )(qp, kp, vp)
    return out.reshape(B, H, Tp, D)[:, :, :T]


def _attn_kernel_nomax_t(k_ref, qT_ref, vT_ref, oT_ref, l2_ref, acc_ref):
    """Transposed no-max kernel: everything lives in [feature, token]
    layout so the PV contraction streams D+1 rows through the MXU
    instead of padding its OUTPUT to 128 lanes.

    MXU padding at D=64 (the DiT head dim) wastes half the array twice
    in the standard layout: the QK^T contraction pads K=64->128 and the
    PV matmul pads its output width N=65->128. The contraction padding
    is intrinsic (s[i,j] needs only 64 products but the systolic depth
    is 128), but the PV waste is NOT: computing acc^T = v^T @ p^T makes
    the head dim the STREAMED M dimension (M=72 costs 72 row-passes,
    not 128 lanes) and the token dim the full-width N=Bq output. Same
    trick is impossible for QK^T (transposing keeps D as the
    contraction). Softmax normalizer rides as v^T row D (ones on valid
    kv tokens, zero on padding — which also replaces the pad-bias
    column: padded rows hit exp2(0)=1 times an all-zero v^T column).
    """
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    k = k_ref[0]                        # [Bk, D]
    qT = qT_ref[0]                      # [D, Bq]  (scale*log2e folded in)
    vT = vT_ref[0]                      # [Dp8, Bk] (row D = valid mask)
    sT = jax.lax.dot_general(
        k, qT, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Bk, Bq]
    pT = jnp.exp2(sT)
    acc_ref[...] = acc_ref[...] + jax.lax.dot_general(
        vT, pT.astype(vT.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [Dp8, Bq]

    @pl.when(kb == pl.num_programs(2) - 1)
    def _():
        D = oT_ref.shape[1]
        l = jnp.maximum(acc_ref[D:D + 1, :], 1e-30)      # [1, Bq]
        oT_ref[0] = (acc_ref[:D, :] / l).astype(oT_ref.dtype)
        l2_ref[0] = jnp.log2(l)


def _attn_kernel_nomax_t2(k_ref, qT_ref, vT_ref, oT_ref, l2_ref, acc_ref):
    """_attn_kernel_nomax_t with the kv block split in two halves in the
    body: half B's sT matmul (MXU) is data-independent of half A's exp2
    (VPU) and PV accumulate, giving the scheduler explicit ILP to
    overlap the vector and matrix units across halves."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    qT = qT_ref[0]                      # [D, Bq]
    n_sub = max(1, k_ref.shape[1] // 1024)
    half = k_ref.shape[1] // n_sub
    acc = acc_ref[...]
    for h in range(n_sub):
        k = k_ref[0, h * half:(h + 1) * half]          # [Bk/2, D]
        vT = vT_ref[0, :, h * half:(h + 1) * half]     # [Dp8, Bk/2]
        sT = jax.lax.dot_general(
            k, qT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [Bk/2, Bq]
        pT = jnp.exp2(sT)
        acc = acc + jax.lax.dot_general(
            vT, pT.astype(vT.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [Dp8, Bq]
    acc_ref[...] = acc

    @pl.when(kb == pl.num_programs(2) - 1)
    def _():
        D = oT_ref.shape[1]
        l = jnp.maximum(acc_ref[D:D + 1, :], 1e-30)
        oT_ref[0] = (acc_ref[:D, :] / l).astype(oT_ref.dtype)
        l2_ref[0] = jnp.log2(l)


def _attn_kernel_nomax_t3(k_ref, qT_ref, vT_ref, oT_ref, l2_ref,
                          acc0, acc1):
    """_attn_kernel_nomax_t2 with TWO accumulators: PV(h) chains
    acc += ... serially, so even with split halves the scheduler cannot
    overlap half B's sT matmul with half A's PV — alternating the
    accumulator breaks the chain (summed once at the end)."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc0[...] = jnp.zeros_like(acc0)
        acc1[...] = jnp.zeros_like(acc1)

    qT = qT_ref[0]
    n_sub = max(2, k_ref.shape[1] // 1024)
    half = k_ref.shape[1] // n_sub
    for h in range(n_sub):
        k = k_ref[0, h * half:(h + 1) * half]
        vT = vT_ref[0, :, h * half:(h + 1) * half]
        sT = jax.lax.dot_general(
            k, qT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        pT = jnp.exp2(sT)
        tgt = acc0 if h % 2 == 0 else acc1
        tgt[...] = tgt[...] + jax.lax.dot_general(
            vT, pT.astype(vT.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kb == pl.num_programs(2) - 1)
    def _():
        D = oT_ref.shape[1]
        acc = acc0[...] + acc1[...]
        l = jnp.maximum(acc[D:D + 1, :], 1e-30)
        oT_ref[0] = (acc[:D, :] / l).astype(oT_ref.dtype)
        l2_ref[0] = jnp.log2(l)


def flash_attention_nt(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       scale: float | None = None,
                       block_q: int = 1024, block_k: int = 1024,
                       split_kv: bool = False) -> jnp.ndarray:
    """Transposed-accumulator no-max flash attention (forward only —
    see _attn_kernel_nomax_t). Exact for bounded logits (qk-LayerNorm
    models), same contract as flash_attention(bounded_logits=True)."""
    out, _ = _flash_fwd_impl_t(q, k, v,
                               scale if scale is not None
                               else 1.0 / math.sqrt(q.shape[-1]),
                               block_q, block_k, split_kv)
    return out


# bounded_logits forwards route through the transposed-accumulator
# kernel (True) or the lane-padded PV kernel (False). l2 residuals are
# contract-identical, so the Pallas backward serves both. Measured at
# the DiT shape (48x17776x64, v5e): 54.6 ms/36.1% MFU -> 41.1 ms/48.0%
# MFU, outputs bit-identical on device (experiments/tpu_battery3.py).
NT_BOUNDED_FORWARD = True
NT_BLOCK_Q = 2048   # nt q-blocks are cheap (no [Bq,Bk] scratch beyond
#                     sT/pT); 2048x1024 measured 3% over 1024x1024


def _flash_fwd_impl_t(q, k, v, scale, block_q, block_k, split_kv=False):
    B, H, T, D = q.shape
    Tk = k.shape[2]
    bq = min(block_q, T)
    bk = min(block_k, Tk)
    Tp = ((T + bq - 1) // bq) * bq
    Tkp = ((Tk + bk - 1) // bk) * bk
    Dp8 = ((D + 1 + 7) // 8) * 8       # acc rows: D values + 1 normalizer,
    #                                    padded to the 8-sublane grain
    q = q * jnp.asarray(scale * _LOG2E, q.dtype)
    qT = jnp.pad(q.transpose(0, 1, 3, 2),              # [B,H,D,T]
                 ((0, 0), (0, 0), (0, 0), (0, Tp - T))
                 ).reshape(B * H, D, Tp)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Tkp - Tk), (0, 0))
                 ).reshape(B * H, Tkp, D)
    vT = v.transpose(0, 1, 3, 2)                       # [B,H,D,Tk]
    mask = (jnp.arange(Tkp) < Tk).astype(v.dtype)[None, None, None]
    vT = jnp.concatenate([
        jnp.pad(vT, ((0, 0), (0, 0), (0, 0), (0, Tkp - Tk))),
        jnp.broadcast_to(mask, (B, H, 1, Tkp)),
        jnp.zeros((B, H, Dp8 - D - 1, Tkp), v.dtype)], axis=2
    ).reshape(B * H, Dp8, Tkp)

    grid = (B * H, Tp // bq, Tkp // bk)
    use_t3 = split_kv == "dual" and bk % 2 == 0
    use_t2 = split_kv is True and bk % 2 == 0
    oT, l2 = pl.pallas_call(
        _attn_kernel_nomax_t3 if use_t3
        else (_attn_kernel_nomax_t2 if use_t2 else _attn_kernel_nomax_t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, bq), lambda b, i, j: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dp8, bk), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, D, bq), lambda b, i, j: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, D, Tp), q.dtype),
            jax.ShapeDtypeStruct((B * H, 1, Tp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Dp8, bq), jnp.float32)] * (
            2 if use_t3 else 1),
    )(kp, qT, vT)
    out = oT.reshape(B, H, D, Tp)[:, :, :, :T].transpose(0, 1, 3, 2)
    # l2 contract matches _flash_fwd_impl ([B*H, Tp] logsumexp2): the
    # shared Pallas backward consumes either forward's residuals.
    return out, l2.reshape(B * H, Tp)


def _attn_kernel_nomax_t4(q_ref, k_ref, vT_ref, o_ref, l2_ref, qT_s, acc,
                          *, scale2: float, Tk_tail: int, D: int):
    """Native-layout bounded forward: q/k stream DIRECTLY from the
    model's [B, T, H*D] tensors as (1, bq, 2D) blocks — one head PAIR
    per grid instance, 128-lane aligned (Mosaic rejects single-head
    (.., 1, 64) blocks: the last two block dims must be 8/128-divisible
    or full). The scale*log2e fold and the qT transposes happen once
    per q-block in VMEM; the output writes back in [B, Tp, H*D] —
    deleting the XLA-side q/k pad+transpose passes and the output
    transpose (~5 passes over the ~218 MB head tensors per layer at
    B=2). kv-tail garbage (non-divisible T reads) is zeroed on the k
    rows (NaN survives clamps and would poison 0*NaN in the PV
    accumulate); q-tail garbage lands in output rows the caller slices
    off."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        q2 = q_ref[0]                                  # [bq, 2D]
        qT_s[...] = jax.lax.transpose(q2, (1, 0)) * jnp.asarray(
            scale2, q2.dtype)                          # [2D, bq]
        acc[...] = jnp.zeros_like(acc)

    k2 = k_ref[0]                                      # [bk, 2D]
    if Tk_tail:
        row = jax.lax.broadcasted_iota(jnp.int32, k2.shape, 0)
        k2 = jnp.where(kb * k2.shape[0] + row < Tk_tail, k2, 0)
    Dp8 = acc.shape[0] // 2
    for h in range(2):
        k = k2[:, h * D:(h + 1) * D]                   # [bk, D]
        qT = qT_s[h * D:(h + 1) * D]                   # [D, bq]
        vT = vT_ref[h]                                 # [Dp8, bk]
        sT = jax.lax.dot_general(
            k, qT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [bk, bq]
        pT = jnp.exp2(sT)
        a = acc[h * Dp8:(h + 1) * Dp8]
        acc[h * Dp8:(h + 1) * Dp8] = a + jax.lax.dot_general(
            vT, pT.astype(vT.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [Dp8, bq]

    @pl.when(kb == pl.num_programs(2) - 1)
    def _():
        outs = []
        for h in range(2):
            a = acc[h * Dp8:(h + 1) * Dp8]
            l = jnp.maximum(a[D:D + 1, :], 1e-30)      # [1, bq]
            outs.append(jax.lax.transpose(a[:D, :] / l, (1, 0)))
            l2_ref[h] = jnp.log2(l)
        o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _flash_fwd_impl_bthd(q, k, v, scale, block_q, block_k):
    """[B, T, H, D] native-layout bounded forward. Returns
    (out [B, T, H, D], l2 [B*H, Tp])."""
    B, T, H, D = q.shape
    Tk = k.shape[1]
    assert H % 2 == 0, "head-pair blocking needs even H"
    assert 2 * D % 128 == 0, "head-pair blocks must be 128-lane aligned"
    bq = min(block_q, T)
    bk = min(block_k, Tk)
    Tp = ((T + bq - 1) // bq) * bq
    Tkp = ((Tk + bk - 1) // bk) * bk
    Dp8 = ((D + 1 + 7) // 8) * 8
    # the ONE staging pass: v -> [B*H, Dp8, Tkp] feature-major with the
    # normalizer/valid-mask row (transpose-free PV needs feature-major v;
    # an in-kernel per-step transpose re-runs per q-block and measured
    # out as more VPU time than this pass)
    vT = v.transpose(0, 2, 3, 1)                       # [B,H,D,Tk]
    mask = (jnp.arange(Tkp) < Tk).astype(v.dtype)[None, None, None]
    vT = jnp.concatenate([
        jnp.pad(vT, ((0, 0), (0, 0), (0, 0), (0, Tkp - Tk))),
        jnp.broadcast_to(mask, (B, H, 1, Tkp)),
        jnp.zeros((B, H, Dp8 - D - 1, Tkp), v.dtype)], axis=2
    ).reshape(B * H, Dp8, Tkp)

    q2 = q.reshape(B, T, H * D)
    k2 = k.reshape(B, T, H * D)
    G = H // 2                                         # head pairs
    grid = (B * G, Tp // bq, Tkp // bk)
    out, l2 = pl.pallas_call(
        functools.partial(_attn_kernel_nomax_t4,
                          scale2=float(scale * _LOG2E),
                          Tk_tail=Tk if Tkp != Tk else 0, D=D),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, 2 * D),
                         lambda g, i, j, G=G: (g // G, i, g % G),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, 2 * D),
                         lambda g, i, j, G=G: (g // G, j, g % G),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Dp8, bk), lambda g, i, j: (g, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, 2 * D),
                         lambda g, i, j, G=G: (g // G, i, g % G),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, bq), lambda g, i, j: (g, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, H * D), q.dtype),
            jax.ShapeDtypeStruct((B * H, 1, Tp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2 * D, bq), q.dtype),
                        pltpu.VMEM((2 * Dp8, bq), jnp.float32)],
    )(q2, k2, vT)
    return (out[:, :T].reshape(B, T, H, D), l2.reshape(B * H, Tp))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_bthd(q, k, v, scale, block_q, block_k):
    out, _ = _flash_fwd_impl_bthd(q, k, v, scale, block_q, block_k)
    return out


def _flash_bthd_fwd_rule(q, k, v, scale, block_q, block_k):
    out, l2 = _flash_fwd_impl_bthd(q, k, v, scale, block_q, block_k)
    return out, (q, k, v, out, l2)


def _flash_bthd_bwd_rule(scale, block_q, block_k, res, do):
    # backward restages to the [B, H, T, D] layout and reuses the
    # existing Pallas backward (training pays bigger costs elsewhere;
    # only the inference forward needs the staging-free path)
    q, k, v, out, l2 = res
    tr = lambda x: x.transpose(0, 2, 1, 3)
    dq, dk, dv = _flash_bwd_core(tr(q), tr(k), tr(v), tr(out), l2,
                                 tr(do), scale, block_q, block_k, True)
    return tr(dq), tr(dk), tr(dv)


_flash_bthd.defvjp(_flash_bthd_fwd_rule, _flash_bthd_bwd_rule)


def attention_bthd(q, k, v, scale=None, dtype=jnp.bfloat16,
                   block_q=None, block_k: int = 1024,
                   flash_threshold: int = 2048):
    """[B, T, H, D] attention dispatch: the native-layout bounded flash
    kernel on TPU for long sequences; otherwise transpose and fall back
    to attention_auto (CPU, short sequences, sequence-/tensor-parallel
    contexts — those kernels keep the [B, H, T, D] contract)."""
    T = q.shape[1]
    scale = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    if (jax.default_backend() == "tpu" and T >= flash_threshold
            and _SEQ_PARALLEL is None and _TENSOR_PARALLEL is None):
        bq = block_q if block_q is not None else NT_BLOCK_Q
        out_dtype = q.dtype
        return _flash_bthd(q.astype(dtype), k.astype(dtype),
                           v.astype(dtype), float(scale), int(bq),
                           int(block_k)).astype(out_dtype)
    tr = lambda x: x.transpose(0, 2, 1, 3)
    out = attention_auto(tr(q), tr(k), tr(v), scale=scale, dtype=dtype,
                         flash_threshold=flash_threshold,
                         bounded_logits=True)
    return out.transpose(0, 2, 1, 3)


_SEQ_PARALLEL = None
_TENSOR_PARALLEL = None


@contextlib.contextmanager
def tensor_parallel(mesh, axis: str = "model"):
    """While active, attention_auto wraps the Pallas flash kernel in a
    shard_map over the HEADS axis. Needed whenever the DiT runs
    tensor-parallel on a real TPU mesh: GSPMD cannot auto-partition a
    Mosaic kernel ("Mosaic kernels cannot be automatically partitioned"
    — surfaced by the first full-sequence TP=2 AOT compile, round 5),
    and attention is embarrassingly parallel over heads, so the
    shard_map is purely local — no collectives. Wrap the jit-CALL site,
    like sequence_parallel."""
    global _TENSOR_PARALLEL
    prev = _TENSOR_PARALLEL
    _TENSOR_PARALLEL = (mesh, axis)
    try:
        yield
    finally:
        _TENSOR_PARALLEL = prev


@contextlib.contextmanager
def sequence_parallel(mesh, axis: str = "data"):
    """While active, attention_auto routes through the exact ppermute
    ring kernel (ops/ring_attention.py) with the sequence sharded over
    `axis` — the scaling path for >49-frame videos (SURVEY.md §5).
    Wrap the jit-CALL site: the routing is baked in at trace time."""
    global _SEQ_PARALLEL
    prev = _SEQ_PARALLEL
    _SEQ_PARALLEL = (mesh, axis)
    try:
        yield
    finally:
        _SEQ_PARALLEL = prev


def attention_auto(q, k, v, scale=None, dtype=jnp.bfloat16,
                   flash_threshold: int = 2048,
                   bounded_logits: bool = False):
    """Dispatch: Pallas flash attention on TPU for long sequences, fused
    einsum otherwise (used by models/cogvideox and models/vggt).
    ``bounded_logits``: caller asserts |natural logits| << 80 (e.g.
    qk-LayerNorm) — selects the cheaper no-running-max kernel."""
    T = q.shape[2]
    out_dtype = q.dtype
    if _SEQ_PARALLEL is not None:
        from .ring_attention import ring_attention_sharded
        mesh, axis = _SEQ_PARALLEL
        return ring_attention_sharded(
            q.astype(dtype), k.astype(dtype), v.astype(dtype), mesh,
            axis, scale).astype(out_dtype)
    if jax.default_backend() == "tpu" and T >= flash_threshold:
        # the transposed nt forward affords larger q blocks (no lane-
        # padded acc); the standard kernel exceeds VMEM at 2048
        bq = NT_BLOCK_Q if (bounded_logits and NT_BOUNDED_FORWARD) \
            else 1024
        fa = lambda qq, kk, vv: flash_attention(
            qq, kk, vv, scale, block_q=bq,
            bounded_logits=bounded_logits)
        if _TENSOR_PARALLEL is not None:
            # heads-sharded TP: shard_map the kernel (heads are
            # independent — local compute, no collectives)
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P
            mesh, axis = _TENSOR_PARALLEL
            spec = P(None, axis, None, None)
            fa = shard_map(fa, mesh=mesh, in_specs=(spec, spec, spec),
                           out_specs=spec, check_rep=False)
        return fa(q.astype(dtype), k.astype(dtype),
                  v.astype(dtype)).astype(out_dtype)
    scale = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum('bhqd,bhkd->bhqk', q.astype(dtype), k.astype(dtype),
                        preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits * scale, axis=-1).astype(dtype)
    return jnp.einsum('bhqk,bhkd->bhqd', p, v.astype(dtype),
                      preferred_element_type=jnp.float32).astype(out_dtype)
