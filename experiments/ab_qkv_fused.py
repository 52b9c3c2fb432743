"""A/B: separate to_q/to_k/to_v matmuls vs one fused QKV projection.

The DiT dense budget (KERNELS.md §6: ~1.26 s of the 2.99 s B=1 forward
at ~65% MFU) is 42 layers of [T,3072]x[3072,3072] projections plus the
4x MLP. Hypothesis: XLA does not merge the three independent QKV
matmuls, so each re-streams the [T,3072] activation from HBM and eats
its own launch/epilogue; one [3072,9216] matmul amortizes both. Measures
the layer-level dense stack both ways at the 5.57B shape (T=17776,
hidden=3072) so a win here predicts the full-model win before any model
surgery (converter + TP rules would need to follow).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/ab_qkv_fused.py
"""
import time

import jax
import jax.numpy as jnp

T, H = 17776, 3072
N_LAYERS = 8  # enough to dominate launch noise; scale to 42 for s/model


def bench(fn, *args, n=10, tag=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    # chain through a fetch: block_until_ready can return early over axon
    float(jnp.sum(out[0][:1, :1] if isinstance(out, tuple) else out[:1, :1]))
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt * 1e3:.2f} ms", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (T, H), jnp.bfloat16)
    wq, wk, wv = (jax.random.normal(jax.random.PRNGKey(i), (H, H),
                                    jnp.bfloat16) * 0.02 for i in (1, 2, 3))
    wqkv = jnp.concatenate([wq, wk, wv], axis=1)  # [H, 3H]

    @jax.jit
    def sep(x):
        h = x
        for _ in range(N_LAYERS):
            q = h @ wq
            k = h @ wk
            v = h @ wv
            h = (q + k + v) * jnp.bfloat16(0.01)  # consume all three
        return h

    @jax.jit
    def fused(x):
        h = x
        for _ in range(N_LAYERS):
            qkv = h @ wqkv
            q, k, v = jnp.split(qkv, 3, axis=-1)
            h = (q + k + v) * jnp.bfloat16(0.01)
        return h

    d_sep = bench(sep, x, tag=f"separate qkv x{N_LAYERS}")
    d_fus = bench(fused, x, tag=f"fused qkv    x{N_LAYERS}")
    flops = 2 * T * H * 3 * H * N_LAYERS
    peak = 197e12
    print(f"separate: {flops / d_sep / peak * 100:.1f}% MFU | "
          f"fused: {flops / d_fus / peak * 100:.1f}% MFU | "
          f"win {100 * (1 - d_fus / d_sep):.1f}%  "
          f"(projected full-model saving "
          f"{(d_sep - d_fus) * 42 / N_LAYERS * 1e3:.0f} ms of the "
          f"2990 ms B=1 fwd)", flush=True)


if __name__ == "__main__":
    main()
