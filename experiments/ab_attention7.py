"""Backward block-shape sweep (follow-up to ab_attention6: square 1024
beat 512 by 14%). Asymmetric (bq, bk) via the _BWD_BLOCK_Q/K knobs.

Run: timeout 3000 python experiments/ab_attention7.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import langscenex_tpu.ops.flash_attention as fa

B, H, T, D = 1, 48, 17776, 64
PEAK = 197e12
FLOPS_FWDBWD = 4.0 * B * H * T * T * D * 3.5


def bench(tag, fn, args, flops, n=5, reps=3):
    def body(*a):
        def step(carry, _):
            out = fn(a[0] + carry.astype(a[0].dtype) * 0, *a[1:])
            return jnp.sum(out).astype(jnp.float32), None
        return jax.lax.scan(step, jnp.zeros(()), None, length=n)[0]
    jfn = jax.jit(body)
    float(jfn(*args))
    dts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jfn(*args))
        dts.append((time.perf_counter() - t0) / n)
    dt = min(dts)
    print(f"{tag:40s} {dt*1e3:8.2f} ms  {flops/dt/PEAK*100:5.1f}% MFU",
          flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, T, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, T, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, T, D)) * 0.3, jnp.bfloat16)

    def fwdbwd(q, k, v):
        def loss(q, k, v):
            o = fa.flash_attention(q, k, v, bounded_logits=True)
            return jnp.sum(o.astype(jnp.float32) ** 2)
        gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        return (gq.astype(jnp.float32)[..., 0, :].sum()
                + gk.astype(jnp.float32)[..., 0, :].sum()
                + gv.astype(jnp.float32)[..., 0, :].sum())

    for bq, bk in ((1024, 1024), (2048, 512), (512, 2048), (2048, 1024),
                   (1024, 2048), (2048, 2048)):
        fa._BWD_BLOCK_Q, fa._BWD_BLOCK_K = bq, bk
        try:
            bench(f"fwd+bwd bq={bq} bk={bk}", fwdbwd, (q, k, v),
                  FLOPS_FWDBWD)
        except Exception as e:
            print(f"bq={bq} bk={bk} FAILED: {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)
    fa._BWD_BLOCK_Q = fa._BWD_BLOCK_K = None


if __name__ == "__main__":
    main()
