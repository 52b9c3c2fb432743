"""Round-3 attention backward A/B at the DiT shape (VERDICT item 5:
fwd+bwd was 238.9 ms / 28.9% MFU at round-2e, measured BEFORE the
transposed dq/dkv kernels landed in commit 351bcf5).

Measures value_and_grad through the shipped custom_vjp:
  - current default (nt forward + transposed dq/dkv backward)
  - non-transposed backward (NT_BOUNDED_FORWARD toggled off reroutes
    forward too, so this is the full r2e configuration for reference)
  - backward block-size sweep via flash_attention._BWD_BLOCK

Run: timeout 3000 python experiments/ab_attention6.py
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
FLOPS_FWD = 4.0 * B * H * T * T * D          # QK^T + PV
FLOPS_FWDBWD = FLOPS_FWD * 3.5               # bwd = 2.5x fwd


def chain(fn, n, *args):
    def body(*a):
        def step(carry, _):
            out = fn(a[0] + carry.astype(a[0].dtype) * 0, *a[1:])
            return jnp.sum(out).astype(jnp.float32), None
        return jax.lax.scan(step, jnp.zeros(()), None, length=n)[0]
    return jax.jit(body)


def bench(tag, fn, args, flops, n=5, reps=3):
    jfn = chain(fn, n, *args)
    float(jfn(*args))
    dts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jfn(*args))
        dts.append((time.perf_counter() - t0) / n)
    dt = min(dts)
    print(f"{tag:44s} {dt*1e3:8.2f} ms  {flops/dt/PEAK*100:5.1f}% MFU",
          flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, T, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, T, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, T, D)) * 0.3, jnp.bfloat16)

    def fwd(q, k, v):
        return fa.flash_attention(q, k, v, bounded_logits=True)

    def fwdbwd(q, k, v):
        def loss(q, k, v):
            o = fa.flash_attention(q, k, v, bounded_logits=True)
            return jnp.sum(o.astype(jnp.float32) ** 2)
        gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        return (gq.astype(jnp.float32)[..., 0, :].sum()
                + gk.astype(jnp.float32)[..., 0, :].sum()
                + gv.astype(jnp.float32)[..., 0, :].sum())

    print(f"NT_BOUNDED_FORWARD={fa.NT_BOUNDED_FORWARD} "
          f"_BWD_BLOCK={fa._BWD_BLOCK}")
    bench("fwd nt (current default)", fwd, (q, k, v), FLOPS_FWD)
    base = bench("fwd+bwd transposed-bwd (current)", fwdbwd, (q, k, v),
                 FLOPS_FWDBWD)

    for blk in (1024, 768, 256):
        fa._BWD_BLOCK = blk
        try:
            bench(f"fwd+bwd transposed-bwd  bwd_block={blk}", fwdbwd,
                  (q, k, v), FLOPS_FWDBWD)
        except Exception as e:
            print(f"bwd_block={blk} FAILED: {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)
    fa._BWD_BLOCK = 512

    # full r2e configuration (non-transposed fwd AND bwd) for the record
    fa.NT_BOUNDED_FORWARD = False
    try:
        bench("fwd+bwd r2e kernels (nomax fwd, plain bwd)", fwdbwd,
              (q, k, v), FLOPS_FWDBWD)
    finally:
        fa.NT_BOUNDED_FORWARD = True


if __name__ == "__main__":
    main()
