"""[DEAD END] Isolated probe: payload row-gather + chunk-block transpose cost vs
dtype/row-split layout, at the bench scale (A~1.6M slots, P=100k).

Caveat from KERNELS.md §6: isolated timings mis-attribute when XLA fuses
stages differently end-to-end — use this ONLY as a go/no-go signal for
whether a split bf16-channel payload is worth a kernel variant.

OUTCOME: this isolated formulation never completed on the axon backend
(the bare 1.6M-row gather outside the blend fusion compiles to a
pathological form); the question was answered end-to-end instead by
ab_forward6.py — the gather is transaction-bound, byte-shrinking loses.
"""
import time

import jax
import jax.numpy as jnp

P = 100_000
A = 1_638_400          # 12800 chunks of 128
ROWS = 24


def timed(name, fn, *args, n=30):
    def body(*a):
        def step(carry, _):
            out = fn(a[0], jnp.minimum(a[1] + carry.astype(jnp.int32), P), *a[2:])
            return jnp.sum(out[0][-1].astype(jnp.float32)), None
        return jax.lax.scan(step, jnp.zeros(()), None, length=n)[0]
    jfn = jax.jit(body)
    float(jfn(*args))
    t0 = time.perf_counter()
    float(jfn(*args))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:44s} {dt:7.2f} ms", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (A,), 0, P + 1, jnp.int32)
    pay_f32 = jnp.zeros((P + 1, ROWS), jnp.float32)
    pay_bf16 = jnp.zeros((P + 1, ROWS), jnp.bfloat16)
    geom_f32 = jnp.zeros((P + 1, 8), jnp.float32)
    chan_bf16 = jnp.zeros((P + 1, 16), jnp.bfloat16)

    def g_f32(pay, idx):
        r = jnp.take(pay, idx, axis=0)
        return (r.reshape(-1, 128, ROWS).transpose(0, 2, 1),)

    def g_bf16(pay, idx):
        r = jnp.take(pay, idx, axis=0)
        return (r.reshape(-1, 128, ROWS).transpose(0, 2, 1),)

    def g_split(geom, idx, chan):
        rg = jnp.take(geom, idx, axis=0)
        rc = jnp.take(chan, idx, axis=0)
        return (rg.reshape(-1, 128, 8).transpose(0, 2, 1),
                rc.reshape(-1, 128, 16).transpose(0, 2, 1))

    def g_geom_only(geom, idx):
        rg = jnp.take(geom, idx, axis=0)
        return (rg.reshape(-1, 128, 8).transpose(0, 2, 1),)

    timed("gather f32 [A,24] + chunk T (current)", g_f32, pay_f32, idx)
    timed("gather bf16 [A,24] + chunk T", g_bf16, pay_bf16, idx)
    timed("split: f32 [A,8] + bf16 [A,16]", g_split, geom_f32, idx, chan_bf16)
    timed("geom only f32 [A,8]", g_geom_only, geom_f32, idx)


if __name__ == "__main__":
    main()
