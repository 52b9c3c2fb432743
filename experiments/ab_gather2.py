"""Isolated payload-gather roofline probes (round 3).

The row gather is 11.4 ms of the 23 ms full-channel forward
(ab_staging2.py). This measures the HARD bound: XLA row-gather
throughput vs A and row width, plus a Pallas in-kernel gather from a
VMEM-resident table (if Mosaic lowers it) as the one alternative engine.

Run: timeout 1800 python experiments/ab_gather2.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 100_000


def timed(name, fn, args, n=20, reps=3):
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
        dts.append((time.perf_counter() - t0) / n * 1e3)
    return min(dts)


def xla_gather(A, W):
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(P + 1, W)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, P, A), jnp.int32)

    def f(tab, idx):
        return jnp.take(tab, idx, axis=0)

    ms = timed(f"xla A={A} W={W}", f, (tab, idx))
    print(f"xla row gather  A={A:8d} W={W:3d}: {ms:7.2f} ms  "
          f"{A/ms*1e3/1e6:6.1f} M rows/s  "
          f"{A*W*4/ms*1e3/1e9:6.1f} GB/s useful", flush=True)


def pallas_gather(A, W=24, table_bf16=False):
    """Grid over A/512 chunks; table resident in VMEM; in-kernel
    jnp.take on the sublane axis."""
    dt = jnp.bfloat16 if table_bf16 else jnp.float32
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(P + 8, W)), dt)
    idx = jnp.asarray(rng.integers(0, P, A), jnp.int32)
    CH = 512

    def kern(idx_ref, tab_ref, out_ref):
        ids = idx_ref[0]                       # [CH]
        out_ref[0] = jnp.take(tab_ref[...], ids, axis=0)

    def f(tab, idx):
        return pl.pallas_call(
            kern,
            grid=(A // CH,),
            in_specs=[
                pl.BlockSpec((1, CH), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, CH, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((A // CH, CH, W), dt),
        )(idx.reshape(A // CH, CH), tab)

    try:
        ms = timed(f"pallas A={A}", f, (tab, idx))
        print(f"pallas vmem gather A={A:8d} W={W:3d} {dt.__name__}: "
              f"{ms:7.2f} ms  {A/ms*1e3/1e6:6.1f} M rows/s", flush=True)
    except Exception as e:
        print(f"pallas vmem gather W={W} {dt.__name__} FAILED: "
              f"{type(e).__name__}: {str(e)[:160]}", flush=True)


def main():
    for A in (160_000, 640_000, 1_280_000):
        xla_gather(A, 24)
    for W in (8, 128):
        xla_gather(640_000, W)
    pallas_gather(640_000, 24, table_bf16=False)
    pallas_gather(640_000, 24, table_bf16=True)


if __name__ == "__main__":
    main()
