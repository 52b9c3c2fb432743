import json, time, sys
import jax, jax.numpy as jnp
from __graft_entry__ import entry

fn, args = entry()

def run(n):
    def step(carry, _):
        a0 = args[0] + carry * 1e-30
        out = fn(a0, *args[1:])
        return jnp.sum(out[0]), None
    jfn = jax.jit(lambda: jax.lax.scan(step, jnp.zeros(()), None, length=n)[0])
    float(jfn())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn())
        ts.append((time.perf_counter() - t0) / n * 1e3)
    print(f"n={n}: per-iter ms = {[round(t,2) for t in ts]}")

run(20)
run(100)
