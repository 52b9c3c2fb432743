"""Round-3 gather probes, part 3: WHERE do the missing 8 ms go?

Isolated take(tab,[A]) costs 3.1 ms (ab_gather2), in-graph the staging
stage costs 11.4 ms (ab_staging2). Same gather, different consumers —
so probe the staging SUBGRAPH in isolation (jit-arg table + index),
varying only what is materialized and in which layout. Hypothesis under
test: a materialized [A,24] f32 intermediate is lane-padded to [A,128]
by the (8,128) tiled layout, and the pad write+read burns ~5x bandwidth.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

P = 100_000
A = 640_000


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
    dt = min(dts)
    print(f"{name:56s} {dt:7.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    tab24 = jnp.asarray(rng.normal(size=(P + 1, 24)), jnp.float32)
    tab128 = jnp.asarray(rng.normal(size=(P + 1, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, P, A), jnp.int32)
    B = jax.lax.optimization_barrier

    timed("a) sum(take(tab24))                       [no mat]",
          lambda t, i: jnp.take(t, i, axis=0), (tab24, idx))
    timed("b) sum(barrier(take(tab24)))              [A,24] mat",
          lambda t, i: B(jnp.take(t, i, axis=0)), (tab24, idx))
    timed("c) gather->T->barrier                     [A/128,24,128] mat",
          lambda t, i: B(jnp.take(t, i, axis=0)
                         .reshape(-1, 128, 24).transpose(0, 2, 1)),
          (tab24, idx))
    timed("d) gather->barrier->T->barrier            (shipped pattern)",
          lambda t, i: B(B(jnp.take(t, i, axis=0))
                         .reshape(-1, 128, 24).transpose(0, 2, 1)),
          (tab24, idx))
    timed("e) take(tab128)->barrier                  [A,128] mat",
          lambda t, i: B(jnp.take(t, i, axis=0)), (tab128, idx))
    timed("f) take(tab128)->reshape->T->barrier      [A/128,128,128]",
          lambda t, i: B(jnp.take(t, i, axis=0)
                         .reshape(-1, 128, 128).transpose(0, 2, 1)),
          (tab128, idx))
    # g) gather in 128-col space, slice AFTER transpose: pay3-compatible
    #    [A/128, 24, 128] without ever touching a 24-wide lane dim
    timed("g) take(tab128)->reshape->T->slice24->barrier",
          lambda t, i: B(jnp.take(t, i, axis=0)
                         .reshape(-1, 128, 128).transpose(0, 2, 1)
                         [:, :24, :]),
          (tab128, idx))


if __name__ == "__main__":
    main()
