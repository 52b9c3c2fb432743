"""Benchmark: 3DGS full-channel render FPS on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); vs_baseline is the ratio
against a nominal 100 FPS for the reference CUDA rasterizer on A100 at the
same scene scale (100k splats, 720x480, RGB+language+instance channels) —
a conservative published-community figure for full-featured language-field
rasterizers, documented here until a measured A100 baseline exists.

Timing fetches a scalar reduction every iteration: block_until_ready has
been observed to return before remote execution completes on the tunneled
axon backend, so only a data dependency gives trustworthy timings.
"""
import json
import time

A100_NOMINAL_FPS = 100.0


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import entry

    fn, args = entry()
    jfn = jax.jit(lambda *a: jnp.sum(fn(*a)[0]))
    s = float(jfn(*args))   # compile + warm

    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        s = float(jfn(*args))
    dt = (time.perf_counter() - t0) / n
    fps = 1.0 / dt
    print(json.dumps({
        "metric": "3dgs_render_fps_100k_720x480",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / A100_NOMINAL_FPS, 3),
    }))


if __name__ == "__main__":
    main()
