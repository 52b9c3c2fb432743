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


def _tpu_reachable(timeout_s: float = 120.0) -> bool:
    """Probe the axon tunnel in a SUBPROCESS with a hard timeout.

    The relay has been observed to wedge (jax.devices() then hangs
    forever in make_c_api_client); probing in-process would hang this
    bench with it. A killed PROBE subprocess is safe — it never opens a
    data-plane transfer, only the connect."""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "assert d[0].platform != 'cpu'; print('ok')"],
            timeout=timeout_s, capture_output=True, text=True)
        return r.returncode == 0 and "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    import os

    platform = "tpu"
    if not _tpu_reachable():
        # honest degradation: report CPU numbers, clearly labeled, rather
        # than hanging forever on a wedged relay
        platform = "cpu"
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from __graft_entry__ import entry

    fn, args = entry()

    # Chain iterations through a scalar data dependency so the device
    # executes them sequentially with ONE final fetch: per-iteration
    # host fetches add ~25ms tunnel RTT each, and unfetched dispatches
    # have been observed to report phantom sub-ms times. Inputs are jit
    # ARGUMENTS, not closed-over constants — constants are embedded in
    # the remote-compile request (slow upload; HTTP 413 at larger sizes).
    n = 20

    def body(*a):
        def step(carry, _):
            out = fn(a[0] + carry * 1e-30, *a[1:])
            return jnp.sum(out[0]), None
        return jax.lax.scan(step, jnp.zeros(()), None, length=n)[0]

    jfn = jax.jit(body)
    s = float(jfn(*args))        # compile + warm
    dts = []
    for _ in range(3):           # min over reps: tunnel fetch jitter is
        t0 = time.perf_counter()  # one-sided noise on top of device time
        s = float(jfn(*args))
        dts.append((time.perf_counter() - t0) / n)
    dt = min(dts)
    fps = 1.0 / dt
    rec = {
        "metric": "3dgs_render_fps_100k_720x480",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / A100_NOMINAL_FPS, 3),
    }
    if platform != "tpu":
        rec["platform_fallback"] = "cpu (TPU tunnel unreachable)"
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
