"""Why is a pipeline denoise step ~17 s when the bare DiT forward is
~6.1 s (B=2)? One process, three measurements at the full 5.57B scale
(zero bf16 weights staged via eval_shape, timing-equivalent):

  A. bare DiT forward, B=2, 2-step fetch-chained scan (bench.py's
     bench_dit shape — the 6.15 s/step reference point),
  B. denoise_chunk (the real pipeline scan body: CFG concat + cond +
     scheduler) over 2 steps, same fetch discipline,
  C. B with donated (latents, cache) carry — tests whether carry
     aliasing releases enough arena for XLA to pick the fast schedule.

If B >> A the overhead is in the step body / its compilation context
(e.g. HBM-pressure-driven scheduling), not the tunnel or the chunking.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3400 \
       python experiments/chunk_step_ab.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from langscenex_tpu.models.cogvideox.transformer import (
    CogVideoXTransformer, TransformerConfig)
from langscenex_tpu.models.cogvideox.pipeline import (PipelineConfig,
                                                      denoise_chunk,
                                                      schedule_arrays)
from langscenex_tpu.models.cogvideox.scheduler import DDIMScheduler

F, C, Hl, Wl, TXT = 13, 16, 60, 90, 226
N = 2     # steps per timed execution


def stage_params(model):
    lat_s = jax.ShapeDtypeStruct((1, F, 2 * C, Hl, Wl), jnp.bfloat16)
    txt_s = jax.ShapeDtypeStruct((1, TXT, 4096), jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda l, x: model.init(jax.random.PRNGKey(0), l, x,
                                jnp.zeros((1,), jnp.int32)), lat_s, txt_s)
    dev = jax.devices()[0]
    return jax.tree_util.tree_map(
        lambda s: jax.device_put(jnp.zeros(s.shape, jnp.bfloat16), dev),
        shapes)


def timed(tag, fn, argfn, reps=2):
    """argfn() -> fresh argument tuple (donation-safe)."""
    t0 = time.perf_counter()
    out = fn(*argfn())
    jax.block_until_ready(out)
    print(f"{tag}: first (incl compile) {time.perf_counter() - t0:.1f}s",
          flush=True)
    dts = []
    for _ in range(reps):
        a = argfn()
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    print(f"{tag}: {dt:.2f}s / {N} steps = {dt / N:.2f} s/step", flush=True)
    return dt


def main():
    cfg = TransformerConfig()
    model = CogVideoXTransformer(cfg)
    params = stage_params(model)
    rng = np.random.default_rng(0)
    lat2 = jnp.asarray(rng.normal(size=(2, F, 2 * C, Hl, Wl)), jnp.bfloat16)
    txt2 = jnp.asarray(rng.normal(size=(2, TXT, 4096)), jnp.bfloat16)
    t2 = jnp.full((2,), 500, jnp.int32)

    # ---- A: bare DiT forward ----------------------------------------
    def bare(p, l, x, tt):
        def step(carry, _):
            out = model.apply(p, l + carry.astype(jnp.bfloat16) * 0, x, tt)
            return jnp.sum(out[:, 0, 0, 0, 0]).astype(jnp.float32), None
        return jax.lax.scan(step, jnp.zeros((), jnp.float32),
                            None, length=N)[0]

    timed("A bare DiT fwd B=2", jax.jit(bare),
          lambda: (params, lat2, txt2, t2))

    # ---- B: real pipeline chunk -------------------------------------
    pcfg = PipelineConfig(num_inference_steps=50, loop_chunk=N)
    sched = DDIMScheduler()
    ts, ts_prev, compute = schedule_arrays(sched, pcfg)
    lat1 = jnp.asarray(rng.normal(size=(1, F, C, Hl, Wl)), jnp.float32)
    img1 = jnp.asarray(rng.normal(size=(1, F, C, Hl, Wl)), jnp.float32)
    txt1c = txt2[:1].astype(jnp.float32)
    txt1u = txt2[1:].astype(jnp.float32)
    denoiser = lambda p, l, x, tt: model.apply(
        p, l.astype(jnp.bfloat16), x.astype(jnp.bfloat16), tt)

    def chunk(p, lat, cache, img, tc, tu):
        return denoise_chunk(lambda *a: denoiser(p, *a), lat, cache, img,
                             tc, tu, ts[:N], ts_prev[:N], compute[:N],
                             jnp.ones((N,), bool), sched, pcfg)

    timed("B pipeline chunk", jax.jit(chunk),
          lambda: (params, lat1, jnp.zeros_like(lat1), img1, txt1c, txt1u))

    # ---- C: donated carry -------------------------------------------
    timed("C chunk donated carry",
          jax.jit(chunk, donate_argnums=(1, 2)),
          lambda: (params, lat1 + 0, jnp.zeros_like(lat1), img1,
                   txt1c, txt1u))

    print("done", flush=True)


if __name__ == "__main__":
    main()
