"""Attention kernel A/B at the DiT shape: 48 heads x 17776 tokens x D=64."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from langscenex_tpu.ops.flash_attention import (flash_attention,
                                                flash_attention_h2)

B, H, T, D = 1, 48, 17776, 64
FLOPS = 4.0 * B * H * T * T * D          # QK^T + PV, 2 MAC each
PEAK = 197e12                            # v5e bf16


def timed(name, fn, n=8):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.bfloat16)

    try:
        def body(qq, kk, vv):
            def step(carry, _):
                out = fn(qq + carry.astype(jnp.bfloat16) * 0, kk, vv)
                return jnp.sum(out[:, :, 0, :]).astype(jnp.float32), None
            return jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                None, length=n)[0]
        jfn = jax.jit(body)
        float(jfn(q, k, v))
        t0 = time.perf_counter()
        float(jfn(q, k, v))
        dt = (time.perf_counter() - t0) / n
        mfu = FLOPS / dt / PEAK
        print(f"{name:34s} {dt*1e3:8.2f} ms   MFU {mfu*100:5.1f}%",
              flush=True)
    except Exception as e:
        print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)


timed("flash 1024x1024 (current)", lambda q, k, v: flash_attention(q, k, v))
timed("h2-packed bq1024 bk512",
      lambda q, k, v: flash_attention_h2(q, k, v))
timed("h2-packed bq512 bk512",
      lambda q, k, v: flash_attention_h2(q, k, v, block_q=512))
timed("h2-packed bq1024 bk1024",
      lambda q, k, v: flash_attention_h2(q, k, v, block_k=1024))
