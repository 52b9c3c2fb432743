"""A/B: transposed-accumulator no-max kernel (flash_attention_nt) vs the
round-2 best (flash_attention bounded_logits=True) at the DiT shape.

Hypothesis (flash_attention.py::_attn_kernel_nomax_t docstring): at D=64
the PV matmul pads its output width 65->128, wasting half the MXU; the
transposed form streams D+1 rows instead (M doesn't pad), so PV cost
should halve. Expected ~62 -> ~45 ms if the model holds.

Run on a free chip:  timeout 1200 python experiments/ab_attention5.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from langscenex_tpu.ops.flash_attention import (flash_attention,
                                                flash_attention_nt)

B, H, T, D = 1, 48, 17776, 64
PEAK = 197e12
FLOPS_FWD = 4.0 * B * H * T * T * D


def chain(fn, n, *args):
    def body(*a):
        def step(carry, _):
            out = fn(a[0] + carry.astype(a[0].dtype) * 0, *a[1:])
            outs = out if isinstance(out, tuple) else (out,)
            dep = sum(jnp.sum(o[..., 0, :]) for o in outs)
            return dep.astype(jnp.float32), None
        return jax.lax.scan(step, jnp.zeros((), jnp.float32),
                            None, length=n)[0]
    jfn = jax.jit(body)
    float(jfn(*args))
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        float(jfn(*args))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.bfloat16)

    cases = [
        ("nomax (r2 best)", lambda q, k, v: flash_attention(
            q, k, v, bounded_logits=True)),
        ("nt bq1024 bk1024", lambda q, k, v: flash_attention_nt(
            q, k, v, block_q=1024, block_k=1024)),
        ("nt bq2048 bk1024", lambda q, k, v: flash_attention_nt(
            q, k, v, block_q=2048, block_k=1024)),
        ("nt bq1024 bk2048", lambda q, k, v: flash_attention_nt(
            q, k, v, block_q=1024, block_k=2048)),
        ("nt bq2048 bk2048", lambda q, k, v: flash_attention_nt(
            q, k, v, block_q=2048, block_k=2048)),
        ("nt bq4096 bk1024", lambda q, k, v: flash_attention_nt(
            q, k, v, block_q=4096, block_k=1024)),
    ]
    for name, fn in cases:
        try:
            dt = chain(fn, 8, q, k, v)
            print(f"fwd {name:18s} {dt*1e3:8.2f} ms  "
                  f"MFU {FLOPS_FWD/dt/PEAK*100:5.1f}%", flush=True)
        except Exception as e:
            print(f"fwd {name:18s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # on-device numerical agreement
    a = flash_attention(q, k, v, bounded_logits=True)
    b = flash_attention_nt(q, k, v)
    d = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                              - b.astype(jnp.float32))))
    print(f"nt vs nomax max abs diff: {d:.2e}", flush=True)


if __name__ == "__main__":
    main()
