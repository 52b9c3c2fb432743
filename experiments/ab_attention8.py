"""A/B (device): bounded-forward attention variants at the DiT shape.

VERDICT r4 item 4 names the attention forward (48.0% MFU, VPU exp2
chain) as DiT lever (a). Candidates never device-measured:
  - split_kv (t2 kernel): body splits each kv block so half B's sT
    matmul (MXU) overlaps half A's exp2 (VPU) — explicit ILP;
  - wider q blocks (4096) — fewer kv re-streams per flop;
  - wider kv blocks (2048) — fewer grid steps.

Shape: [1, 48, 17776, 64] bf16 (the 5.57B DiT per-layer attention).
MFU = 4*T^2*D*H*B FLOP over v5e 197 TFLOP/s peak.

Run: nohup python experiments/ab_attention8.py > /tmp/ab_attn8.log 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from langscenex_tpu.ops.flash_attention import flash_attention_nt

B, H, T, D = 1, 48, 17776, 64
PEAK = 197e12


def bench(tag, fn, q, k, v, ref=None, n=10):
    def body(q, k, v):
        def step(carry, _):
            out = fn(q + carry.astype(q.dtype) * 0, k, v)
            return jnp.sum(out.astype(jnp.float32)), None
        return jax.lax.scan(step, jnp.zeros(()), None, length=n)[0]

    jfn = jax.jit(body)
    float(jfn(q, k, v))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(q, k, v))
        dts.append((time.perf_counter() - t0) / n)
    dt = min(dts)
    flops = 4 * T * T * D * H * B
    out = jax.jit(fn)(q, k, v)
    bit = ""
    if ref is not None:
        bit = f" bit={np.array_equal(np.asarray(out), np.asarray(ref))}"
    print(f"{tag:40s}: {dt*1e3:6.2f} ms  {flops/dt/PEAK*100:5.1f}% MFU{bit}",
          flush=True)
    return dt, out


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, T, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, T, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.bfloat16)

    def mk(bq, bk, split):
        return lambda q, k, v: flash_attention_nt(
            q, k, v, block_q=bq, block_k=bk, split_kv=split)

    _, ref = bench("A: nt bq=2048 bk=1024 (default)", mk(2048, 1024, False),
                   q, k, v)
    for tag, bq, bk, sp in (
            ("B: + split_kv (t2)", 2048, 1024, True),
            ("C: bq=4096", 4096, 1024, False),
            ("D: bq=4096 + split_kv", 4096, 1024, True),
            ("E: bq=2048 bk=2048", 2048, 2048, False),
            ("F: bq=2048 bk=2048 + split_kv", 2048, 2048, True),
            ("G: bq=4096 bk=2048 + split_kv", 4096, 2048, True),
            ("H: bq=8192 bk=1024", 8192, 1024, False),
    ):
        try:
            bench(tag, mk(bq, bk, sp), q, k, v, ref=ref)
        except Exception as e:
            print(f"{tag:40s}: FAIL {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__" and "--dual" not in sys.argv:
    main()


def main2():
    """Follow-up: dual-accumulator t3 variants (run with 'dual')."""
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, T, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, T, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.bfloat16)

    def mk(bq, bk, split):
        return lambda q, k, v: flash_attention_nt(
            q, k, v, block_q=bq, block_k=bk, split_kv=split)

    _, ref = bench("A: nt bq=2048 bk=1024 (default)", mk(2048, 1024, False),
                   q, k, v)
    for tag, bq, bk, sp in (
            ("I: bk=2048 dual-acc", 2048, 2048, "dual"),
            ("J: bk=4096 dual-acc", 2048, 4096, "dual"),
            ("K: bk=1024 dual-acc (nsub=2 halves)", 2048, 1024, "dual"),
    ):
        try:
            bench(tag, mk(bq, bk, sp), q, k, v, ref=ref)
        except Exception as e:
            print(f"{tag:40s}: FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__" and "--dual" in sys.argv:
    main2()
