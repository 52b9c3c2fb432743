"""Device probe: where do the DiT's non-attention seconds go?

The B=2 step is 6.019 s; attention accounts for ~3.37 s (42 x 2 x
40.2 ms measured, ab_attention8). The rest is dense + elementwise.
This measures, at the real shape ([2, 17776, 3072] bf16, 8-layer
stacks, scan-chained):

  A. the MLP chain fc1 -> gelu(tanh) -> fc2 (225 TFLOP at B=2 across
     the model — the largest dense line; MFU here decides whether a
     fusion pass is worth anything)
  B. the QKV+to_out projections (sanity vs ab_qkv_fused's 87%)
  C. the modulation skeleton (LayerNormZero x2 + gated residuals x2,
     attention/ff replaced by identity) — the adaLN lever's ceiling

Run: nohup python experiments/ab_mlp.py > /tmp/ab_mlp.log 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

B, T, HID, MLP, TXT = 2, 17776, 3072, 12288, 226
L = 8
PEAK = 197e12


def bench(tag, fn, args, flops, n=6):
    def body(*a):
        def step(carry, _):
            out = fn(a[0] + carry.astype(a[0].dtype) * 0, *a[1:])
            return jnp.sum(out.astype(jnp.float32)), None
        return jax.lax.scan(step, jnp.zeros(()), None, length=n)[0]

    jfn = jax.jit(body)
    float(jfn(*args))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(*args))
        dts.append((time.perf_counter() - t0) / n)
    dt = min(dts)
    mfu = flops / dt / PEAK * 100 if flops else 0.0
    print(f"{tag:44s}: {dt*1e3:7.2f} ms  {mfu:5.1f}% MFU", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, HID)) * 0.1, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(L, HID, MLP)) * 0.02, jnp.bfloat16)
    b1 = jnp.zeros((L, MLP), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(L, MLP, HID)) * 0.02, jnp.bfloat16)
    b2 = jnp.zeros((L, HID), jnp.bfloat16)

    def mlp(x, w1, b1, w2, b2):
        for i in range(L):
            h = jnp.dot(x, w1[i], preferred_element_type=jnp.float32)
            h = (h + b1[i]).astype(jnp.bfloat16)
            h = jax.nn.gelu(h, approximate=True)
            x = (jnp.dot(h, w2[i], preferred_element_type=jnp.float32)
                 + b2[i]).astype(jnp.bfloat16)
        return x

    flops_mlp = L * B * 2 * 2 * T * HID * MLP
    bench("A: fc1+gelu+fc2 x8", mlp, (x, w1, b1, w2, b2), flops_mlp)

    wq = jnp.asarray(rng.normal(size=(L, HID, 3 * HID)) * 0.02, jnp.bfloat16)
    wo = jnp.asarray(rng.normal(size=(L, HID, HID)) * 0.02, jnp.bfloat16)

    def proj(x, wq, wo):
        for i in range(L):
            y = jnp.dot(x, wq[i], preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
            x = jnp.dot(y[..., :HID], wo[i],
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        return x

    flops_proj = L * B * 2 * T * HID * (3 * HID + HID)
    bench("B: qkv+to_out x8", proj, (x, wq, wo), flops_proj)

    temb = jnp.asarray(rng.normal(size=(B, 512)) * 0.1, jnp.bfloat16)
    wm = jnp.asarray(rng.normal(size=(L, 2, 512, 6 * HID)) * 0.02,
                     jnp.bfloat16)

    def skeleton(x, temb, wm):
        Tt = TXT
        for i in range(L):
            for j in range(2):
                emb = jnp.dot(jax.nn.silu(temb), wm[i, j],
                              preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)
                sh, sc, g, tsh, tsc, tg = jnp.split(emb, 6, -1)
                mu = jnp.mean(x.astype(jnp.float32), -1, keepdims=True)
                var = jnp.var(x.astype(jnp.float32), -1, keepdims=True)
                n = ((x - mu) * jax.lax.rsqrt(var + 1e-5)).astype(
                    jnp.bfloat16)
                nt = n[:, :Tt] * (1 + tsc[:, None]) + tsh[:, None]
                nv = n[:, Tt:] * (1 + sc[:, None]) + sh[:, None]
                y = jnp.concatenate([nt, nv], axis=1)   # "attn/ff" = id
                x = x + jnp.concatenate(
                    [tg[:, None] * y[:, :Tt], g[:, None] * y[:, Tt:]],
                    axis=1)
        return x

    dt = bench("C: modulation skeleton x8 (2 LNZ + gates)", skeleton,
               (x, temb, wm), 0)
    print(f"   -> full-model modulation cost ~ {dt * 42 / L * 1e3:.0f} ms "
          f"of the 6019 ms B=2 step", flush=True)


if __name__ == "__main__":
    main()
