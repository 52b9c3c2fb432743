"""Device probe 2: the REAL modulation path cost (ab_mlp's skeleton C
used 2-pass jnp.var; the model uses nn.LayerNorm with
use_fast_variance=True, which is single-pass). Variants at
[2, 17776, 3072] bf16, 8 layers x 2 units:

  D. the model's literal LayerNormZero + gated-residual code
  E. hand-fused: f32 single-pass stats + one normalize/modulate pass,
     gates folded into one concat pass

Run: nohup python experiments/ab_mlp2.py > /tmp/ab_mlp2.log 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

B, T, HID, TXT = 2, 17776, 3072, 226
L = 8


def bench(tag, fn, args, n=6):
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
    print(f"{tag:46s}: {dt*1e3:7.2f} ms "
          f"(~{dt*42/L*1e3:4.0f} ms full model)", flush=True)
    return dt


class UnitD(nn.Module):
    @nn.compact
    def __call__(self, x, temb):
        from langscenex_tpu.models.cogvideox.transformer import LayerNormZero
        Tt = TXT
        for i in range(L):
            for j in range(2):
                n_, g, tg = LayerNormZero(HID, Tt,
                                          name=f"lnz_{i}_{j}")(x, temb)
                y = n_                                  # attn/ff = identity
                x = x + jnp.concatenate(
                    [tg * y[:, :Tt], g * y[:, Tt:]], axis=1)
        return x


class UnitE(nn.Module):
    @nn.compact
    def __call__(self, x, temb):
        Tt = TXT
        for i in range(L):
            for j in range(2):
                emb = nn.Dense(6 * HID, name=f"lin_{i}_{j}")(
                    nn.silu(temb))
                sh, sc, g, tsh, tsc, tg = jnp.split(emb, 6, -1)
                gamma = self.param(f"g_{i}_{j}", nn.initializers.ones,
                                   (HID,))
                beta = self.param(f"b_{i}_{j}", nn.initializers.zeros,
                                  (HID,))
                xf = x.astype(jnp.float32)
                s1 = jnp.mean(xf, -1, keepdims=True)
                s2 = jnp.mean(xf * xf, -1, keepdims=True)
                inv = jax.lax.rsqrt(jnp.maximum(s2 - s1 * s1, 0.0) + 1e-5)
                nb = ((xf - s1) * inv).astype(x.dtype) * gamma + beta
                nt = nb[:, :Tt] * (1 + tsc[:, None]) + tsh[:, None]
                nv = nb[:, Tt:] * (1 + sc[:, None]) + sh[:, None]
                y = jnp.concatenate([nt, nv], axis=1)
                x = x + jnp.concatenate(
                    [tg[:, None] * y[:, :Tt], g[:, None] * y[:, Tt:]],
                    axis=1)
        return x


def main():
    if "--f" in sys.argv:
        return
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, HID)) * 0.1, jnp.bfloat16)
    temb = jnp.asarray(rng.normal(size=(B, 512)) * 0.1, jnp.bfloat16)
    for tag, cls in (("D: model LayerNormZero path", UnitD),
                     ("E: hand-fused single-pass", UnitE)):
        m = cls()
        p = m.init(jax.random.PRNGKey(0), x, temb)
        bench(tag, lambda xx, pp: m.apply(pp, xx, temb), (x, p))


if __name__ == "__main__":
    main()


class UnitF(nn.Module):
    """Accumulation-dtype hints instead of a materialized f32 copy."""
    @nn.compact
    def __call__(self, x, temb):
        Tt = TXT
        for i in range(L):
            for j in range(2):
                emb = nn.Dense(6 * HID, name=f"lin_{i}_{j}")(nn.silu(temb))
                sh, sc, g, tsh, tsc, tg = jnp.split(emb, 6, -1)
                gamma = self.param(f"g_{i}_{j}", nn.initializers.ones,
                                   (HID,))
                beta = self.param(f"b_{i}_{j}", nn.initializers.zeros,
                                  (HID,))
                s1 = jnp.mean(x, -1, keepdims=True, dtype=jnp.float32)
                s2 = jnp.mean(jnp.square(x), -1, keepdims=True,
                              dtype=jnp.float32)
                inv = jax.lax.rsqrt(jnp.maximum(s2 - s1 * s1, 0.0) + 1e-5)
                nb = ((x.astype(jnp.float32) - s1) * inv).astype(x.dtype) \
                    * gamma + beta
                nt = nb[:, :Tt] * (1 + tsc[:, None]) + tsh[:, None]
                nv = nb[:, Tt:] * (1 + sc[:, None]) + sh[:, None]
                y = jnp.concatenate([nt, nv], axis=1)
                x = x + jnp.concatenate(
                    [tg[:, None] * y[:, :Tt], g[:, None] * y[:, Tt:]],
                    axis=1)
        return x


def main3():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, HID)) * 0.1, jnp.bfloat16)
    temb = jnp.asarray(rng.normal(size=(B, 512)) * 0.1, jnp.bfloat16)
    for tag, cls in (("F: dtype-hint stats", UnitF),):
        m = cls()
        p = m.init(jax.random.PRNGKey(0), x, temb)
        bench(tag, lambda xx, pp: m.apply(pp, xx, temb), (x, p))


if __name__ == "__main__" and "--f" in sys.argv:
    main3()
