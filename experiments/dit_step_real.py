"""Full-size TriMap DiT denoise-step timing on one chip (B=1 and B=2).

VERDICT r1 target: < 2.9 s at B=1 (was 4.35 s measured with the
constants-in-graph harness).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from langscenex_tpu.models.cogvideox.transformer import (
    CogVideoXTransformer, TransformerConfig)

cfg = TransformerConfig()      # 5.57B default
model = CogVideoXTransformer(cfg)

F, C = 13, 16
Hl, Wl = 60, 90
TXT = 226

rng = np.random.default_rng(0)


def init_bf16():
    # eval_shape gives the tree structure with zero compute; zero bf16
    # leaves are timing-equivalent (the MXU does not skip zeros) and
    # avoid a single-core 5.57B CPU init
    lat = jax.ShapeDtypeStruct((1, F, 2 * C, Hl, Wl), jnp.bfloat16)
    txt = jax.ShapeDtypeStruct((1, TXT, cfg.text_embed_dim), jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda l, x: model.init(jax.random.PRNGKey(0), l, x,
                                jnp.zeros((1,), jnp.int32)), lat, txt)
    dev = jax.devices()[0]
    params = jax.tree_util.tree_map(
        lambda s: jax.device_put(
            jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32
                      else s.dtype), dev), shapes)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n/1e9:.2f}B", flush=True)
    return params


def bench(params, B, n=3):
    lat = jnp.asarray(rng.normal(size=(B, F, 2 * C, Hl, Wl)), jnp.bfloat16)
    txt = jnp.asarray(rng.normal(size=(B, TXT, cfg.text_embed_dim)),
                      jnp.bfloat16)
    t = jnp.full((B,), 500, jnp.int32)

    def body(p, l, x, tt):
        def step(carry, _):
            out = model.apply(p, l + carry.astype(jnp.bfloat16) * 0, x, tt)
            return jnp.sum(out[:, 0, 0, 0, 0]).astype(jnp.float32), None
        return jax.lax.scan(step, jnp.zeros((), jnp.float32),
                            None, length=n)[0]

    jfn = jax.jit(body)
    float(jfn(params, lat, txt, t))
    t0 = time.perf_counter()
    float(jfn(params, lat, txt, t))
    dt = (time.perf_counter() - t0) / n
    print(f"B={B}: {dt:.3f} s/denoise fwd", flush=True)


if __name__ == "__main__":
    params = init_bf16()
    bench(params, 1)
    bench(params, 2)
