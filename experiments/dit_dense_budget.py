"""Split the DiT denoise-step budget: full step vs attention stubbed.

Stubbing attention (out = v) keeps every projection, LN, rope, adaLN and
residual pass; the difference to the full step is the flash-kernel cost
(+ its staging). Run AFTER any transformer-graph change to re-attribute.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import langscenex_tpu.ops.flash_attention as fa
from langscenex_tpu.models.cogvideox.transformer import (
    CogVideoXTransformer, TransformerConfig)

cfg = TransformerConfig()
model = CogVideoXTransformer(cfg)
F, C, Hl, Wl, TXT = 13, 16, 60, 90, 226
rng = np.random.default_rng(0)


def init_bf16():
    lat = jax.ShapeDtypeStruct((1, F, 2 * C, Hl, Wl), jnp.bfloat16)
    txt = jax.ShapeDtypeStruct((1, TXT, cfg.text_embed_dim), jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda l, x: model.init(jax.random.PRNGKey(0), l, x,
                                jnp.zeros((1,), jnp.int32)), lat, txt)
    dev = jax.devices()[0]
    return jax.tree_util.tree_map(
        lambda s: jax.device_put(jnp.zeros(s.shape, jnp.bfloat16), dev),
        shapes)


def bench(params, B, n=3, tag=""):
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
    print(f"{tag} B={B}: {dt:.3f} s/denoise fwd", flush=True)
    return dt


if __name__ == "__main__":
    params = init_bf16()
    full = bench(params, 1, tag="full")
    orig = fa.attention_auto
    stub_traced = []
    try:
        fa.attention_auto = lambda q, k, v, **kw: (stub_traced.append(1), v)[1]
        stub = bench(params, 1, tag="attn-stubbed")
    finally:
        fa.attention_auto = orig
    # transformer.attention imports attention_auto lazily at trace time;
    # if that import is ever hoisted to module level the monkeypatch
    # silently becomes a no-op and this run times the FULL model under
    # the 'attn-stubbed' tag. Fail loudly instead of mis-attributing.
    assert stub_traced, (
        "attention stub was never traced — transformer.attention no longer "
        "resolves flash_attention.attention_auto lazily; budget invalid")
    print(f"attention(+staging): {full - stub:.3f} s "
          f"({(full - stub) / cfg.num_layers * 1e3:.1f} ms/layer); "
          f"dense/other: {stub:.3f} s", flush=True)
