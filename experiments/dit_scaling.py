"""DiT denoise-step scaling table on the virtual 8-device CPU mesh.

Relative scaling of the (data, model) shardings for the CFG denoise step
(absolute times are CPU-meaningless; the table demonstrates the sharding
configurations compile + execute and how work divides).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import time

import jax

jax.config.update("jax_platforms", "cpu")
import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from langscenex_tpu.models.cogvideox.transformer import (
    CogVideoXTransformer, TransformerConfig)
from langscenex_tpu.parallel.mesh import (DIT_LOGICAL_RULES, make_mesh,
                                          shard_batch_tree)

CFG = TransformerConfig(num_layers=4, num_heads=8, head_dim=32,
                        in_channels=16, out_channels=8, patch_size=2,
                        text_embed_dim=64, time_embed_dim=64,
                        attn_dtype=jnp.float32)
F, C, H, W = 4, 8, 16, 24
TXT = 16


def bench(n_data, n_model, B):
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    model = CogVideoXTransformer(CFG)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(B, F, 2 * C, H, W)), jnp.float32)
    txt = jnp.asarray(rng.normal(size=(B, TXT, 64)), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    with mesh, nn.logical_axis_rules(DIT_LOGICAL_RULES):
        params = model.init(jax.random.PRNGKey(0), lat, txt, t)
        lat_s = shard_batch_tree(lat, mesh)
        txt_s = shard_batch_tree(txt, mesh)
        t_s = shard_batch_tree(t, mesh)
        f = jax.jit(lambda p, l, x, tt: model.apply(p, l, x, tt))
        out = f(params, lat_s, txt_s, t_s)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(params, lat_s, txt_s, t_s)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 5
    print(f"data={n_data} model={n_model} B={B}: {dt*1e3:8.1f} ms/step",
          flush=True)
    return dt


if __name__ == "__main__":
    base = bench(1, 1, 1)       # single-device reference
    for nd, nm in ((8, 1), (4, 2), (2, 4), (1, 8)):
        dt = bench(nd, nm, nd)  # DP batch = n_data
        speedup = (nd / dt) / (1.0 / base)
        print(f"  -> samples/sec speedup vs 1 device: {speedup:5.2f}x "
              f"(ideal 8.00x)", flush=True)
