"""Measured 5.57B fine-tune step time on ONE chip (VERDICT r2 item 5).

LoRA is the one-chip-feasible fine-tune config: base params ride bf16
(11.1 GB) and the optimizer state covers only the adapters — a FULL
AdamW fine-tune needs 2x f32 moments (+44 GB) and is a multi-chip
sharded job (validated on the virtual mesh, experiments/dit_scaling.py).
Remat is on (per-block) so activations fit at the 17.8k-token sequence.

Run: timeout 4000 python experiments/lora_step_real.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from langscenex_tpu.models.cogvideox.transformer import (
    CogVideoXTransformer, TransformerConfig)
from langscenex_tpu.train.dit import DiTTrainConfig
from langscenex_tpu.train.lora import LoRAConfig, make_lora_train_step

F, C, Hl, Wl, TXT = 13, 16, 60, 90, 226


def main():
    import os
    # FULL-shape finding (2026-08-21, after the merge-free fix): the
    # B=1 F=13 (18k-token) LoRA step compiles to 17.16 G vs 15.75 G
    # HBM — 11.1 G base args + 42 x 110 MB remat block boundaries +
    # workspace. One v5e cannot hold it; TP=2 fits trivially (base and
    # boundaries both halve). LSX_LORA_FRAMES<13 measures the
    # all-params step at a reduced sequence as a labeled supplement.
    F_run = int(os.environ.get("LSX_LORA_FRAMES", F))
    cfg = TransformerConfig(remat=True)
    model = CogVideoXTransformer(cfg)
    lat = jax.ShapeDtypeStruct((1, F_run, 2 * C, Hl, Wl), jnp.bfloat16)
    txt = jax.ShapeDtypeStruct((1, TXT, cfg.text_embed_dim), jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda l, x: model.init(jax.random.PRNGKey(0), l, x,
                                jnp.zeros((1,), jnp.int32)), lat, txt)
    dev = jax.devices()[0]
    base = jax.tree_util.tree_map(
        lambda s: jax.device_put(jnp.zeros(s.shape, jnp.bfloat16), dev),
        shapes)["params"]
    n = sum(x.size for x in jax.tree_util.tree_leaves(base))
    print(f"base params {n/1e9:.2f}B bf16", flush=True)

    tcfg = DiTTrainConfig(lr=1e-4, total_steps=100, warmup_steps=10)
    init_state, step = make_lora_train_step(model, base, tcfg,
                                            LoRAConfig(rank=16))
    state = init_state(jax.random.PRNGKey(1))
    nl = sum(x.size for x in jax.tree_util.tree_leaves(state["lora"]))
    print(f"lora adapters {nl/1e6:.1f}M", flush=True)

    rng = np.random.default_rng(0)
    batch = {
        "x0": jnp.asarray(rng.normal(size=(1, F_run, C, Hl, Wl)), jnp.bfloat16),
        "cond": jnp.asarray(rng.normal(size=(1, F_run, C, Hl, Wl)),
                            jnp.bfloat16),
        "text": jnp.asarray(rng.normal(size=(1, TXT, cfg.text_embed_dim)),
                            jnp.bfloat16),
    }
    # base as a jit ARG: closed-over it lowers as 11.1 GB of constants
    # in the remote-compile request (HTTP-413 class blocker, KERNELS §6b)
    jstep = jax.jit(step, donate_argnums=0)
    key = jax.random.PRNGKey(2)
    t0 = time.perf_counter()
    state, m = jstep(state, batch, key, base)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"loss={float(m['loss']):.4f}", flush=True)
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        state, m = jstep(state, batch, key, base)
        loss = float(m["loss"])                 # fetch = fence
        ts.append(time.perf_counter() - t0)
    print(f"LoRA fine-tune step (B=1, 5.57B, remat, F={F_run}): "
          f"{min(ts):.2f} s/step (loss {loss:.4f})", flush=True)
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        print({k: v for k, v in stats.items() if "bytes" in k}, flush=True)
    except Exception as e:
        print("memory_stats:", e, flush=True)


if __name__ == "__main__":
    main()
