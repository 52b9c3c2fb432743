"""Full-shape LoRA fine-tune step at (data=1, model=2): compiled
per-shard memory analysis (VERDICT r4 item 2).

Round 4 measured the single-chip wall: the B=1, 13-frame (17.8k-token),
rank-16 LoRA step demands 17.16 GB vs 15.75 GB usable HBM (11.1 GB bf16
base + 42 x 110 MB remat boundaries). The published resolution — "TP=2
halves both terms and fits" — was arithmetic. This script turns it into
a compiled artifact: jit(lora_step).lower(...).compile()
.memory_analysis() on a (data=1, model=2) virtual mesh with explicit
megatron-style shardings (to_qkv/fc1 column-parallel, to_out/fc2
row-parallel — the per-head-interleaved fused QKV layout makes the
column split whole-head-aligned, KERNELS.md §15), printing the actual
per-shard bytes.

Backend: AOT compile-only against a REAL v5e TPU topology
(jax.experimental.topologies.get_topology_desc("v5e:2x2")) — no
hardware touched, but the buffer assignment, remat scheduling and
per-shard HBM accounting are the production TPU compiler's, not a CPU
approximation (the CPU virtual-mesh variant was measured reporting
2.7 TB of temps: XLA:CPU does no TPU-style buffer liveness and is
unusable as memory evidence). Run: python experiments/lora_tp2_memory.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from langscenex_tpu.models.cogvideox.transformer import (
    CogVideoXTransformer, TransformerConfig)
from langscenex_tpu.parallel.mesh import DIT_LOGICAL_RULES
from langscenex_tpu.train.dit import DiTTrainConfig
from langscenex_tpu.train.lora import LoRAConfig, make_lora_train_step

F, C, Hl, Wl, TXT = 13, 16, 60, 90, 226
HBM_USABLE = 15.75e9            # measured v5e usable (KERNELS §6b)

COL = ("to_qkv", "to_q", "to_k", "to_v", "fc1")   # column-parallel
ROW = ("to_out", "fc2")                           # row-parallel


def spec_for(pathstr: str, ndim: int) -> P:
    col = any(s in pathstr for s in COL)
    row = any(s in pathstr for s in ROW)
    leaf = pathstr.rsplit("/", 1)[-1]
    if leaf == "kernel" and col:
        return P(None, "model")
    if leaf == "kernel" and row:
        return P("model", None)
    if leaf == "bias" and col and ndim == 1:
        return P("model")
    if leaf == "a" and row:
        return P("model", None)
    if leaf == "b" and col:
        return P(None, "model")
    return P()


def path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def shard_tree(shapes, mesh):
    def place(path, s):
        spec = spec_for(path_str(path), len(s.shape))
        return jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(place, shapes)


def main():
    from jax.experimental import topologies
    topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    devs = topo.devices
    assert len(devs) >= 2, devs
    mesh = Mesh(np.asarray(devs[:2]).reshape(1, 2), ("data", "model"))

    cfg = TransformerConfig(remat=True)
    model = CogVideoXTransformer(cfg)
    lat = jax.ShapeDtypeStruct((1, F, 2 * C, Hl, Wl), jnp.bfloat16)
    txt = jax.ShapeDtypeStruct((1, TXT, cfg.text_embed_dim), jnp.bfloat16)
    base_shapes = jax.eval_shape(
        lambda l, x: model.init(jax.random.PRNGKey(0), l, x,
                                jnp.zeros((1,), jnp.int32)), lat, txt
    )["params"]
    base_shapes = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16), base_shapes)
    n = sum(int(np.prod(s.shape))
            for s in jax.tree_util.tree_leaves(base_shapes))
    print(f"base params {n/1e9:.2f}B bf16 = {2*n/1e9:.2f} GB replicated",
          flush=True)

    tcfg = DiTTrainConfig(lr=1e-4, total_steps=100, warmup_steps=10)
    lcfg = LoRAConfig(rank=16)
    init_state, step = make_lora_train_step(model, base_shapes, tcfg, lcfg)
    state_shapes = jax.eval_shape(init_state, jax.random.PRNGKey(1))

    batch_shapes = {
        "x0": jax.ShapeDtypeStruct((1, F, C, Hl, Wl), jnp.bfloat16),
        "cond": jax.ShapeDtypeStruct((1, F, C, Hl, Wl), jnp.bfloat16),
        "text": jax.ShapeDtypeStruct((1, TXT, cfg.text_embed_dim),
                                     jnp.bfloat16),
    }

    base_s = shard_tree(base_shapes, mesh)
    state_s = shard_tree(state_shapes, mesh)
    batch_s = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, P())),
        batch_shapes)
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32,
                               sharding=NamedSharding(mesh, P()))

    # sanity: the base tree per-shard halves on the TP'd kernels
    per_shard = 0
    for path, s in jax.tree_util.tree_leaves_with_path(base_s):
        spec = spec_for(path_str(path), len(s.shape))
        frac = 0.5 if any(a == "model" for a in spec if a) else 1.0
        per_shard += int(np.prod(s.shape)) * 2 * frac
    print(f"base tree per shard (analytic): {per_shard/1e9:.2f} GB",
          flush=True)

    print("lowering + AOT-compiling for the v5e topology "
          "(42-layer remat graph)...", flush=True)
    from langscenex_tpu.ops.flash_attention import tensor_parallel
    with mesh, nn.logical_axis_rules(DIT_LOGICAL_RULES), \
            tensor_parallel(mesh, "model"):
        lowered = jax.jit(step).lower(state_s, batch_s, rng, base_s)
        compiled = lowered.compile()
    ma = compiled.memory_analysis()
    arg = ma.argument_size_in_bytes
    out = ma.output_size_in_bytes
    tmp = ma.temp_size_in_bytes
    alias = ma.alias_size_in_bytes
    peak = arg + out + tmp - alias
    print(f"per-shard memory_analysis:", flush=True)
    print(f"  arguments : {arg/1e9:7.2f} GB", flush=True)
    print(f"  outputs   : {out/1e9:7.2f} GB", flush=True)
    print(f"  temps     : {tmp/1e9:7.2f} GB", flush=True)
    print(f"  aliased   : {alias/1e9:7.2f} GB", flush=True)
    print(f"  peak (arg+out+temp-alias): {peak/1e9:.2f} GB "
          f"vs {HBM_USABLE/1e9:.2f} GB usable -> "
          f"{'FITS' if peak < HBM_USABLE else 'DOES NOT FIT'}", flush=True)


if __name__ == "__main__":
    main()
