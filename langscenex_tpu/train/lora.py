"""Functional LoRA for the DiT fine-tune path.

The reference's CogVideoX fine-tune stack ships datasets/configs but no
train script (SURVEY.md §2.2); train/dit.py provides full fine-tuning
and this module adds the parameter-efficient variant: low-rank adapters
A·B added to selected Dense kernels, with gradients flowing only
through the adapters.

Design is purely functional (fits jit/remat/sharding with no module
surgery): `init_lora` builds a small adapter pytree mirroring the
matched kernels; `merge_lora` returns base params with `W + (α/r)·A·B`
substituted — called inside the loss so autodiff reaches only the
adapter leaves; `export_merged` bakes adapters into a plain checkpoint.
"""
from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 16
    alpha: float = 16.0
    # default: attention projections + MLP, the CogVideoX-style targets
    target_patterns: Tuple[str, ...] = (
        r".*attn/to_q$", r".*attn/to_k$", r".*attn/to_v$",
        r".*attn/to_qkv$",
        r".*attn/to_out$", r".*ff/fc1$", r".*ff/fc2$")
    init_scale: float = 0.01


def _iter_kernels(params: Dict, prefix: str = ""):
    for k, v in params.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            if "kernel" in v and not isinstance(v["kernel"], dict):
                yield path, v
            else:
                yield from _iter_kernels(v, path)


def _matches(path: str, cfg: LoRAConfig) -> bool:
    return any(re.match(p, path) for p in cfg.target_patterns)


def init_lora(params: Dict, cfg: LoRAConfig, rng: jax.Array) -> Dict:
    """Adapter tree {path: {"a": [in,r], "b": [r,out]}} for every Dense
    kernel whose flattened path matches a target pattern. `a` is random
    (scaled), `b` is zero — the adapted model starts EXACTLY at base."""
    lora = {}
    for path, leaf in _iter_kernels(params):
        if not _matches(path, cfg):
            continue
        kin, kout = leaf["kernel"].shape[-2], leaf["kernel"].shape[-1]
        rng, sub = jax.random.split(rng)
        lora[path] = {
            "a": (jax.random.normal(sub, (kin, cfg.rank), jnp.float32)
                  * cfg.init_scale),
            "b": jnp.zeros((cfg.rank, kout), jnp.float32),
        }
    return lora


def merge_lora(params: Dict, lora: Dict, cfg: LoRAConfig) -> Dict:
    """base params with W := W + (alpha/rank) * A @ B at adapted paths.
    Cheap relative to a train step (one [in,r]x[r,out] matmul per
    adapter); call inside the jitted loss so grads reach only `lora`."""
    scale = cfg.alpha / cfg.rank

    def patch(tree: Dict, parts, delta):
        k = parts[0]
        if len(parts) == 1:
            node = dict(tree[k])
            node["kernel"] = node["kernel"] + delta.astype(
                node["kernel"].dtype)
            return {**tree, k: node}
        return {**tree, k: patch(tree[k], parts[1:], delta)}

    out = params
    for path, ab in lora.items():
        delta = (ab["a"] @ ab["b"]) * scale
        out = patch(out, path.split("/"), delta)
    return out


def lora_apply(model, base_params: Dict, lora: Dict, cfg: LoRAConfig,
               *args, **kwargs):
    """Merge-FREE adapted forward: y = x@W + (alpha/rank)*(x@A)@B per
    adapted Dense, injected with flax's method interceptor.

    Why not merge_lora inside the loss: the merged tree is a full COPY
    of the 11.1 GB base (25.9 GB total with activations — measured OOM
    on one 16 GB v5e, experiments/lora_step_real.py). The low-rank path
    adds only [T,r] activations, keeps the merge inside each block's
    remat region, and reaches identical math to bf16 tolerance
    (tests/test_lora.py::test_lora_apply_matches_merged)."""
    import flax.linen as nn
    scale = cfg.alpha / cfg.rank

    def interceptor(next_fun, iargs, ikwargs, context):
        if (context.method_name == "__call__"
                and isinstance(context.module, nn.Dense)):
            ab = lora.get("/".join(context.module.path))
            if ab is not None:
                x = iargs[0]
                y = next_fun(*iargs, **ikwargs)
                delta = ((x @ ab["a"].astype(x.dtype))
                         @ ab["b"].astype(x.dtype))
                return y + jnp.asarray(scale, x.dtype) * delta
        return next_fun(*iargs, **ikwargs)

    with nn.intercept_methods(interceptor):
        return model.apply({"params": base_params}, *args, **kwargs)


def export_merged(params: Dict, lora: Dict, cfg: LoRAConfig) -> Dict:
    """Bake adapters into a standalone checkpoint (inference needs no
    LoRA machinery afterwards)."""
    return jax.tree_util.tree_map(np.asarray, merge_lora(params, lora, cfg))


def n_params(tree: Any) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(tree))


def make_lora_train_step(model, base_params: Dict, cfg,
                         lora_cfg: LoRAConfig = LoRAConfig()):
    """LoRA variant of train/dit.make_dit_train_step: same batch contract
    and diffusion loss, but the optimizer state and gradients cover only
    the adapter tree. `cfg` is a DiTTrainConfig."""
    import optax
    from .dit import make_optimizer
    from ..models.cogvideox.scheduler import _alphas_cumprod

    ac = jnp.asarray(_alphas_cumprod(cfg.sched))
    sqrt_ac, sqrt_1m = jnp.sqrt(ac), jnp.sqrt(1.0 - ac)
    T = cfg.sched.num_train_timesteps
    opt = make_optimizer(cfg)

    def init_state(rng):
        lora = init_lora(base_params, lora_cfg, rng)
        return {"lora": lora, "opt": opt.init(lora),
                "step": jnp.zeros((), jnp.int32)}

    def loss_fn(lora, batch, t, noise, base):
        x0 = batch["x0"]
        a = sqrt_ac[t][:, None, None, None, None].astype(x0.dtype)
        b = sqrt_1m[t][:, None, None, None, None].astype(x0.dtype)
        noisy = a * x0 + b * noise
        model_in = jnp.concatenate([noisy, batch["cond"]], axis=2)
        # merge-free adapted forward (lora_apply docstring: the merged
        # tree copies the whole base and OOMs a single v5e)
        v_pred = lora_apply(model, base, lora, lora_cfg,
                            model_in, batch["text"], t)
        v_tgt = a * noise - b * x0
        return jnp.mean(jnp.square((v_pred - v_tgt).astype(jnp.float32)))

    def step(state, batch, rng, base=None):
        """``base``: pass the base-param tree EXPLICITLY under jit so it
        lowers as an argument, not as 11.1 GB of captured constants in
        the remote-compile request (the stage-1 full-scale blocker of
        KERNELS §6b applies identically here); None falls back to the
        closed-over tree (fine on CPU/tests)."""
        if base is None:
            base = base_params
        rt, rn = jax.random.split(rng)
        B = batch["x0"].shape[0]
        t = jax.random.randint(rt, (B,), 0, T)
        noise = jax.random.normal(rn, batch["x0"].shape, batch["x0"].dtype)
        loss, grads = jax.value_and_grad(loss_fn)(state["lora"], batch,
                                                  t, noise, base)
        updates, new_opt = opt.update(grads, state["opt"], state["lora"])
        new_lora = optax.apply_updates(state["lora"], updates)
        return ({"lora": new_lora, "opt": new_opt,
                 "step": state["step"] + 1},
                {"loss": loss, "grad_norm": optax.global_norm(grads)})

    return init_state, step
