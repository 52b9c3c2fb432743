"""Diffusion schedulers: CogVideoX-style DDIM (v-prediction, zero-SNR
rescaled betas) and DPM-Solver++(2M), pure jnp.

Parity targets: the CogVideoXDDIMScheduler / CogVideoXDPMScheduler the
reference steps through (cogvideox_interpolation/pipeline.py:13,749-760).
CogVideoX uses scaled_linear betas (sqrt space), beta range
[0.00085, 0.012], 1000 train steps, v_prediction, zero-SNR terminal
rescale, and "trailing" timestep spacing.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "v_prediction"
    rescale_betas_zero_snr: bool = True
    timestep_spacing: str = "trailing"
    set_alpha_to_one: bool = True
    snr_shift_scale: float = 3.0    # CogVideoX SNR shift


def _alphas_cumprod(cfg: SchedulerConfig) -> np.ndarray:
    if cfg.beta_schedule == "scaled_linear":
        betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                            cfg.num_train_timesteps) ** 2
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end,
                            cfg.num_train_timesteps)
    else:
        raise ValueError(cfg.beta_schedule)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    # CogVideoX SNR shift (scheduling_ddim_cogvideox): ac' = ac/(s - (s-1)ac)
    s = cfg.snr_shift_scale
    ac = ac / (s - (s - 1.0) * ac)
    if cfg.rescale_betas_zero_snr:
        # Shift+scale sqrt(ac) so the terminal step has zero SNR
        sq = np.sqrt(ac)
        sq0, sqT = sq[0].copy(), sq[-1].copy()
        sq = sq - sqT
        sq = sq * sq0 / (sq0 - sqT)
        ac = sq ** 2
    return ac.astype(np.float32)


class DDIMScheduler:
    """Deterministic DDIM with v-prediction (eta=0 as the pipeline uses)."""

    def __init__(self, cfg: SchedulerConfig = SchedulerConfig()):
        self.cfg = cfg
        self.alphas_cumprod = jnp.asarray(_alphas_cumprod(cfg))
        self.final_alpha_cumprod = (jnp.asarray(1.0) if cfg.set_alpha_to_one
                                    else self.alphas_cumprod[0])

    def timesteps(self, num_inference_steps: int) -> jnp.ndarray:
        T = self.cfg.num_train_timesteps
        if self.cfg.timestep_spacing == "trailing":
            step = T / num_inference_steps
            ts = (np.arange(T, 0, -step).round().astype(np.int64) - 1)
        elif self.cfg.timestep_spacing == "linspace":
            ts = np.linspace(0, T - 1, num_inference_steps
                             ).round().astype(np.int64)[::-1]
        else:  # leading
            step = T // num_inference_steps
            ts = (np.arange(num_inference_steps) * step).round()[::-1]
        return jnp.asarray(ts.copy(), jnp.int32)

    def _pred_x0_eps(self, model_out, sample, t):
        a_t = self.alphas_cumprod[t]
        sqrt_a = jnp.sqrt(a_t)
        sqrt_1ma = jnp.sqrt(1.0 - a_t)
        if self.cfg.prediction_type == "v_prediction":
            x0 = sqrt_a * sample - sqrt_1ma * model_out
            eps = sqrt_a * model_out + sqrt_1ma * sample
        elif self.cfg.prediction_type == "epsilon":
            eps = model_out
            x0 = (sample - sqrt_1ma * eps) / sqrt_a
        else:  # sample
            x0 = model_out
            eps = (sample - sqrt_a * x0) / sqrt_1ma
        return x0, eps

    def step(self, model_out: jnp.ndarray, t: jnp.ndarray,
             t_prev: jnp.ndarray, sample: jnp.ndarray) -> jnp.ndarray:
        """One deterministic DDIM update from t to t_prev (t_prev < 0 means
        the final step -> alpha = final_alpha_cumprod)."""
        x0, eps = self._pred_x0_eps(model_out, sample, t)
        a_prev = jnp.where(t_prev >= 0,
                           self.alphas_cumprod[jnp.maximum(t_prev, 0)],
                           self.final_alpha_cumprod)
        return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps

    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray,
                  t: jnp.ndarray) -> jnp.ndarray:
        a = self.alphas_cumprod[t]
        while a.ndim < x0.ndim:
            a = a[..., None]
        return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise

    def get_velocity(self, x0: jnp.ndarray, noise: jnp.ndarray,
                     t: jnp.ndarray) -> jnp.ndarray:
        a = self.alphas_cumprod[t]
        while a.ndim < x0.ndim:
            a = a[..., None]
        return jnp.sqrt(a) * noise - jnp.sqrt(1.0 - a) * x0


class DPMState(NamedTuple):
    prev_model_out: jnp.ndarray   # D_{i-1} (x0-space), zeros before 1st step
    has_prev: jnp.ndarray         # [] bool


class DPMSolverScheduler(DDIMScheduler):
    """DPM-Solver++(2M) multistep in x0 space (the CogVideoXDPMScheduler
    alternative path, pipeline.py:749-760). Deterministic."""

    def init_state(self, shape) -> DPMState:
        return DPMState(prev_model_out=jnp.zeros(shape),
                        has_prev=jnp.asarray(False))

    def _lambda(self, a):
        return 0.5 * jnp.log(a / (1.0 - a))

    def step_dpm(self, state: DPMState, model_out, t, t_prev, t_next,
                 sample):
        """2M update: t -> t_prev (t_next is the step after t_prev, or -1).
        Returns (new_sample, new_state)."""
        x0, _ = self._pred_x0_eps(model_out, sample, t)
        a_t = self.alphas_cumprod[t]
        a_s = jnp.where(t_prev >= 0,
                        self.alphas_cumprod[jnp.maximum(t_prev, 0)],
                        self.final_alpha_cumprod)
        a_s = jnp.clip(a_s, 1e-8, 1.0 - 1e-8)
        a_t = jnp.clip(a_t, 1e-8, 1.0 - 1e-8)
        lam_t, lam_s = self._lambda(a_t), self._lambda(a_s)
        h = lam_s - lam_t
        sigma_t = jnp.sqrt(1 - a_t)
        sigma_s = jnp.sqrt(1 - a_s)
        alpha_s = jnp.sqrt(a_s)

        # first-order (DDIM-like) fallback when no history
        first = (sigma_s / sigma_t) * sample - alpha_s * jnp.expm1(-h) * x0

        # second-order multistep correction
        def second():
            # previous lambda for r0
            prev_t = t  # caller passes consecutive ts; r0 uses h_last ~ h
            d = x0
            d1 = x0 - state.prev_model_out
            return ((sigma_s / sigma_t) * sample
                    - alpha_s * jnp.expm1(-h) * d
                    - 0.5 * alpha_s * jnp.expm1(-h) * d1)

        new_sample = jnp.where(state.has_prev, second(), first)
        return new_sample, DPMState(prev_model_out=x0,
                                    has_prev=jnp.asarray(True))
