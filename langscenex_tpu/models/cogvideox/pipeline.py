"""CogVideoX keyframe-interpolation pipeline (TriMap stage 1).

Parity target: CogVideoXInterpolationPipeline.__call__
(cogvideox_interpolation/pipeline.py:511-789) — from a (first, last) image
pair and a prompt: VAE-encode both keyframes into the first/last latent
frames with zeros between (prepare_latents :270-340), then a
classifier-free-guided denoise loop where every step channel-concatenates
the (fixed) image latents onto the noisy latents (:720-746), DDIM/DPM
update (:749-760), and finally 3D-causal-VAE decode (:777-779).

TPU-first: the whole denoise loop is one lax.scan under jit; CFG runs as a
batch of 2 (conditional/unconditional) so the DiT sees a static batch; DP
over the 3 TriMap videos and TP over DiT heads come from the mesh axes
(parallel/mesh.py). At full scale the loop runs CHUNKED (loop_chunk): one
jitted fixed-length scan segment, host loop over segments — a 50-step
5.57B program is a ~5-minute single device execution, which exceeds the
tunneled backend's per-execution deadline and faults the worker; chunks
of ~10 steps execute in ~60 s each and reuse ONE compiled executable.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .scheduler import DDIMScheduler


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    num_frames: int = 49
    height: int = 480
    width: int = 720
    num_inference_steps: int = 50
    guidance_scale: float = 6.0
    use_dynamic_cfg: bool = False
    vae_scale_factor_spatial: int = 8
    vae_scale_factor_temporal: int = 4
    latent_channels: int = 16
    vae_scaling_factor: float = 0.7   # CogVideoX VAE config scaling
    # Training-free output broadcast (OFF by default, opt-in perf knob):
    # inside the middle `broadcast_window` fraction of the trajectory,
    # call the DiT only every `broadcast_interval`-th step and reuse the
    # cached guided noise prediction in between. Timestep-level variant
    # of Pyramid Attention Broadcast (arXiv 2408.12588) — model outputs
    # are temporally redundant mid-trajectory; block-level attention
    # caching would need ~9 GB HBM at 5.57B/18k-tokens, the output cache
    # needs ~9 MB. Exactness: identity when interval=1, and for any
    # interval when the model output is locally constant in t.
    broadcast_interval: int = 1
    broadcast_window: Tuple[float, float] = (0.2, 0.9)
    # Denoise-loop chunking (0 = whole loop in one device program).
    # >0: scan `loop_chunk` steps per jitted call, host loop over the
    # schedule (padded with masked no-op steps to a chunk multiple, so a
    # single executable covers every segment). Numerically identical to
    # the unchunked loop — same step sequence, same ops.
    loop_chunk: int = 0

    @property
    def latent_frames(self) -> int:
        return (self.num_frames - 1) // self.vae_scale_factor_temporal + 1

    @property
    def latent_height(self) -> int:
        return self.height // self.vae_scale_factor_spatial

    @property
    def latent_width(self) -> int:
        return self.width // self.vae_scale_factor_spatial


def prepare_interpolation_latents(
        key: jax.Array, first_latent: jnp.ndarray, last_latent: jnp.ndarray,
        cfg: PipelineConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build (noise latents, conditioning image latents).

    first/last_latent: [B, 1, C, H', W'] VAE-encoded keyframes (already
    scaled). The conditioning tensor places the first keyframe at latent
    frame 0 and the last at frame F-1 with zeros between
    (pipeline.py:270-340); the noise tensor is pure gaussian.
    """
    B = first_latent.shape[0]
    F, C = cfg.latent_frames, cfg.latent_channels
    H, W = cfg.latent_height, cfg.latent_width
    pad = jnp.zeros((B, F - 2, C, H, W), first_latent.dtype)
    image_latents = jnp.concatenate([first_latent, pad, last_latent], axis=1)
    noise = jax.random.normal(key, (B, F, C, H, W), jnp.float32)
    return noise, image_latents


def dynamic_guidance(scale: float, t: jnp.ndarray, num_train_timesteps: int):
    """pipeline.py:744-746 dynamic cfg: 1 + (s-1)(1-cos(pi (T-t)/T))/2."""
    import math
    frac = (num_train_timesteps - t.astype(jnp.float32)) / num_train_timesteps
    return 1.0 + (scale - 1.0) * (1.0 - jnp.cos(jnp.pi * frac)) / 2.0


def schedule_arrays(scheduler: DDIMScheduler, cfg: PipelineConfig):
    """(ts, ts_prev, compute_mask) for the CFG denoise schedule.

    compute_mask: True = evaluate the DiT at this step (the output-
    broadcast schedule; all-True when broadcast_interval == 1).
    """
    n = cfg.num_inference_steps
    ts = scheduler.timesteps(n)
    ts_prev = jnp.concatenate([ts[1:], -jnp.ones((1,), jnp.int32)])
    idx = jnp.arange(n)
    if cfg.broadcast_interval > 1:
        w0 = int(cfg.broadcast_window[0] * n)
        w1 = int(cfg.broadcast_window[1] * n)
        compute = ((idx < w0) | (idx >= w1)
                   | ((idx - w0) % cfg.broadcast_interval == 0))
    else:
        compute = jnp.ones((n,), bool)
    return ts, ts_prev, compute


def _make_step(denoiser: Callable, image_latents: jnp.ndarray,
               text: jnp.ndarray, scheduler: DDIMScheduler,
               cfg: PipelineConfig):
    """The per-step scan body. xs = (t, t_prev, do_eval, valid); `valid`
    False turns the step into an identity (chunk padding)."""
    B = image_latents.shape[0]

    def evaluate(lat, t):
        lat_in = jnp.concatenate([lat, lat], axis=0)
        img_in = jnp.concatenate([image_latents, image_latents], axis=0)
        model_in = jnp.concatenate([lat_in, img_in], axis=2)  # channel cat
        tt = jnp.full((2 * B,), t, jnp.int32)
        out = denoiser(model_in, text, tt)
        uncond, cond = jnp.split(out, 2, axis=0)
        if cfg.use_dynamic_cfg:
            g = dynamic_guidance(cfg.guidance_scale, t,
                                 scheduler.cfg.num_train_timesteps)
        else:
            g = cfg.guidance_scale
        return uncond + g * (cond - uncond)

    def step(carry, xs):
        lat, cache = carry
        t, t_prev, do_eval, valid = xs
        # a bf16 denoiser (full-scale path) must match the f32 cache carry
        noise_pred = jax.lax.cond(
            do_eval & valid, lambda args: evaluate(*args).astype(lat.dtype),
            lambda args: cache, (lat, t))
        new_lat = scheduler.step(noise_pred, t, t_prev, lat)
        new_lat = jnp.where(valid, new_lat, lat)
        return (new_lat, noise_pred), None

    return step


def denoise_loop(denoiser: Callable, latents: jnp.ndarray,
                 image_latents: jnp.ndarray,
                 text_cond: jnp.ndarray, text_uncond: jnp.ndarray,
                 scheduler: DDIMScheduler, cfg: PipelineConfig):
    """CFG denoise loop as one lax.scan (pipeline.py:712-775).

    denoiser(latents [2B,F,2C,H,W], text [2B,L,D], t [2B]) -> [2B,F,C,H,W]
    """
    ts, ts_prev, compute = schedule_arrays(scheduler, cfg)
    text = jnp.concatenate([text_uncond, text_cond], axis=0)
    step = _make_step(denoiser, image_latents, text, scheduler, cfg)
    valid = jnp.ones_like(compute)
    (final, _), _ = jax.lax.scan(
        step, (latents, jnp.zeros_like(latents)),
        (ts, ts_prev, compute, valid))
    return final


def denoise_chunk(denoiser: Callable, latents: jnp.ndarray,
                  cache: jnp.ndarray, image_latents: jnp.ndarray,
                  text_cond: jnp.ndarray, text_uncond: jnp.ndarray,
                  ts: jnp.ndarray, ts_prev: jnp.ndarray,
                  compute: jnp.ndarray, valid: jnp.ndarray,
                  scheduler: DDIMScheduler, cfg: PipelineConfig):
    """One fixed-length segment of the denoise schedule: scan over the
    given slice, returning (latents, cache) to carry into the next chunk.
    Identical numerics to the corresponding slice of `denoise_loop`."""
    text = jnp.concatenate([text_uncond, text_cond], axis=0)
    step = _make_step(denoiser, image_latents, text, scheduler, cfg)
    (final, cache), _ = jax.lax.scan(
        step, (latents, cache), (ts, ts_prev, compute, valid))
    return final, cache


class InterpolationPipeline:
    """End-to-end stage-1 runner binding the DiT + VAE + scheduler.

    ``vae_encode(images [B,T,3,H,W]) -> [B,T',C,H',W']`` and ``vae_decode``
    are injected so the pipeline works with the flax VAE (vae.py) or any
    stub in tests; T5 embeddings come from models/t5.py.
    """

    def __init__(self, denoiser_fn, vae_encode, vae_decode,
                 scheduler: Optional[DDIMScheduler] = None,
                 cfg: PipelineConfig = PipelineConfig(),
                 denoiser_params=None, unload_loop_for_decode=False):
        """``denoiser_params``: when given, ``denoiser_fn`` takes
        ``(params, latents, text, t)`` and the denoise scan is traced
        under a jit where the params enter as an ARGUMENT. Without this,
        a full-size DiT's weights are captured as 11.1 GB of lowering
        CONSTANTS embedded in the (remote) compile request — the axon
        tunnel stalls/413s on it (same class as bench.py's note)."""
        self.denoiser_fn = denoiser_fn
        self.vae_encode = vae_encode
        self.vae_decode = vae_decode
        self.scheduler = scheduler or DDIMScheduler()
        self.cfg = cfg
        self.denoiser_params = denoiser_params
        # TPU executables RESERVE their HLO-temp arena at LOAD time: the
        # 50-step full-scale denoise program's temps + the 11.1 GB params
        # + the VAE decode program exceed v5e HBM together (the decode
        # crashed the worker until the loop executable is dropped first).
        # Cost: the loop recompiles on the next __call__.
        self.unload_loop_for_decode = unload_loop_for_decode
        if denoiser_params is not None:
            import functools
            if cfg.loop_chunk > 0:
                self._jit_loop = jax.jit(
                    lambda p, lat, cache, img, tc, tu, ts, tsp, comp, val:
                    denoise_chunk(functools.partial(denoiser_fn, p), lat,
                                  cache, img, tc, tu, ts, tsp, comp, val,
                                  self.scheduler, self.cfg))
            else:
                self._jit_loop = jax.jit(
                    lambda p, noise, img, tc, tu: denoise_loop(
                        functools.partial(denoiser_fn, p), noise, img,
                        tc, tu, self.scheduler, self.cfg))
        else:
            self._jit_loop = None

    def _run_loop_chunked(self, noise, image_latents, text_cond,
                          text_uncond):
        """Host loop over fixed-length jitted chunks: every segment
        reuses ONE executable (the schedule is padded with valid=False
        identity steps to a chunk multiple), and each device execution
        stays far below the tunneled backend's per-execution deadline."""
        import numpy as np
        cfg = self.cfg
        chunk = cfg.loop_chunk
        ts, ts_prev, compute = schedule_arrays(self.scheduler, cfg)
        n = cfg.num_inference_steps
        m = -(-n // chunk) * chunk
        pad = m - n
        valid = jnp.concatenate([jnp.ones((n,), bool),
                                 jnp.zeros((pad,), bool)])
        ts = jnp.concatenate([ts, jnp.zeros((pad,), ts.dtype)])
        ts_prev = jnp.concatenate([ts_prev, jnp.zeros((pad,),
                                                      ts_prev.dtype)])
        compute = jnp.concatenate([compute, jnp.zeros((pad,), bool)])
        lat, cache = noise, jnp.zeros_like(noise)
        import logging
        import time
        lg = logging.getLogger(__name__)
        for i in range(m // chunk):
            s = slice(i * chunk, (i + 1) * chunk)
            t0 = time.perf_counter()
            lat, cache = self._jit_loop(
                self.denoiser_params, lat, cache, image_latents,
                text_cond, text_uncond, ts[s], ts_prev[s], compute[s],
                valid[s])
            # Sync between chunks: the chunking exists to keep each
            # device execution under the tunnel's per-execution deadline;
            # async dispatch would queue all chunks into one long busy
            # window and defeat that. block_until_ready waits without a
            # D2H transfer, so the cost is one RTT per chunk.
            jax.block_until_ready(lat)
            lg.info("denoise chunk %d/%d (%d steps): %.1fs", i + 1,
                    m // chunk, chunk, time.perf_counter() - t0)
        return lat

    def __call__(self, key: jax.Array, first_image: jnp.ndarray,
                 last_image: jnp.ndarray, text_cond: jnp.ndarray,
                 text_uncond: jnp.ndarray) -> jnp.ndarray:
        """first/last_image [B,3,H,W] in [-1,1] -> video latents decoded to
        [B,T,3,H,W]."""
        cfg = self.cfg
        first_lat = self.vae_encode(first_image[:, None]) * cfg.vae_scaling_factor
        last_lat = self.vae_encode(last_image[:, None]) * cfg.vae_scaling_factor
        noise, image_latents = prepare_interpolation_latents(
            key, first_lat, last_lat, cfg)
        if self._jit_loop is not None:
            if cfg.loop_chunk > 0:
                latents = self._run_loop_chunked(noise, image_latents,
                                                 text_cond, text_uncond)
            else:
                latents = self._jit_loop(self.denoiser_params, noise,
                                         image_latents, text_cond,
                                         text_uncond)
            if self.unload_loop_for_decode:
                latents = jax.block_until_ready(latents)
                self._jit_loop.clear_cache()
        else:
            latents = denoise_loop(self.denoiser_fn, noise, image_latents,
                                   text_cond, text_uncond, self.scheduler,
                                   cfg)
        return self.vae_decode(latents / cfg.vae_scaling_factor)
