"""Full-scale TriMap stage wall-clock on ONE chip.

Times the COMPLETE stage-1 video generation path at reference scale
(video_inference.py:65-74 contract: 49 frames @ 480x720, 50 denoise
steps, CFG 6) through the real InterpolationPipeline code path: VAE
keyframe encode -> 50-step CFG lax.scan over the 5.57B DiT (batch-2
cond/uncond) -> tiled 3D-causal-VAE decode -> PNG frame export.

Weights are zero bf16 leaves built via eval_shape (timing-equivalent:
the MXU does not skip zeros; a single-core host init of 5.57B params is
the alternative). The T5 stage is excluded here (conditioning arrives as
a [1,226,4096] tensor exactly as in the real path; the reference
offloads T5 to CPU between stages, pipeline.py:135-140).

Run: timeout 4000 python experiments/trimap_stage_time.py
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from langscenex_tpu.models.cogvideox.pipeline import (InterpolationPipeline,
                                                      PipelineConfig)
from langscenex_tpu.models.cogvideox.scheduler import DDIMScheduler
from langscenex_tpu.models.cogvideox.transformer import (CogVideoXTransformer,
                                                         TransformerConfig)
from langscenex_tpu.models.cogvideox.vae import AutoencoderKL3D, VAEConfig


def zeros_bf16_like(init_fn, *args):
    shapes = jax.eval_shape(init_fn, *args)
    dev = jax.devices()[0]
    return jax.tree_util.tree_map(
        lambda s: jax.device_put(
            jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32
                      else s.dtype), dev), shapes)


def main():
    pcfg = PipelineConfig()
    tcfg = TransformerConfig()
    vcfg = VAEConfig()
    dit = CogVideoXTransformer(tcfg)
    vae = AutoencoderKL3D(vcfg)

    F, C = pcfg.latent_frames, pcfg.latent_channels
    Hl, Wl = pcfg.latent_height, pcfg.latent_width

    t0 = time.perf_counter()
    dit_params = zeros_bf16_like(
        lambda: dit.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, F, 2 * C, Hl, Wl), jnp.bfloat16),
                         jnp.zeros((1, 226, tcfg.text_embed_dim),
                                   jnp.bfloat16),
                         jnp.zeros((1,), jnp.int32)))
    vae_params = zeros_bf16_like(
        lambda: vae.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 1, 3, pcfg.height, pcfg.width),
                                   jnp.bfloat16)))
    n = sum(x.size for x in jax.tree_util.tree_leaves(dit_params))
    print(f"DiT {n/1e9:.2f}B params staged in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    # params as jit ARGS, not closed-over constants (11.1 GB of captured
    # constants ride the remote compile request otherwise)
    denoiser = lambda p, lat, txt, t: dit.apply(
        p, lat.astype(jnp.bfloat16), txt.astype(jnp.bfloat16), t)
    _enc_jit = jax.jit(lambda p, imgs: vae.apply(
        p, imgs.astype(jnp.bfloat16), method=AutoencoderKL3D.encode)[0])
    vae_encode = lambda imgs: _enc_jit(vae_params, imgs)
    from langscenex_tpu.models.cogvideox.vae import spatial_tile_decode
    _dec_jit = jax.jit(lambda p, z: vae.apply(
        p, z.astype(jnp.bfloat16), method=AutoencoderKL3D.decode))
    _decode_one = lambda z: _dec_jit(vae_params, z)
    vae_decode = lambda z: spatial_tile_decode(_decode_one, z)
    pipe = InterpolationPipeline(denoiser, vae_encode, vae_decode,
                                 DDIMScheduler(), pcfg,
                                 denoiser_params=dit_params)

    rng = np.random.default_rng(0)
    first = jnp.asarray(rng.uniform(-1, 1, (1, 3, pcfg.height, pcfg.width)),
                        jnp.float32)
    last = jnp.asarray(rng.uniform(-1, 1, (1, 3, pcfg.height, pcfg.width)),
                       jnp.float32)
    cond = jnp.zeros((1, 226, tcfg.text_embed_dim), jnp.float32)
    uncond = jnp.zeros((1, 226, tcfg.text_embed_dim), jnp.float32)

    t0 = time.perf_counter()
    video = pipe(jax.random.PRNGKey(42), first, last, cond, uncond)
    video = np.asarray(video)                      # fetch = fence
    t_total = time.perf_counter() - t0
    print(f"pipeline total (incl compile): {t_total:.1f}s", flush=True)

    # steady-state: second full call reuses every compiled fn
    t0 = time.perf_counter()
    video = np.asarray(pipe(jax.random.PRNGKey(43), first, last,
                            cond, uncond))
    t_video = time.perf_counter() - t0
    print(f"one video steady-state: {t_video:.1f}s "
          f"({t_video / 60:.2f} min)", flush=True)

    from langscenex_tpu.video_inference import save_video_frames
    out = "/tmp/trimap_time_frames"
    t0 = time.perf_counter()
    save_video_frames(video[0], out)
    t_save = time.perf_counter() - t0
    nf = len([f for f in os.listdir(out) if f.endswith(".png")])
    print(f"frame export: {nf} pngs in {t_save:.1f}s", flush=True)

    print(json.dumps({
        "metric": "trimap_video_min",
        "value": round(t_video / 60, 2), "unit": "min/video",
        "compile_s": round(t_total - t_video, 1),
        "three_videos_min": round(3 * t_video / 60, 1),
        "frames": int(video.shape[1])}), flush=True)


if __name__ == "__main__":
    main()
