"""Remaining per-stage on-chip rates (random weights — rates are
weight-independent): CogVideoX VAE tiled decode (stage 1 tail), CLIP
dense extraction (stage 3 source), VGGT full forward (pose init).

Usage: python experiments/stage_rates.py {vae|clip|vggt}
(one part per process: each allocates multi-GB parameter/activation sets).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def fetch(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timed(name, fn, *args, n=3):
    fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n - 1):
        out = fn(*args)
    fetch(out)
    dt = (time.perf_counter() - t0) / (n - 1)
    print(f"{name:52s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def zeros_like_tree(shapes):
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def vae_part():
    from langscenex_tpu.models.cogvideox.vae import (AutoencoderKL3D,
                                                     VAEConfig,
                                                     spatial_tile_decode)
    cfg = VAEConfig()
    model = AutoencoderKL3D(cfg)
    lat = jnp.zeros((1, 13, 16, 60, 90), jnp.float32)   # 49f @ 480x720
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), lat,
                           method=AutoencoderKL3D.decode))
    params = zeros_like_tree(shapes)
    dec = jax.jit(lambda p, z: model.apply(p, z,
                                           method=AutoencoderKL3D.decode))

    def tiled(p, z):
        return spatial_tile_decode(lambda zz: dec(p, zz), z)

    timed("VAE tiled decode 13x60x90 -> 49f 480x720", tiled, params, lat,
          n=2)


def clip_part():
    from langscenex_tpu.models.clip_dense import (CLIPVisionDense,
                                                  CLIPVisionConfig)
    cfg = CLIPVisionConfig()
    model = CLIPVisionDense(cfg)
    # the extractor resizes 720x480 frames to max_side=672 -> 672x448,
    # snapped to the patch grid
    ps = cfg.patch_size
    H, W = 448 - 448 % ps, 672 - 672 % ps
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), img))
    params = zeros_like_tree(shapes)
    app = jax.jit(lambda p, x: model.apply(p, x)[1])
    timed(f"CLIP ViT-L dense extract {H}x{W}", app, params, img)


def vggt_part():
    from langscenex_tpu.models.vggt import VGGT, VGGTConfig
    cfg = VGGTConfig()
    model = VGGT(cfg)
    S = cfg.img_size - cfg.img_size % cfg.patch_size
    N = 10
    batch = jnp.zeros((1, N, 3, S, S), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch))
    # bf16 params (matching the DiT measurement convention; f32 at 10
    # views OOMs the 16G chip — production inference is bf16 anyway)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes)
    app = jax.jit(lambda p, x: model.apply(p, x))
    timed(f"VGGT-1B bf16 forward (camera+depth+point), {N} views {S}^2",
          app, params, batch, n=2)


if __name__ == "__main__":
    {"vae": vae_part, "clip": clip_part, "vggt": vggt_part}[sys.argv[1]]()
