"""DiT fine-tune CLI — the training entry point the reference never
shipped (SURVEY.md §2.2: datasets/losses/configs exist upstream, the
accelerate train script does not).

    python -m langscenex_tpu.finetune --data /path/to/frame_dirs \
        --steps 1000 [--lora --rank 16] [--t5 /ckpt/t5] [--vae /ckpt/vae]

Data layout: `--data` contains one subdirectory of frames per video
(the contract of models/cogvideox/datasets.VideoClipDataset). Latents
come from the REAL 3D causal VAE whenever `--vae` provides converted
weights (an orbax dir: either a bare VAE tree or the merged {dit,vae}
video_inference tree), scaled by the pipeline's vae_scaling_factor so
fine-tune latents match inference latents exactly
(cogvideox_interpolation/pipeline.py:270-340). Without `--vae` a
deterministic space-to-depth stub encoder keeps the loop runnable for
smoke tests — with a loud RuntimeWarning, since a DiT fine-tuned on
stub latents is useless against the real VAE. Conditioning latents
follow the interpolation pipeline: first+last frame encoded, middle
zero-padded, concatenated on channels.
"""
from __future__ import annotations

import argparse
import os
import warnings
from typing import Optional

import numpy as np


def stub_encode(clip: np.ndarray, latent_channels: int = 16) -> np.ndarray:
    """[F,3,H,W] in [-1,1] -> [F',16,H/8,W/8]: 4x temporal pick +
    8x8 space-to-depth averaged into 16 channels. Deterministic stand-in
    for the VAE encoder so the trainer runs without checkpoints."""
    F, C, H, W = clip.shape
    f_idx = np.arange(0, F, 4)
    x = clip[f_idx]                                         # [F',3,H,W]
    Fp = x.shape[0]
    x = x.reshape(Fp, C, H // 8, 8, W // 8, 8)
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(Fp, C * 64, H // 8, W // 8)
    # average groups of 12 channels -> 16
    g = (C * 64) // latent_channels
    return x[:, :g * latent_channels].reshape(
        Fp, latent_channels, g, H // 8, W // 8).mean(2)


def make_vae_encode(vae_tree, vae_cfg=None, scale: float = 0.7):
    """Real-VAE encode_fn: [F,3,H,W] in [-1,1] -> [F',16,h,w] latents
    (posterior mean × scaling factor — the deterministic choice the
    interpolation pipeline makes for its conditioning latents)."""
    import jax
    import jax.numpy as jnp

    from .models.cogvideox.vae import AutoencoderKL3D, VAEConfig

    model = AutoencoderKL3D(vae_cfg or VAEConfig())

    @jax.jit
    def _enc(video):
        mean, _ = model.apply(vae_tree, video,
                              method=AutoencoderKL3D.encode)
        return mean * scale

    def encode_fn(clip: np.ndarray) -> np.ndarray:
        return np.asarray(_enc(jnp.asarray(clip[None], jnp.float32))[0])

    return encode_fn


def load_vae_encode(path: str, vae_cfg=None, scale: float = 0.7):
    """Restore an orbax VAE dir (bare tree or merged {dit,vae}) and
    return the real encode_fn."""
    import orbax.checkpoint as ocp
    tree = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    if isinstance(tree, dict) and "vae" in tree:
        tree = tree["vae"]
    return make_vae_encode(tree, vae_cfg=vae_cfg, scale=scale)


def build_batch(ds, text_encoder, B: int, prompt: str,
                encode_fn) -> dict:
    import jax.numpy as jnp
    x0s, conds = [], []
    for _ in range(B):
        clip, first, last = ds.sample()
        lat = encode_fn(clip)                               # [F',16,h,w]
        cond = np.zeros_like(lat)
        cond[0] = encode_fn(first[None])[0]
        cond[-1] = encode_fn(last[None])[0]
        x0s.append(lat)
        conds.append(cond)
    text = text_encoder.encode([prompt] * B)
    return {"x0": jnp.asarray(np.stack(x0s)),
            "cond": jnp.asarray(np.stack(conds)),
            "text": jnp.asarray(text)}


def main(argv: Optional[list] = None) -> dict:
    import jax
    import jax.numpy as jnp

    from .models.cogvideox.datasets import ClipSamplerConfig, VideoClipDataset
    from .models.cogvideox.transformer import (CogVideoXTransformer,
                                               TransformerConfig)
    from .models.t5 import TextEncoder
    from .train.checkpoint import save_checkpoint
    from .train.dit import DiTTrainConfig, make_dit_train_step
    from .train.lora import LoRAConfig, make_lora_train_step

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", required=True,
                    help="dir of per-video frame subdirectories")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--frames", type=int, default=49)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=720)
    ap.add_argument("--prompt", default="a smooth high-quality video")
    ap.add_argument("--lora", action="store_true")
    ap.add_argument("--rank", type=int, default=16)
    ap.add_argument("--t5", default=None, help="torch T5 checkpoint dir")
    ap.add_argument("--vae", default=None,
                    help="orbax dir with converted VAE params (bare tree "
                         "or merged {dit,vae}); stub encoder otherwise")
    ap.add_argument("--vae-scale", type=float, default=0.7,
                    help="latent scaling factor (CogVideoX-5b VAE: 0.7; "
                         "must match video_inference's)")
    ap.add_argument("--out", default="./finetune_out")
    ap.add_argument("--save-every", type=int, default=500)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model/resolution for smoke tests")
    args = ap.parse_args(argv)

    if args.tiny:
        cfg = TransformerConfig(num_layers=2, num_heads=4, head_dim=16,
                                in_channels=32, out_channels=16,
                                patch_size=2, text_embed_dim=64,
                                time_embed_dim=32,
                                attn_dtype=jnp.float32)
        args.height, args.width, args.frames = 64, 96, 9
        text_dim = 64
    else:
        cfg = TransformerConfig(remat=True)
        text_dim = 4096

    roots = sorted(os.path.join(args.data, d)
                   for d in os.listdir(args.data)
                   if os.path.isdir(os.path.join(args.data, d)))
    ds = VideoClipDataset(roots, ClipSamplerConfig(
        num_frames=args.frames, size_hw=(args.height, args.width)))
    if len(ds) == 0:
        raise SystemExit("no video dirs with enough frames under --data")
    text_encoder = TextEncoder(args.t5, embed_dim=text_dim)

    if args.vae:
        vae_cfg = None
        if args.tiny:
            from .models.cogvideox.vae import VAEConfig
            vae_cfg = VAEConfig(block_out_channels=(8, 16, 16, 32),
                                layers_per_block=1, norm_groups=4)
        encode_fn = load_vae_encode(args.vae, vae_cfg=vae_cfg,
                                    scale=args.vae_scale)
    else:
        warnings.warn(
            "finetune: no --vae given — latents come from the "
            "space-to-depth STUB encoder. Fine for smoke tests; a DiT "
            "fine-tuned on stub latents is useless against the real VAE.",
            RuntimeWarning, stacklevel=1)
        encode_fn = stub_encode

    model = CogVideoXTransformer(cfg)
    batch = build_batch(ds, text_encoder, args.batch, args.prompt,
                        encode_fn)
    lat = jnp.concatenate([batch["x0"], batch["cond"]], axis=2)
    params = model.init(jax.random.PRNGKey(0), lat, batch["text"],
                        jnp.zeros((args.batch,), jnp.int32))["params"]

    tcfg = DiTTrainConfig(lr=args.lr, total_steps=args.steps,
                          warmup_steps=min(100, max(1, args.steps // 10)))
    if args.lora:
        init_state, step = make_lora_train_step(model, params, tcfg,
                                                LoRAConfig(rank=args.rank))
        state = init_state(jax.random.PRNGKey(1))
    else:
        init_state, step = make_dit_train_step(model, tcfg)
        state = init_state(params)
    jstep = jax.jit(step)

    rng = jax.random.PRNGKey(2)
    last = {}
    for i in range(args.steps):
        batch = build_batch(ds, text_encoder, args.batch, args.prompt,
                            encode_fn)
        rng, sub = jax.random.split(rng)
        state, metrics = jstep(state, batch, sub)
        if i % args.log_every == 0:
            last = {k: float(v) for k, v in metrics.items()}
            print(f"step {i}: loss={last['loss']:.4f} "
                  f"gnorm={last['grad_norm']:.3f}", flush=True)
        if args.save_every and (i + 1) % args.save_every == 0:
            save_checkpoint(args.out, state, i + 1)
    save_checkpoint(args.out, state, args.steps)
    return last


if __name__ == "__main__":
    main()
