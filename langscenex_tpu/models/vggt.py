"""VGGT (Visual Geometry Grounded Transformer) in flax: feed-forward
camera pose + dense geometry from unposed images.

Parity targets: vggt/models/aggregator.py:24-331 (alternating
frame/global attention over DINOv2-style patch tokens + camera/register
tokens, 2D RoPE, qk-norm, LayerScale), vggt/models/vggt.py:18-97,
vggt/heads/camera_head.py:19-157 (iterative 9-d pose refinement),
vggt/heads/dpt_head.py (multi-scale fusion -> depth + confidence),
vggt/utils/pose_enc.py (9-d encoding = [t(3), quat(4), fov(2)]).

TPU-first: the frame/global attention alternation is two reshapes of one
token tensor [B, S, T, C] — (B*S, T, C) for frame attention and
(B, S*T, C) for global — exactly the layout XLA wants; attention is fused
jnp einsum in bf16. The whole aggregator jits as one program; sequence
parallelism over frames can shard the S axis on the mesh 'data' axis.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.quat import quat_to_rotmat, quat_normalize


@dataclasses.dataclass(frozen=True)
class VGGTConfig:
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24              # frame/global block pairs
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    qk_norm: bool = True
    rope_freq: float = 100.0
    layerscale_init: float = 0.01
    camera_trunk_depth: int = 4
    camera_iterations: int = 4
    attn_dtype: jnp.dtype = jnp.float32


def rope_2d(freq: float, h: int, w: int, dim: int):
    """2D RoPE (vggt/layers/rope.py:62): half the head dim rotates with y,
    half with x."""
    d4 = dim // 4
    inv = 1.0 / (freq ** (jnp.arange(d4) / d4))
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    fy = jnp.outer(ys, inv)            # [h, d4]
    fx = jnp.outer(xs, inv)            # [w, d4]
    fy = jnp.broadcast_to(fy[:, None, :], (h, w, d4)).reshape(h * w, d4)
    fx = jnp.broadcast_to(fx[None, :, :], (h, w, d4)).reshape(h * w, d4)
    freqs = jnp.concatenate([fy, fx], axis=-1)       # [hw, dim/2]
    return jnp.cos(freqs), jnp.sin(freqs)


def _apply_rope_pairs(x, cos, sin):
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    r1 = x1 * cos - x2 * sin
    r2 = x2 * cos + x1 * sin
    return jnp.stack([r1, r2], axis=-1).reshape(x.shape)


class Attention(nn.Module):
    cfg: VGGTConfig

    @nn.compact
    def __call__(self, x, rope=None, n_special: int = 0):
        """x [B, T, C]; rope applies only to tokens after the first
        n_special (camera + register tokens have no spatial position)."""
        cfg = self.cfg
        B, T, C = x.shape
        H = cfg.num_heads
        hd = C // H
        qkv = nn.Dense(3 * C, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, T, 3, H, hd
                                        ).transpose(2, 0, 3, 1, 4), 3, 0)
        q, k, v = q[0], k[0], v[0]        # [B,H,T,hd]
        if cfg.qk_norm:
            q = nn.LayerNorm(epsilon=1e-6, name="q_norm")(q)
            k = nn.LayerNorm(epsilon=1e-6, name="k_norm")(k)
        if rope is not None:
            cos, sin = rope
            q = q.at[:, :, n_special:].set(
                _apply_rope_pairs(q[:, :, n_special:], cos, sin))
            k = k.at[:, :, n_special:].set(
                _apply_rope_pairs(k[:, :, n_special:], cos, sin))
        scale = 1.0 / math.sqrt(hd)
        logits = jnp.einsum('bhqd,bhkd->bhqk', q.astype(cfg.attn_dtype),
                            k.astype(cfg.attn_dtype),
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits * scale, axis=-1).astype(cfg.attn_dtype)
        o = jnp.einsum('bhqk,bhkd->bhqd', p, v.astype(cfg.attn_dtype),
                       preferred_element_type=jnp.float32)
        o = o.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(B, T, C)
        return nn.Dense(C, name="proj")(o)


class LayerScale(nn.Module):
    dim: int
    init: float

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init),
                           (self.dim,))
        return x * gamma


class Block(nn.Module):
    cfg: VGGTConfig

    @nn.compact
    def __call__(self, x, rope=None, n_special: int = 0):
        cfg = self.cfg
        C = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = Attention(cfg, name="attn")(h, rope, n_special)
        x = x + LayerScale(C, cfg.layerscale_init, name="ls1")(h)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(C * cfg.mlp_ratio), name="mlp_fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(C, name="mlp_fc2")(h)
        return x + LayerScale(C, cfg.layerscale_init, name="ls2")(h)


class Aggregator(nn.Module):
    """Alternating frame/global attention (aggregator.py:243-331)."""
    cfg: VGGTConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        """images [B, S, 3, H, W] -> (tokens [B,S,T,2C], patch_hw).

        T = 1 camera token + R register tokens + patch tokens. The output
        concatenates the last frame-block and last global-block states
        (the reference concatenates two intermediates to 2*1024)."""
        cfg = self.cfg
        B, S, _, H, W = images.shape
        p = cfg.patch_size
        Hp, Wp = H // p, W // p

        x = images.reshape(B * S, 3, H, W).transpose(0, 2, 3, 1)
        x = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p),
                    name="patch_embed")(x)
        x = x.reshape(B * S, Hp * Wp, cfg.embed_dim)

        # frame 0 gets distinct camera/register tokens — this anchors the
        # predicted world frame to the first camera (aggregator.py keeps
        # two sets of special tokens: first frame vs the rest)
        camera_token = self.param(
            "camera_token", nn.initializers.normal(0.02),
            (2, 1, cfg.embed_dim))
        register_tokens = self.param(
            "register_tokens", nn.initializers.normal(0.02),
            (2, cfg.num_register_tokens, cfg.embed_dim))
        ns = 1 + cfg.num_register_tokens
        sel = jnp.minimum(jnp.arange(S), 1)             # [S]: 0, 1, 1, ...
        special = jnp.concatenate(
            [camera_token[sel], register_tokens[sel]], axis=1)  # [S, ns, C]
        special = jnp.broadcast_to(special[None],
                                   (B, S, ns, cfg.embed_dim)
                                   ).reshape(B * S, ns, cfg.embed_dim)
        x = jnp.concatenate([special, x], axis=1)       # [B*S, T, C]
        T = x.shape[1]

        rope_f = rope_2d(cfg.rope_freq, Hp, Wp, cfg.embed_dim // cfg.num_heads)
        # global attention rope: positions repeat per frame
        rope_g = (jnp.tile(rope_f[0], (S, 1)), jnp.tile(rope_f[1], (S, 1)))

        frame_out = global_out = x
        for i in range(cfg.depth):
            # frame attention: tokens within each frame
            x = Block(cfg, name=f"frame_{i}")(x, rope_f, ns)
            frame_out = x
            # global attention: all frames jointly (special tokens of every
            # frame participate; rope only on patch tokens)
            xg = x.reshape(B, S * T, cfg.embed_dim)
            xg = _global_block(Block(cfg, name=f"global_{i}"), xg, B, S, T,
                               ns, rope_g, cfg)
            x = xg.reshape(B * S, T, cfg.embed_dim)
            global_out = x

        out = jnp.concatenate([frame_out, global_out], axis=-1)
        return out.reshape(B, S, T, 2 * cfg.embed_dim), (Hp, Wp), ns


def _global_block(block, xg, B, S, T, ns, rope_g, cfg):
    """Apply a block over the concatenated sequence with special tokens
    gathered to the front (reference keeps them in place; we reorder so a
    single n_special prefix covers all frames' specials, then restore)."""
    xg = xg.reshape(B, S, T, cfg.embed_dim)
    sp = xg[:, :, :ns].reshape(B, S * ns, cfg.embed_dim)
    pt = xg[:, :, ns:].reshape(B, -1, cfg.embed_dim)
    seq = jnp.concatenate([sp, pt], axis=1)
    seq = block(seq, rope_g, S * ns)
    sp2 = seq[:, :S * ns].reshape(B, S, ns, cfg.embed_dim)
    pt2 = seq[:, S * ns:].reshape(B, S, T - ns, cfg.embed_dim)
    return jnp.concatenate([sp2, pt2], axis=2).reshape(B, S * T, cfg.embed_dim)


class CameraHead(nn.Module):
    """Iterative pose refinement from the camera token
    (vggt/heads/camera_head.py:19-157): a small transformer trunk applied
    ``iterations`` times, each predicting a delta on the 9-d encoding."""
    cfg: VGGTConfig

    @nn.compact
    def __call__(self, camera_tokens: jnp.ndarray) -> jnp.ndarray:
        """[B, S, 2C] -> pose encodings [B, S, 9]."""
        cfg = self.cfg
        B, S, _ = camera_tokens.shape
        h = nn.Dense(cfg.embed_dim, name="input_proj")(camera_tokens)

        empty = self.param("empty_pose", nn.initializers.zeros, (1, 1, 9))
        pose = jnp.broadcast_to(empty, (B, S, 9))
        trunk = [Block(cfg, name=f"trunk_{i}")
                 for i in range(cfg.camera_trunk_depth)]
        embed_pose = nn.Dense(cfg.embed_dim, name="embed_pose")
        out_proj = nn.Dense(9, name="out_proj",
                            kernel_init=nn.initializers.zeros)
        norm = nn.LayerNorm(epsilon=1e-6, name="trunk_norm")
        for _ in range(cfg.camera_iterations):
            z = h + embed_pose(pose)
            for blk in trunk:
                z = blk(z)
            pose = pose + out_proj(norm(z))
        return pose


class DPTHead(nn.Module):
    """Dense prediction head (vggt/heads/dpt_head.py:21-497, simplified
    fusion): project patch tokens, progressively upsample with conv fusion
    to per-pixel (out_channels + confidence)."""
    cfg: VGGTConfig
    out_channels: int = 1

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, patch_hw: Tuple[int, int],
                 img_hw: Tuple[int, int]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """tokens [B,S,P,2C] (patch tokens only) -> (out [B,S,H,W,oc],
        conf [B,S,H,W])."""
        Hp, Wp = patch_hw
        H, W = img_hw
        B, S, P, C = tokens.shape
        x = tokens.reshape(B * S, Hp, Wp, C)
        x = nn.Dense(256, name="proj")(x)
        # 4 fusion stages of conv + 2x upsample (14x patch -> ~1x pixel)
        for i in range(4):
            x = nn.Conv(256 >> min(i, 2), (3, 3), padding='SAME',
                        name=f"fuse_{i}")(x)
            x = nn.relu(x)
            nh = min(Hp * (2 ** (i + 1)), H)
            nw = min(Wp * (2 ** (i + 1)), W)
            x = jax.image.resize(x, (B * S, nh, nw, x.shape[-1]),
                                 method='bilinear')
        x = jax.image.resize(x, (B * S, H, W, x.shape[-1]), method='bilinear')
        x = nn.Conv(self.out_channels + 1, (3, 3), padding='SAME',
                    name="head")(x)
        out = x[..., :self.out_channels].reshape(B, S, H, W, self.out_channels)
        conf = jax.nn.softplus(x[..., -1]).reshape(B, S, H, W)
        return out, conf


class VGGT(nn.Module):
    """Full model (vggt/models/vggt.py:18-97): aggregator + camera head +
    depth head."""
    cfg: VGGTConfig = VGGTConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        tokens, patch_hw, ns = Aggregator(self.cfg, name="aggregator")(images)
        cam_tokens = tokens[:, :, 0]
        pose_enc = CameraHead(self.cfg, name="camera_head")(cam_tokens)
        depth, conf = DPTHead(self.cfg, 1, name="depth_head")(
            tokens[:, :, ns:], patch_hw, images.shape[-2:])
        return {"pose_enc": pose_enc, "depth": depth[..., 0],
                "depth_conf": conf}


# ------------------------------------------------ pose encoding utilities

def pose_encoding_to_extri_intri(pose_enc: jnp.ndarray, image_hw):
    """9-d pose encoding -> (extrinsic w2c [..,3,4], intrinsic [..,3,3]).

    Encoding = [t(3), quat wxyz(4), fov_h, fov_w]
    (vggt/utils/pose_enc.py convention 'absT_quaR_FoV')."""
    H, W = image_hw
    t = pose_enc[..., :3]
    quat = quat_normalize(pose_enc[..., 3:7])
    fov_h = pose_enc[..., 7]
    fov_w = pose_enc[..., 8]
    R = quat_to_rotmat(quat)
    extri = jnp.concatenate([R, t[..., None]], axis=-1)
    fy = H / (2.0 * jnp.tan(fov_h / 2.0))
    fx = W / (2.0 * jnp.tan(fov_w / 2.0))
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    K = jnp.stack([
        jnp.stack([fx, z, jnp.full_like(fx, W / 2)], -1),
        jnp.stack([z, fy, jnp.full_like(fy, H / 2)], -1),
        jnp.stack([z, z, o], -1)], axis=-2)
    return extri, K


def unproject_depth_to_points(depth: jnp.ndarray, extri: jnp.ndarray,
                              K: jnp.ndarray) -> jnp.ndarray:
    """[...,H,W] depth + w2c extrinsic + K -> world points [...,H,W,3]
    (vggt/utils/geometry.py unproject_depth_map_to_point_map)."""
    H, W = depth.shape[-2:]
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing='xy')
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]

    def expand(v):
        return v[..., None, None]
    x_cam = (gx - expand(cx)) / expand(fx) * depth
    y_cam = (gy - expand(cy)) / expand(fy) * depth
    pts_cam = jnp.stack([x_cam, y_cam, depth], axis=-1)
    R = extri[..., :3, :3]
    t = extri[..., :3, 3]
    # world = R^T (cam - t)
    return jnp.einsum('...ij,...hwj->...hwi',
                      jnp.swapaxes(R, -1, -2),
                      pts_cam - t[..., None, None, :])
