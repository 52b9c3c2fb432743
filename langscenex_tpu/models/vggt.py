"""VGGT (Visual Geometry Grounded Transformer) in flax: feed-forward
camera pose + dense geometry from unposed images.

Parity targets (structure is 1:1 weight-mappable via
utils/convert.convert_vggt, validated numerically in tests/test_vggt.py):
  vggt/models/aggregator.py:24-331   alternating frame/global attention over
                                     DINOv2 ViT-L/14-reg patch tokens +
                                     camera/register tokens, 2D RoPE, qk-norm,
                                     LayerScale; per-layer [B,S,T,2C]
                                     intermediates (frame||global concat)
  vggt/layers/vision_transformer.py  DINOv2 ViT patch embed (cls + 4 register
                                     tokens, interpolated pos embed, 24 blocks)
  vggt/models/vggt.py:18-97          camera_head + depth_head + point_head
  vggt/heads/camera_head.py:19-157   iterative adaLN-modulated 9-d pose
                                     refinement (4 iters, detached deltas)
  vggt/heads/dpt_head.py:21-497      multi-scale DPT: per-layer projection,
                                     resize pyramid, FeatureFusionBlock
                                     refinement, uv sincos pos embeds
  vggt/heads/head_act.py             activate_pose / activate_head
  vggt/utils/pose_enc.py             9-d encoding = [t(3), quat(4), fov(2)]

TPU-first: the frame/global attention alternation is two reshapes of one
token tensor [B*S, T, C] <-> [B, S*T, C] — exactly the layout XLA wants;
attention is fused jnp einsum (bf16-able via attn_dtype). RoPE is applied
positionally (special tokens sit at position 0 = identity rotation), so no
token reordering is ever needed. The whole model jits as one program. The
track head (vggt/heads/track_head.py + models/vggt_track.py, enabled via
cfg.enable_track_head) runs when query_points are given, matching
vggt/models/vggt.py:87-93; the reference pipeline's pose path never
invokes it (pose_estimator/__init__.py consumes camera+depth heads only).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.quat import quat_to_rotmat, quat_normalize

_RESNET_MEAN = (0.485, 0.456, 0.406)
_RESNET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class VGGTConfig:
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024          # aggregator AA-block width
    depth: int = 24                # alternating frame/global pairs
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    qk_norm: bool = True
    rope_freq: float = 100.0
    layerscale_init: float = 0.01
    # DINOv2 patch-embed ViT (vit_large defaults; aggregator.py:146-181)
    vit_embed_dim: int = 1024
    vit_depth: int = 24
    vit_num_heads: int = 16
    vit_layerscale_init: float = 1.0
    # heads
    camera_trunk_depth: int = 4
    camera_iterations: int = 4
    intermediate_layers: Tuple[int, int, int, int] = (4, 11, 17, 23)
    dpt_features: int = 256
    dpt_out_channels: Tuple[int, int, int, int] = (256, 512, 1024, 1024)
    enable_depth_head: bool = True
    enable_point_head: bool = True
    # track head (vggt/heads/track_head.py:18-29 defaults)
    enable_track_head: bool = False
    track_features: int = 128
    track_iters: int = 4
    track_corr_levels: int = 7
    track_corr_radius: int = 4
    track_depth: int = 6
    track_hidden: int = 384
    track_virtual: int = 64
    track_num_heads: int = 8
    attn_dtype: jnp.dtype = jnp.float32

    @property
    def vit_pos_grid(self) -> int:
        # sqrt(num_patches) of the pretraining pos embed (518/14 = 37)
        return self.img_size // self.patch_size


# ---------------------------------------------------------------- layers

def apply_rope_2d(t: jnp.ndarray, pos: jnp.ndarray,
                  freq: float) -> jnp.ndarray:
    """2D RoPE exactly as vggt/layers/rope.py:62-188: the head dim splits
    into a vertical half (rotated by pos y) and a horizontal half (pos x);
    within each half, NeoX-style rotate_half with angles repeated twice.

    t: [B, H, N, hd]; pos: [N, 2] float (y, x). Position 0 = identity, so
    special tokens simply carry position 0."""
    hd = t.shape[-1]
    half = hd // 2
    quarter = half // 2
    exponents = jnp.arange(0, half, 2, dtype=jnp.float32) / half
    inv_freq = 1.0 / (freq ** exponents)                    # [quarter]

    def rotate(x_half, p):
        ang = p[:, None] * inv_freq                          # [N, quarter]
        ang = jnp.concatenate([ang, ang], axis=-1)           # [N, half]
        cos = jnp.cos(ang)
        sin = jnp.sin(ang)
        x1 = x_half[..., :quarter]
        x2 = x_half[..., quarter:]
        rot = jnp.concatenate([-x2, x1], axis=-1)
        return x_half * cos + rot * sin

    v = t[..., :half]
    h = t[..., half:]
    return jnp.concatenate([rotate(v, pos[:, 0]), rotate(h, pos[:, 1])],
                           axis=-1)


class SelfAttention(nn.Module):
    """vggt/layers/attention.py:21-77 (fused qkv, optional per-head qk
    LayerNorm, optional 2D RoPE, softmax(QK/sqrt(hd))V)."""
    num_heads: int
    qk_norm: bool = False
    rope_freq: Optional[float] = None
    ln_eps: float = 1e-5
    attn_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos: Optional[jnp.ndarray] = None):
        B, N, C = x.shape
        H = self.num_heads
        hd = C // H
        qkv = nn.Dense(3 * C, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]                     # [B,H,N,hd]
        if self.qk_norm:
            q = nn.LayerNorm(epsilon=self.ln_eps, name="q_norm")(q)
            k = nn.LayerNorm(epsilon=self.ln_eps, name="k_norm")(k)
        if self.rope_freq is not None and pos is not None:
            q = apply_rope_2d(q, pos, self.rope_freq)
            k = apply_rope_2d(k, pos, self.rope_freq)
        scale = 1.0 / math.sqrt(hd)
        logits = jnp.einsum('bhqd,bhkd->bhqk', q.astype(self.attn_dtype),
                            k.astype(self.attn_dtype),
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits * scale, axis=-1).astype(self.attn_dtype)
        o = jnp.einsum('bhqk,bhkd->bhqd', p, v.astype(self.attn_dtype),
                       preferred_element_type=jnp.float32)
        o = o.astype(x.dtype).transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, name="proj")(o)


class LayerScale(nn.Module):
    dim: int
    init: float

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init),
                           (self.dim,))
        return x * gamma


class ViTBlock(nn.Module):
    """vggt/layers/block.py:27-107: pre-LN attention + MLP with optional
    LayerScale / qk-norm / RoPE. GELU is exact (torch nn.GELU default)."""
    num_heads: int
    mlp_ratio: float = 4.0
    ls_init: Optional[float] = None
    qk_norm: bool = False
    rope_freq: Optional[float] = None
    ln_eps: float = 1e-5
    attn_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos: Optional[jnp.ndarray] = None):
        C = x.shape[-1]
        h = nn.LayerNorm(epsilon=self.ln_eps, name="norm1")(x)
        h = SelfAttention(self.num_heads, self.qk_norm, self.rope_freq,
                          self.ln_eps, self.attn_dtype, name="attn")(h, pos)
        if self.ls_init is not None:
            h = LayerScale(C, self.ls_init, name="ls1")(h)
        x = x + h
        h = nn.LayerNorm(epsilon=self.ln_eps, name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, name="mlp_fc2")(h)
        if self.ls_init is not None:
            h = LayerScale(C, self.ls_init, name="ls2")(h)
        return x + h


# ------------------------------------------------------------ DINOv2 ViT

class DinoViT(nn.Module):
    """DINOv2 ViT-L/14 with register tokens
    (vggt/layers/vision_transformer.py:42-340): conv patch embed, cls +
    register tokens, bicubic-interpolated pos embed, pre-LN blocks with
    LayerScale(1.0), final LayerNorm. Returns patch tokens only
    (x_norm_patchtokens)."""
    cfg: VGGTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [N, 3, H, W] (already resnet-normalized) -> [N, P, C]."""
        cfg = self.cfg
        p = cfg.patch_size
        C = cfg.vit_embed_dim
        N, _, H, W = x.shape
        Hp, Wp = H // p, W // p
        feat = nn.Conv(C, (p, p), strides=(p, p), name="patch_embed_proj")(
            x.transpose(0, 2, 3, 1))
        feat = feat.reshape(N, Hp * Wp, C)

        cls_token = self.param("cls_token", nn.initializers.normal(1e-6),
                               (1, 1, C))
        G = cfg.vit_pos_grid
        pos_embed = self.param("pos_embed",
                               nn.initializers.normal(0.02),
                               (1, 1 + G * G, C))
        register_tokens = self.param(
            "register_tokens", nn.initializers.normal(1e-6),
            (1, cfg.num_register_tokens, C))

        tok = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (N, 1, C)), feat], axis=1)
        tok = tok + self._interp_pos(pos_embed, Hp, Wp, G, C)
        tok = jnp.concatenate(
            [tok[:, :1],
             jnp.broadcast_to(register_tokens,
                              (N, cfg.num_register_tokens, C)),
             tok[:, 1:]], axis=1)

        for i in range(cfg.vit_depth):
            tok = ViTBlock(cfg.vit_num_heads, cfg.mlp_ratio,
                           ls_init=cfg.vit_layerscale_init, qk_norm=False,
                           ln_eps=1e-6, attn_dtype=cfg.attn_dtype,
                           name=f"blocks_{i}")(tok)
        tok = nn.LayerNorm(epsilon=1e-6, name="norm")(tok)
        return tok[:, 1 + cfg.num_register_tokens:]

    @staticmethod
    def _interp_pos(pos_embed, Hp, Wp, G, C):
        """vision_transformer.py:183-215: torch-convention bicubic
        (VGGT passes interpolate_offset=0 so the target is an exact output
        size; torch antialias only matters when downscaling below the 37x37
        pretraining grid, which the pipeline never does). Identity at the
        pretraining grid."""
        if (Hp, Wp) == (G, G):
            return pos_embed
        from ..ops.interp import resize_bicubic_torch
        cls_pos = pos_embed[:, :1]
        patch_pos = pos_embed[:, 1:].reshape(1, G, G, C)
        patch_pos = resize_bicubic_torch(patch_pos, (Hp, Wp))
        return jnp.concatenate(
            [cls_pos, patch_pos.reshape(1, Hp * Wp, C)], axis=1)


# ------------------------------------------------------------- Aggregator

class Aggregator(nn.Module):
    """Alternating frame/global attention (aggregator.py:187-305).

    Returns ({layer_idx: [B,S,T,2C] frame||global concat intermediates for
    every needed index}, (Hp, Wp), patch_start_idx). Only the layers the
    heads consume are materialized (camera head needs depth-1, DPT heads
    need cfg.intermediate_layers) — the reference keeps all 24."""
    cfg: VGGTConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        cfg = self.cfg
        B, S, _, H, W = images.shape
        p = cfg.patch_size
        Hp, Wp = H // p, W // p
        C = cfg.embed_dim

        mean = jnp.asarray(_RESNET_MEAN).reshape(1, 1, 3, 1, 1)
        std = jnp.asarray(_RESNET_STD).reshape(1, 1, 3, 1, 1)
        x = (images - mean) / std
        patch_tokens = DinoViT(cfg, name="patch_embed")(
            x.reshape(B * S, 3, H, W))                       # [B*S, P, C]

        # two sets of special tokens: index 0 for the first frame (anchors
        # the world frame), index 1 for all others (aggregator.py:123-133,
        # slice_expand_and_flatten :308-331)
        camera_token = self.param("camera_token",
                                  nn.initializers.normal(1e-6),
                                  (1, 2, 1, C))
        register_token = self.param("register_token",
                                    nn.initializers.normal(1e-6),
                                    (1, 2, cfg.num_register_tokens, C))
        ns = 1 + cfg.num_register_tokens
        sel = jnp.minimum(jnp.arange(S), 1)                  # 0, 1, 1, ...
        special = jnp.concatenate(
            [camera_token[0][sel], register_token[0][sel]], axis=1)
        special = jnp.broadcast_to(special[None], (B, S, ns, C)
                                   ).reshape(B * S, ns, C)
        tokens = jnp.concatenate([special, patch_tokens], axis=1)
        T = tokens.shape[1]

        # positions: patch grid (y, x) + 1; special tokens at 0 (identity
        # rotation) — aggregator.py:226-234
        ys, xs = jnp.meshgrid(jnp.arange(Hp, dtype=jnp.float32),
                              jnp.arange(Wp, dtype=jnp.float32),
                              indexing="ij")
        grid = jnp.stack([ys.reshape(-1), xs.reshape(-1)], axis=-1) + 1.0
        pos_f = jnp.concatenate([jnp.zeros((ns, 2)), grid], axis=0)  # [T,2]
        pos_g = jnp.tile(pos_f, (S, 1))                      # [S*T, 2]

        needed = sorted(set(cfg.intermediate_layers) | {cfg.depth - 1})
        inters: Dict[int, jnp.ndarray] = {}
        for i in range(cfg.depth):
            tokens = ViTBlock(cfg.num_heads, cfg.mlp_ratio,
                              ls_init=cfg.layerscale_init,
                              qk_norm=cfg.qk_norm, rope_freq=cfg.rope_freq,
                              attn_dtype=cfg.attn_dtype,
                              name=f"frame_blocks_{i}")(tokens, pos_f)
            frame_out = tokens
            xg = tokens.reshape(B, S * T, C)
            xg = ViTBlock(cfg.num_heads, cfg.mlp_ratio,
                          ls_init=cfg.layerscale_init,
                          qk_norm=cfg.qk_norm, rope_freq=cfg.rope_freq,
                          attn_dtype=cfg.attn_dtype,
                          name=f"global_blocks_{i}")(xg, pos_g)
            tokens = xg.reshape(B * S, T, C)
            if i in needed:
                inters[i] = jnp.concatenate([frame_out, tokens], axis=-1
                                            ).reshape(B, S, T, 2 * C)
        return inters, (Hp, Wp), ns


# ------------------------------------------------------------ camera head

class CameraHead(nn.Module):
    """Iterative adaLN pose refinement (vggt/heads/camera_head.py:19-162):
    each iteration embeds the (detached) previous 9-d encoding, modulates
    the normalized camera tokens (gate * (adaln(x)*(1+scale)+shift) + x),
    runs a 4-block trunk at 2C width, and adds an MLP delta. Output fov
    channels pass through relu (fl_act)."""
    cfg: VGGTConfig

    @nn.compact
    def __call__(self, camera_tokens: jnp.ndarray) -> jnp.ndarray:
        """[B, S, 2C] -> activated pose encodings [B, S, 9]."""
        cfg = self.cfg
        B, S, dim = camera_tokens.shape
        pose_tokens = nn.LayerNorm(epsilon=1e-5, name="token_norm")(
            camera_tokens)

        empty = self.param("empty_pose_tokens", nn.initializers.zeros,
                           (1, 1, 9))
        embed_pose = nn.Dense(dim, name="embed_pose")
        modulation = nn.Dense(3 * dim, name="poseLN_modulation")
        adaln = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                             name="adaln_norm")
        trunk = [ViTBlock(cfg.num_heads, cfg.mlp_ratio,
                          ls_init=cfg.layerscale_init, qk_norm=False,
                          attn_dtype=cfg.attn_dtype, name=f"trunk_{i}")
                 for i in range(cfg.camera_trunk_depth)]
        trunk_norm = nn.LayerNorm(epsilon=1e-5, name="trunk_norm")
        branch_fc1 = nn.Dense(dim // 2, name="pose_branch_fc1")
        branch_fc2 = nn.Dense(9, name="pose_branch_fc2")

        pred = None
        for _ in range(cfg.camera_iterations):
            if pred is None:
                inp = embed_pose(jnp.broadcast_to(empty, (B, S, 9)))
            else:
                inp = embed_pose(jax.lax.stop_gradient(pred))
            smg = modulation(nn.silu(inp))
            shift, scale, gate = jnp.split(smg, 3, axis=-1)
            z = gate * (adaln(pose_tokens) * (1 + scale) + shift)
            z = z + pose_tokens
            for blk in trunk:
                z = blk(z)
            h = branch_fc1(trunk_norm(z))
            h = nn.gelu(h, approximate=False)
            delta = branch_fc2(h)
            pred = delta if pred is None else pred + delta
        # activate_pose: trans/quat linear, fov relu (head_act.py:12-35)
        return jnp.concatenate([pred[..., :7], nn.relu(pred[..., 7:])],
                               axis=-1)


# --------------------------------------------------------------- DPT head

def resize_bilinear_ac(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (torch F.interpolate
    semantics used throughout dpt_head.py), channels-last [..., H, W, C].
    Expressed as two small dense matmuls — MXU-friendly."""
    Ho, Wo = size
    Hi, Wi = x.shape[-3], x.shape[-2]

    def weights(n_out, n_in):
        if n_out == 1 or n_in == 1:
            idx = jnp.zeros((n_out,))
        else:
            idx = jnp.arange(n_out) * (n_in - 1) / (n_out - 1)
        lo = jnp.clip(jnp.floor(idx).astype(jnp.int32), 0, n_in - 1)
        hi = jnp.minimum(lo + 1, n_in - 1)
        f = idx - lo
        A = jnp.zeros((n_out, n_in))
        A = A.at[jnp.arange(n_out), lo].add(1 - f)
        A = A.at[jnp.arange(n_out), hi].add(f)
        return A

    Ah = weights(Ho, Hi)
    Aw = weights(Wo, Wi)
    y = jnp.einsum('oh,...hwc->...owc', Ah, x)
    return jnp.einsum('pw,...owc->...opc', Aw, y)


def _uv_pos_embed(Hp: int, Wp: int, dim: int, aspect: float) -> jnp.ndarray:
    """create_uv_grid + position_grid_to_embed (vggt/heads/utils.py):
    normalized uv grid -> split-channel sincos embedding [Hp, Wp, dim]."""
    diag = math.sqrt(aspect * aspect + 1.0)
    span_x = aspect / diag
    span_y = 1.0 / diag
    xs = jnp.linspace(-span_x * (Wp - 1) / Wp, span_x * (Wp - 1) / Wp, Wp)
    ys = jnp.linspace(-span_y * (Hp - 1) / Hp, span_y * (Hp - 1) / Hp, Hp)
    uu, vv = jnp.meshgrid(xs, ys, indexing="xy")             # [Hp, Wp]

    def sincos(pos, d):
        omega = jnp.arange(d // 2, dtype=jnp.float32) / (d / 2.0)
        omega = 1.0 / (100.0 ** omega)
        out = pos.reshape(-1)[:, None] * omega
        return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=-1)

    emb = jnp.concatenate([sincos(uu, dim // 2), sincos(vv, dim // 2)],
                          axis=-1)
    return emb.reshape(Hp, Wp, dim)


class StridedDeconv(nn.Module):
    """ConvTranspose2d with stride == kernel (dpt_head.py:83-96 resize
    layers): each input pixel expands to a k x k block — a single matmul +
    reshape on TPU. Weight kept in the torch layout (Cin, Cout, k, k) so
    the converter copies it verbatim."""
    out_ch: int
    k: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, Cin = x.shape
        w = self.param("weight", nn.initializers.lecun_normal(),
                       (Cin, self.out_ch, self.k, self.k))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        y = jnp.einsum('bhwc,cokl->bhkwlo', x, w)
        y = y.reshape(B, H * self.k, W * self.k, self.out_ch)
        return y + b


class ResidualConvUnit(nn.Module):
    """dpt_head.py:357-399: x + conv(relu(conv(relu(x))))."""
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(h)
        return h + x


class FeatureFusionBlock(nn.Module):
    """dpt_head.py:402-469: optional lateral residual, refine, bilinear
    upsample (align_corners), 1x1 out conv."""
    features: int
    has_residual: bool = True

    @nn.compact
    def __call__(self, x, res=None, size=None):
        if self.has_residual:
            x = x + ResidualConvUnit(self.features, name="resConfUnit1")(res)
        x = ResidualConvUnit(self.features, name="resConfUnit2")(x)
        if size is None:
            size = (x.shape[-3] * 2, x.shape[-2] * 2)
        x = resize_bilinear_ac(x, size)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


def activate_head(x: jnp.ndarray, activation: str, conf_activation: str):
    """vggt/heads/head_act.py:61-112 on channels-last input: split the last
    channel off as confidence."""
    val = x[..., :-1]
    conf = x[..., -1]
    if activation == "exp":
        out = jnp.exp(val)
    elif activation == "inv_log":
        out = jnp.sign(val) * jnp.expm1(jnp.abs(val))
    elif activation == "norm_exp":
        d = jnp.maximum(jnp.linalg.norm(val, axis=-1, keepdims=True), 1e-8)
        out = val / d * jnp.expm1(d)
    elif activation == "linear":
        out = val
    elif activation == "relu":
        out = nn.relu(val)
    else:
        raise ValueError(f"unknown activation {activation}")
    if conf_activation == "expp1":
        conf_out = 1.0 + jnp.exp(conf)
    elif conf_activation == "expp0":
        conf_out = jnp.exp(conf)
    elif conf_activation == "sigmoid":
        conf_out = jax.nn.sigmoid(conf)
    else:
        raise ValueError(f"unknown conf_activation {conf_activation}")
    return out, conf_out


class DPTHead(nn.Module):
    """Faithful DPT head (vggt/heads/dpt_head.py:21-304): LayerNorm the
    2C tokens of 4 intermediate aggregator layers, project to the pyramid
    channels, add 0.1x uv sincos pos embeds, build the 4-scale resize
    pyramid, refine through FeatureFusionBlocks coarse->fine, then the
    output convs + activation split (prediction, confidence)."""
    cfg: VGGTConfig
    output_dim: int = 2
    activation: str = "exp"
    conf_activation: str = "expp1"
    pos_embed: bool = True
    feature_only: bool = False   # track path: stop after output_conv1
    down_ratio: int = 1          # output resolution divisor (track: 2)
    features: Optional[int] = None  # override cfg.dpt_features (track: 128)

    @nn.compact
    def __call__(self, inter_list: Sequence[jnp.ndarray],
                 patch_hw: Tuple[int, int], img_hw: Tuple[int, int]):
        """inter_list: 4 tensors [B, S, P, 2C] (patch tokens only, ordered
        per cfg.intermediate_layers) -> (out [B,S,H,W,output_dim-1],
        conf [B,S,H,W])."""
        cfg = self.cfg
        Hp, Wp = patch_hw
        H, W = img_hw
        feats = self.features if self.features is not None \
            else cfg.dpt_features
        oc = cfg.dpt_out_channels
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")

        pyramid: List[jnp.ndarray] = []
        B = S = None
        for i, t in enumerate(inter_list):
            B, S, P, Cin = t.shape
            x = norm(t.reshape(B * S, P, Cin))
            x = x.reshape(B * S, Hp, Wp, Cin)
            x = nn.Conv(oc[i], (1, 1), name=f"projects_{i}")(x)
            if self.pos_embed:
                x = x + 0.1 * _uv_pos_embed(Hp, Wp, oc[i], W / H)
            if i == 0:
                x = StridedDeconv(oc[0], 4, name="resize_layers_0")(x)
            elif i == 1:
                x = StridedDeconv(oc[1], 2, name="resize_layers_1")(x)
            elif i == 3:
                x = nn.Conv(oc[3], (3, 3), strides=(2, 2), padding=1,
                            name="resize_layers_3")(x)
            pyramid.append(x)

        l1 = nn.Conv(feats, (3, 3), padding=1, use_bias=False,
                     name="layer1_rn")(pyramid[0])
        l2 = nn.Conv(feats, (3, 3), padding=1, use_bias=False,
                     name="layer2_rn")(pyramid[1])
        l3 = nn.Conv(feats, (3, 3), padding=1, use_bias=False,
                     name="layer3_rn")(pyramid[2])
        l4 = nn.Conv(feats, (3, 3), padding=1, use_bias=False,
                     name="layer4_rn")(pyramid[3])

        out = FeatureFusionBlock(feats, has_residual=False,
                                 name="refinenet4")(l4, size=l3.shape[1:3])
        out = FeatureFusionBlock(feats, name="refinenet3")(
            out, l3, size=l2.shape[1:3])
        out = FeatureFusionBlock(feats, name="refinenet2")(
            out, l2, size=l1.shape[1:3])
        out = FeatureFusionBlock(feats, name="refinenet1")(out, l1)

        # feature_only keeps full width in output_conv1 and returns the
        # fused features (dpt_head.py:114-118, 243-253)
        c1 = feats if self.feature_only else feats // 2
        out = nn.Conv(c1, (3, 3), padding=1, name="output_conv1")(out)
        out = resize_bilinear_ac(
            out, (Hp * cfg.patch_size // self.down_ratio,
                  Wp * cfg.patch_size // self.down_ratio))
        if self.pos_embed:
            out = out + 0.1 * _uv_pos_embed(out.shape[1], out.shape[2],
                                            out.shape[-1], W / H)
        if self.feature_only:
            return out.reshape(B, S, *out.shape[1:])
        out = nn.Conv(32, (3, 3), padding=1, name="output_conv2_0")(out)
        out = nn.relu(out)
        out = nn.Conv(self.output_dim, (1, 1), name="output_conv2_2")(out)
        pred, conf = activate_head(out, self.activation,
                                   self.conf_activation)
        pred = pred.reshape(B, S, *pred.shape[1:])
        conf = conf.reshape(B, S, *conf.shape[1:])
        return pred, conf


# -------------------------------------------------------------- full model

class TrackHead(nn.Module):
    """vggt/heads/track_head.py:12-108: DPT feature extractor (feature-only,
    down_ratio 2, no pos embed) + BaseTrackerPredictor refinement."""
    cfg: VGGTConfig

    @nn.compact
    def __call__(self, inter_list, patch_hw, img_hw, query_points,
                 iters: Optional[int] = None):
        from .vggt_track import BaseTrackerPredictor, TrackConfig
        tc = TrackConfig(features=self.cfg.track_features,
                         iters=self.cfg.track_iters,
                         corr_levels=self.cfg.track_corr_levels,
                         corr_radius=self.cfg.track_corr_radius,
                         depth=self.cfg.track_depth,
                         hidden_size=self.cfg.track_hidden,
                         num_virtual_tracks=self.cfg.track_virtual,
                         num_heads=self.cfg.track_num_heads)
        fmaps = DPTHead(self.cfg, feature_only=True, down_ratio=2,
                        pos_embed=False, features=tc.features,
                        name="feature_extractor")(
            inter_list, patch_hw, img_hw)          # [B,S,h,w,features]
        return BaseTrackerPredictor(tc, name="tracker")(
            query_points, fmaps, iters=iters)


class VGGT(nn.Module):
    """Full model (vggt/models/vggt.py:18-97): aggregator + camera head +
    depth head (+ point head, + track head when query_points given)."""
    cfg: VGGTConfig = VGGTConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray,
                 query_points: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        inters, patch_hw, ns = Aggregator(cfg, name="aggregator")(images)
        last = inters[cfg.depth - 1]
        pose_enc = CameraHead(cfg, name="camera_head")(last[:, :, 0])
        out = {"pose_enc": pose_enc}
        dpt_in = [inters[i][:, :, ns:] for i in cfg.intermediate_layers]
        if cfg.enable_depth_head:
            depth, conf = DPTHead(cfg, output_dim=2, activation="exp",
                                  name="depth_head")(
                dpt_in, patch_hw, images.shape[-2:])
            out["depth"] = depth[..., 0]
            out["depth_conf"] = conf
        if cfg.enable_point_head:
            pts, pconf = DPTHead(cfg, output_dim=4, activation="inv_log",
                                 name="point_head")(
                dpt_in, patch_hw, images.shape[-2:])
            out["world_points"] = pts
            out["world_points_conf"] = pconf
        if cfg.enable_track_head and query_points is not None:
            # vggt/models/vggt.py:87-93: last coord_pred is the output
            track_list, vis, conf_t = TrackHead(cfg, name="track_head")(
                dpt_in, patch_hw, images.shape[-2:], query_points)
            out["track"] = track_list[-1]
            out["vis"] = vis
            out["conf"] = conf_t
        return out


# ------------------------------------------------ pose encoding utilities

def pose_encoding_to_extri_intri(pose_enc: jnp.ndarray, image_hw):
    """9-d pose encoding -> (extrinsic w2c [..,3,4], intrinsic [..,3,3]).

    Encoding = [t(3), quat wxyz(4), fov_h, fov_w]
    (vggt/utils/pose_enc.py convention 'absT_quaR_FoV')."""
    H, W = image_hw
    t = pose_enc[..., :3]
    quat = quat_normalize(pose_enc[..., 3:7])
    # relu-activated fovs can be exactly 0 at random init; clamp so the
    # focal division below stays finite (no-op for real checkpoints)
    fov_h = jnp.maximum(pose_enc[..., 7], 1e-5)
    fov_w = jnp.maximum(pose_enc[..., 8], 1e-5)
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
