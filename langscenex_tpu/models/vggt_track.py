"""VGGT track head: iterative point tracking over the frame sequence.

Parity targets: vggt/heads/track_head.py:12-108 (DPT feature extractor at
down_ratio 2 + BaseTrackerPredictor), track_modules/base_track_predictor.py
:17-209 (correlation-pyramid sampling + EfficientUpdateFormer refinement,
4 iters), track_modules/blocks.py (update transformer with 64 virtual
tracks and interleaved time/space attention; CorrBlock pyramid),
track_modules/{modules,utils}.py (post-norm residual attention blocks,
CoTracker's linear-frequency 2D flow embedding, align-corners bilinear
sampling with zero padding).

Faithful quirks preserved: the residual in Attn/CrossAttn blocks adds the
NORMALIZED input (x = norm1(x); x = x + attn(x)); the flow embedding's
frequency ramp is LINEAR (arange(0,C,2) * 1000/C), not exponential; the
state-dict key for virtual tracks is torch's historical typo
``virual_tracks``; coords refine at feature scale and are reported
multiplied back by stride.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TrackConfig:
    features: int = 128          # latent dim (feature extractor output)
    hidden_size: int = 384
    iters: int = 4
    stride: int = 2
    corr_levels: int = 7
    corr_radius: int = 4
    depth: int = 6               # time depth == space depth
    num_heads: int = 8
    mlp_ratio: float = 4.0
    num_virtual_tracks: int = 64
    max_scale: float = 518.0
    predict_conf: bool = True

    @property
    def transformer_dim(self) -> int:
        return 3 * self.features + 4


# ----------------------------------------------------------- sampling

def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray,
                    pad_zero: bool = True) -> jnp.ndarray:
    """img [H,W,C], xy [..., 2] (x, y) with align_corners=True pixel
    coords -> [..., C]; out-of-range reads 0 (padding_mode='zeros')."""
    H, W, C = img.shape
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    def tap(xi, yi, w):
        inside = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1))
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        v = img[yc, xc]
        if pad_zero:
            v = jnp.where(inside[..., None], v, 0.0)
        return v * w[..., None]

    return (tap(x0, y0, (1 - dx) * (1 - dy))
            + tap(x0 + 1, y0, dx * (1 - dy))
            + tap(x0, y0 + 1, (1 - dx) * dy)
            + tap(x0 + 1, y0 + 1, dx * dy))


def get_2d_embedding(xy: jnp.ndarray, C: int) -> jnp.ndarray:
    """[..., 2] -> [..., 2C]; CoTracker's LINEAR frequency ramp
    (track_modules/utils.py:93-124), interleaved sin/cos per axis."""
    div = (jnp.arange(0, C, 2, dtype=jnp.float32) * (1000.0 / C))

    def axis_pe(v):
        s = jnp.sin(v[..., None] * div)
        c = jnp.cos(v[..., None] * div)
        return jnp.stack([s, c], axis=-1).reshape(*v.shape, C)

    return jnp.concatenate([axis_pe(xy[..., 0]), axis_pe(xy[..., 1])], -1)


def sincos_pos_embed_2d(dim: int, HH: int, WW: int) -> jnp.ndarray:
    """[HH, WW, dim]; halves encode the x then y grids with 10000^-t
    frequencies (utils.get_2d_sincos_pos_embed:18-90)."""
    def axis(pos, d):
        omega = 1.0 / (10000.0 ** (np.arange(d // 2, dtype=np.float64)
                                   / (d / 2.0)))
        out = pos.reshape(-1)[:, None] * omega[None]
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gx, gy = np.meshgrid(np.arange(WW, dtype=np.float32),
                         np.arange(HH, dtype=np.float32), indexing="xy")
    emb = np.concatenate([axis(gx, dim // 2), axis(gy, dim // 2)], axis=1)
    return jnp.asarray(emb.reshape(HH, WW, dim), jnp.float32)


# -------------------------------------------------------------- blocks

class Mlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, name="fc2")(x)


class MHA(nn.Module):
    """torch nn.MultiheadAttention layout: fused in_proj + out_proj."""
    dim: int
    heads: int

    @nn.compact
    def __call__(self, q, kv):
        d = self.dim
        w = self.param("in_proj_weight", nn.initializers.xavier_uniform(),
                       (3 * d, d))
        b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        qp = q @ w[:d].T + b[:d]
        kp = kv @ w[d:2 * d].T + b[d:2 * d]
        vp = kv @ w[2 * d:].T + b[2 * d:]
        B, N, _ = qp.shape
        M = kp.shape[1]
        hd = d // self.heads
        qh = qp.reshape(B, N, self.heads, hd).transpose(0, 2, 1, 3)
        kh = kp.reshape(B, M, self.heads, hd).transpose(0, 2, 1, 3)
        vh = vp.reshape(B, M, self.heads, hd).transpose(0, 2, 1, 3)
        a = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", qh, kh) / math.sqrt(hd), -1)
        o = jnp.einsum("bhnm,bhmd->bhnd", a, vh)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, d)
        return nn.Dense(d, name="out_proj")(o)


class AttnBlock(nn.Module):
    """Post-norm-residual self-attention (blocks.py:148-185: the residual
    adds the NORMALIZED x)."""
    dim: int
    heads: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(name="norm1")(x)
        x = x + MHA(self.dim, self.heads, name="attn")(x, x)
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim,
                    name="mlp")(nn.LayerNorm(name="norm2")(x))
        return x


class CrossAttnBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, x, context):
        x = nn.LayerNorm(name="norm1")(x)
        ctx = nn.LayerNorm(name="norm_context")(context)
        x = x + MHA(self.dim, self.heads, name="cross_attn")(x, ctx)
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim,
                    name="mlp")(nn.LayerNorm(name="norm2")(x))
        return x


class EfficientUpdateFormer(nn.Module):
    """blocks.py:19-146: interleaved time self-attention and
    virtual-track-mediated space attention."""
    cfg: TrackConfig

    @nn.compact
    def __call__(self, x):
        """x [B, N, S, D_in] -> delta [B, N, S, features+2]."""
        c = self.cfg
        h = c.hidden_size
        x = nn.LayerNorm(name="input_norm")(x)
        tokens = nn.Dense(h, name="input_transform")(x)
        init_tokens = tokens

        B, N, S, _ = tokens.shape
        virt = self.param("virual_tracks", nn.initializers.normal(1.0),
                          (1, c.num_virtual_tracks, 1, h))
        tokens = jnp.concatenate(
            [tokens, jnp.broadcast_to(virt, (B, c.num_virtual_tracks, 1, h)
                                      ).repeat(S, axis=2)], axis=1)
        Nv = N + c.num_virtual_tracks

        j = 0
        for i in range(c.depth):
            t = tokens.reshape(B * Nv, S, h)
            t = AttnBlock(h, c.num_heads, c.mlp_ratio,
                          name=f"time_blocks_{i}")(t)
            tokens = t.reshape(B, Nv, S, h)
            if i % max(c.depth // c.depth, 1) == 0:   # every step (6//6)
                sp = tokens.transpose(0, 2, 1, 3).reshape(B * S, Nv, h)
                pts, vt = sp[:, :N], sp[:, N:]
                vt = CrossAttnBlock(h, c.num_heads, c.mlp_ratio,
                                    name=f"space_virtual2point_blocks_{j}"
                                    )(vt, pts)
                vt = AttnBlock(h, c.num_heads, c.mlp_ratio,
                               name=f"space_virtual_blocks_{j}")(vt)
                pts = CrossAttnBlock(h, c.num_heads, c.mlp_ratio,
                                     name=f"space_point2virtual_blocks_{j}"
                                     )(pts, vt)
                sp = jnp.concatenate([pts, vt], axis=1)
                tokens = sp.reshape(B, S, Nv, h).transpose(0, 2, 1, 3)
                j += 1

        tokens = tokens[:, :N] + init_tokens
        tokens = nn.LayerNorm(name="output_norm")(tokens)
        return nn.Dense(c.features + 2, name="flow_head")(tokens)


# ------------------------------------------------------------- tracker

def corr_pyramid(fmaps: jnp.ndarray, levels: int):
    """fmaps [B,S,H,W,C] -> list of avg-pooled levels (floor semantics of
    torch avg_pool2d k=2 s=2)."""
    pyr = [fmaps]
    cur = fmaps
    for _ in range(levels - 1):
        B, S, H, W, C = cur.shape
        He, We = (H // 2) * 2, (W // 2) * 2
        c = cur[:, :, :He, :We].reshape(B, S, He // 2, 2, We // 2, 2, C)
        cur = c.mean(axis=(3, 5))
        pyr.append(cur)
    return pyr


def corr_sample(pyr, targets: jnp.ndarray, coords: jnp.ndarray,
                radius: int) -> jnp.ndarray:
    """targets [B,S,N,C], coords [B,S,N,2] full-res -> [B,S,N,L]
    (CorrBlock.corr_sample, blocks.py:186-240)."""
    r = radius
    d1 = jnp.arange(-r, r + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(d1, d1, indexing="ij")
    dxy = jnp.stack([dx, dy], axis=-1)           # [2r+1, 2r+1, (x, y)]
    N = targets.shape[2]
    out = []
    for i, fm in enumerate(pyr):
        B, S, H, W, C = fm.shape
        corr = jnp.einsum("bsnc,bshwc->bsnhw", targets, fm) / math.sqrt(C)
        cl = coords / (2.0 ** i)
        pts = cl[:, :, :, None, None, :] + dxy[None, None, None]
        samp = jax.vmap(jax.vmap(
            lambda c2d, xy: bilinear_sample(c2d[..., None], xy)[..., 0]))(
            corr.reshape(B, S * N, H, W),
            pts.reshape(B, S * N, 2 * r + 1, 2 * r + 1, 2))
        out.append(samp.reshape(B, S, N, -1))
    return jnp.concatenate(out, axis=-1)


class BaseTrackerPredictor(nn.Module):
    """base_track_predictor.py:17-209."""
    cfg: TrackConfig

    @nn.compact
    def __call__(self, query_points: jnp.ndarray, fmaps: jnp.ndarray,
                 iters: Optional[int] = None):
        """query_points [B,N,2] full-res pixels; fmaps [B,S,H,W,C]
        (feature scale). Returns (coord_preds list, vis, conf)."""
        c = self.cfg
        iters = iters or c.iters
        B, N, _ = query_points.shape
        _, S, HH, WW, C = fmaps.shape

        fmaps = nn.LayerNorm(name="fmap_norm")(fmaps)
        qp = query_points / float(c.stride)
        coords = jnp.broadcast_to(qp[:, None], (B, S, N, 2))

        sample_b = jax.vmap(lambda img, xy: bilinear_sample(img, xy))
        query_feat = sample_b(fmaps[:, 0], coords[:, 0])      # [B,N,C]
        track_feats = jnp.broadcast_to(query_feat[:, None], (B, S, N, C))

        pyr = corr_pyramid(fmaps, c.corr_levels)
        pos_grid = sincos_pos_embed_2d(c.transformer_dim, HH, WW)
        pos_of_query = sample_b(
            jnp.broadcast_to(pos_grid[None], (B,) + pos_grid.shape),
            coords[:, 0])                                     # [B,N,D]

        corr_mlp = Mlp(c.hidden_size, c.features, name="corr_mlp")
        former = EfficientUpdateFormer(c, name="updateformer")
        ffeat_norm = nn.LayerNorm(name="ffeat_norm")
        ffeat_updater = nn.Dense(c.features, name="ffeat_updater_0")
        qr_token = self.param("query_ref_token",
                              nn.initializers.normal(1.0),
                              (1, 2, c.transformer_dim))

        coord_preds = []
        for _ in range(iters):
            coords = jax.lax.stop_gradient(coords)
            fcorrs = corr_sample(pyr, track_feats, coords, c.corr_radius)
            fcorrs = corr_mlp(fcorrs)                         # [B,S,N,feat]

            flows = coords - coords[:, 0:1]                   # [B,S,N,2]
            femb = get_2d_embedding(flows, c.features // 2)
            femb = jnp.concatenate(
                [femb, flows / c.max_scale, flows / c.max_scale], axis=-1)

            x = jnp.concatenate([femb, fcorrs, track_feats], axis=-1)
            x = x + pos_of_query[:, None]                     # [B,S,N,D]
            ref = jnp.concatenate(
                [qr_token[:, 0:1],
                 jnp.broadcast_to(qr_token[:, 1:2],
                                  (1, S - 1, c.transformer_dim))], axis=1)
            x = x + ref[:, :, None]
            x = x.transpose(0, 2, 1, 3)                       # [B,N,S,D]

            delta = former(x)                                 # [B,N,S,f+2]
            delta = delta.transpose(0, 2, 1, 3)               # [B,S,N,f+2]
            dc = delta[..., :2]
            df = delta[..., 2:]
            # ffeat_updater = Linear + GELU; residual on track feats
            track_feats = track_feats + jax.nn.gelu(
                ffeat_updater(ffeat_norm(df)), approximate=False)
            coords = coords + dc
            # force frame 0 back to the query positions (:186-189)
            coords = coords.at[:, 0].set(jnp.broadcast_to(qp, (B, N, 2)))
            coord_preds.append(coords * c.stride)

        vis = nn.Dense(1, name="vis_predictor_0")(track_feats)[..., 0]
        vis = jax.nn.sigmoid(vis)
        conf = None
        if c.predict_conf:
            conf = nn.Dense(1, name="conf_predictor_0")(track_feats)[..., 0]
            conf = jax.nn.sigmoid(conf)
        return coord_preds, vis, conf
