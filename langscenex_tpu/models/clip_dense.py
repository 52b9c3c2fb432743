"""Native CLIP vision encoder with dense per-pixel embeddings.

TPU-native replacement for the reference's OpenSeg TF SavedModel feature
extractor (field_construction/preprocessor.py:22-90): OpenSeg emits 768-d
per-pixel CLIP-aligned embeddings; a CLIP ViT-L/14 with the MaskCLIP
value-embedding readout emits per-PATCH embeddings in the same joint
text/image space and the same 768-d projection width, which we resize to
pixels — the identical downstream contract (mask-pool per segment id,
L2-normalize; models/openseg.mask_pool_features).

Dense readout: standard CLIP pools through the CLS token only, so patch
tokens never pass the final attention. MaskCLIP's trick (arXiv 2112.01071
§3.2): in the LAST block replace softmax attention with the identity map —
each token attends to itself — so out_i = OutProj(V(x_i)); then residual,
MLP, post-LN, and the visual projection apply per token. This keeps every
pretrained weight and yields dense features that score against CLIP text
embeddings.

Weights: utils/convert.convert_clip_vision maps the HuggingFace
``CLIPVisionModelWithProjection`` state_dict (openai/clip-vit-large-
patch14); the converter is verified numerically against torch at random
init in tests/test_clip_dense.py. Position embeddings are bilinearly
interpolated for non-224 inputs, so frames render at native aspect.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    patch_size: int = 14
    image_size: int = 224          # grid the position table was trained at
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    cfg: "CLIPVisionConfig"

    @nn.compact
    def __call__(self, x, identity_attn: bool = False,
                 causal: bool = False):
        c = self.cfg
        v = nn.Dense(c.hidden_size, name="v_proj")(x)
        if identity_attn:
            # MaskCLIP readout: attention map = I, so q/k are unused.
            out = v
        else:
            q = nn.Dense(c.hidden_size, name="q_proj")(x)
            k = nn.Dense(c.hidden_size, name="k_proj")(x)
            B, T, _ = x.shape
            split = lambda t: t.reshape(B, T, c.num_heads, c.head_dim)
            attn = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k))
            attn = attn * (c.head_dim ** -0.5)
            if causal:
                i = jnp.arange(T)[:, None]
                j = jnp.arange(T)[None, :]
                attn = jnp.where(j <= i, attn, -1e9)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, split(v))
            out = out.reshape(B, T, c.hidden_size)
        return nn.Dense(c.hidden_size, name="out_proj")(out)


class CLIPBlock(nn.Module):
    cfg: "CLIPVisionConfig"

    @nn.compact
    def __call__(self, x, identity_attn: bool = False,
                 causal: bool = False):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm1")(x)
        x = x + CLIPAttention(c, name="self_attn")(h, identity_attn,
                                                   causal)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, name="fc1")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(c.hidden_size, name="fc2")(h)
        return x


def _resize_pos_embed(pos: jnp.ndarray, src_grid: int, gh: int, gw: int):
    """[1+src*src, D] -> [1+gh*gw, D] with bilinear grid interpolation."""
    if gh == src_grid and gw == src_grid:
        return pos
    cls, grid = pos[:1], pos[1:]
    grid = grid.reshape(src_grid, src_grid, -1)
    grid = jax.image.resize(grid, (gh, gw, grid.shape[-1]), "bilinear")
    return jnp.concatenate([cls, grid.reshape(gh * gw, -1)], axis=0)


class CLIPVisionDense(nn.Module):
    """Returns (pooled [B, proj], dense [B, gh, gw, proj])."""
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray):
        """pixels: [B, H, W, 3], CLIP-normalized; H, W multiples of patch."""
        c = self.cfg
        B, H, W, _ = pixels.shape
        gh, gw = H // c.patch_size, W // c.patch_size

        patches = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                          strides=(c.patch_size, c.patch_size), use_bias=False,
                          name="patch_embedding")(pixels)    # [B,gh,gw,D]
        tokens = patches.reshape(B, gh * gw, c.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.hidden_size,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, c.hidden_size)), tokens], axis=1)

        src_grid = c.image_size // c.patch_size
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (1 + src_grid * src_grid, c.hidden_size))
        x = x + _resize_pos_embed(pos, src_grid, gh, gw)[None]

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="pre_layernorm")(x)
        for i in range(c.num_layers - 1):
            x = CLIPBlock(c, name=f"layers_{i}")(x)
        # last block twice: softmax path feeds CLS pooling, identity path
        # feeds the dense readout (MaskCLIP keeps both consistent).
        last = CLIPBlock(c, name=f"layers_{c.num_layers - 1}")
        x_cls = last(x)
        x_dense = last(x, identity_attn=True)

        post = nn.LayerNorm(epsilon=c.layer_norm_eps, name="post_layernorm")
        proj = nn.Dense(c.projection_dim, use_bias=False,
                        name="visual_projection")
        pooled = proj(post(x_cls[:, 0]))
        dense = proj(post(x_dense[:, 1:]))
        return pooled, dense.reshape(B, gh, gw, c.projection_dim)


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    projection_dim: int = 768
    eos_token_id: int = 49407
    layer_norm_eps: float = 1e-5

    def vision_like(self) -> CLIPVisionConfig:
        """Block config shim: text blocks share the vision block layout."""
        return CLIPVisionConfig(
            hidden_size=self.hidden_size,
            intermediate_size=self.intermediate_size,
            num_layers=self.num_layers, num_heads=self.num_heads,
            projection_dim=self.projection_dim,
            layer_norm_eps=self.layer_norm_eps)


class CLIPTextEncoder(nn.Module):
    """CLIP text tower (HF CLIPTextModelWithProjection layout): causal
    transformer, final LN, EOS-token pooling, text projection. Open-vocab
    queries embed through this into the same space as the dense vision
    features (the LangScene-X paper's mIoU protocol embeds query text with
    CLIP; the repo itself ships no eval — SURVEY §3.5)."""
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray):
        """input_ids [B, T] int32 -> pooled [B, projection_dim]."""
        c = self.cfg
        tok = nn.Embed(c.vocab_size, c.hidden_size,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.02),
                         (c.max_positions, c.hidden_size))
        T = input_ids.shape[1]
        x = tok + pos[None, :T]
        blk_cfg = c.vision_like()
        for i in range(c.num_layers):
            x = CLIPBlock(blk_cfg, name=f"layers_{i}")(x, causal=True)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps,
                         name="final_layer_norm")(x)
        # pool at the (first) EOS token position
        eos_pos = jnp.argmax(
            (input_ids == c.eos_token_id).astype(jnp.int32), axis=1)
        pooled = x[jnp.arange(x.shape[0]), eos_pos]
        return nn.Dense(c.projection_dim, use_bias=False,
                        name="text_projection")(pooled)


CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class ClipDenseExtractor:
    """Drop-in for models/openseg.OpenSegExtractor: image -> [C,H,W]
    per-pixel embeddings (nearest-resized from the patch grid, like the
    reference's nearest resize of OpenSeg output, preprocessor.py:71-77)."""

    def __init__(self, params, cfg: CLIPVisionConfig = CLIPVisionConfig(),
                 max_side: int = 672):
        self.cfg = cfg
        self.params = params
        self.max_side = max_side
        self._apply = jax.jit(
            lambda p, x: CLIPVisionDense(cfg).apply({"params": p}, x)[1])

    @classmethod
    def from_torch_checkpoint(cls, path: str, **kw):
        from ..utils.convert import convert_clip_vision
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
        sd = {k: np.asarray(v) for k, v in sd.items()}
        return cls(convert_clip_vision(sd), **kw)

    def extract(self, image, hw) -> np.ndarray:
        """image: [H,W,3] uint8 / float in [0,1], or encoded image bytes
        (the extract_scene_features contract); hw: output (H, W)."""
        if isinstance(image, (bytes, bytearray)):
            import io
            from PIL import Image
            image = np.asarray(
                Image.open(io.BytesIO(image)).convert("RGB"))
        if image.dtype == np.uint8:
            image = image.astype(np.float32) / 255.0
        ps = self.cfg.patch_size
        H, W = image.shape[:2]
        scale = min(self.max_side / max(H, W), 1.0)
        th = max(int(round(H * scale / ps)), 1) * ps
        tw = max(int(round(W * scale / ps)), 1) * ps
        x = jax.image.resize(jnp.asarray(image), (th, tw, 3), "bilinear")
        x = (x - CLIP_MEAN) / CLIP_STD
        dense = self._apply(self.params, x[None])[0]         # [gh,gw,C]
        dense = jax.image.resize(
            dense, (hw[0], hw[1], dense.shape[-1]), "nearest")
        return np.asarray(dense.transpose(2, 0, 1), np.float32)
