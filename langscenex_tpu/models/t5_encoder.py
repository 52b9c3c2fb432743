"""TPU-native T5 v1.1 text encoder (flax).

The pipeline embeds prompts with T5-XXL (cogvideox_interpolation/
pipeline.py:17,660-671: T5EncoderModel, 226 tokens, embeddings fed to
the DiT text stream). This is a first-party flax implementation — RMS
layernorm, relative position-bucket attention bias (layer 0 only,
shared by all layers), unscaled attention, gated-GELU feed-forward, no
biases anywhere — so the encoder jits/shards like the rest of the
framework instead of depending on transformers' flax port.

Checkpoint loading: `utils/convert.convert_t5_encoder` maps a torch
T5EncoderModel state_dict onto this module; the test suite validates
the pair numerically against torch at random init (the one converter
here that CAN be end-to-end verified without network egress).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Config:
    # defaults = google/t5-v1_1-xxl (the CogVideoX text encoder)
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return (w * y.astype(x.dtype)).astype(x.dtype)


def relative_position_bucket(rel: jnp.ndarray, num_buckets: int,
                             max_distance: int) -> jnp.ndarray:
    """Bidirectional T5 bucket: half the buckets for sign, half split
    between exact small offsets and log-spaced large ones."""
    num_buckets //= 2
    ret = (rel > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(rel)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    frac = jnp.log(n.astype(jnp.float32) / max_exact + 1e-6) / np.log(
        max_distance / max_exact)
    val_large = max_exact + (frac * (num_buckets - max_exact)).astype(
        jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class SelfAttention(nn.Module):
    cfg: T5Config
    has_bias_table: bool   # relative_attention_bias lives in layer 0 only

    @nn.compact
    def __call__(self, x, position_bias, mask_bias):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda name: nn.Dense(inner, use_bias=False, name=name)
        B, T, _ = x.shape

        def split(y):
            return y.reshape(B, T, cfg.num_heads, cfg.d_kv
                             ).transpose(0, 2, 1, 3)

        q = split(dense("q")(x))   # T5 does NOT scale q by 1/sqrt(d_kv)
        k = split(dense("k")(x))
        v = split(dense("v")(x))

        if self.has_bias_table:
            table = self.param(
                "relative_attention_bias", nn.initializers.normal(1.0),
                (cfg.relative_attention_num_buckets, cfg.num_heads))
            pos = jnp.arange(T)
            rel = pos[None, :] - pos[:, None]          # memory - query
            buckets = relative_position_bucket(
                rel, cfg.relative_attention_num_buckets,
                cfg.relative_attention_max_distance)
            position_bias = table[buckets].transpose(2, 0, 1)[None]

        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits + position_bias + mask_bias
        p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, inner)
        return nn.Dense(cfg.d_model, use_bias=False, name="o")(out), \
            position_bias


class T5Block(nn.Module):
    cfg: T5Config
    has_bias_table: bool

    @nn.compact
    def __call__(self, x, position_bias, mask_bias):
        cfg = self.cfg
        h = RMSNorm(cfg.layer_norm_epsilon, name="ln_attn")(x)
        a, position_bias = SelfAttention(
            cfg, self.has_bias_table, name="attn")(h, position_bias,
                                                   mask_bias)
        x = x + a
        h = RMSNorm(cfg.layer_norm_epsilon, name="ln_ff")(x)
        g = nn.Dense(cfg.d_ff, use_bias=False, name="wi_0")(h)
        u = nn.Dense(cfg.d_ff, use_bias=False, name="wi_1")(h)
        h = nn.gelu(g, approximate=True) * u        # gated-gelu (v1.1)
        x = x + nn.Dense(cfg.d_model, use_bias=False, name="wo")(h)
        return x, position_bias


class T5Encoder(nn.Module):
    cfg: T5Config = T5Config()

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        """input_ids [B,T] int32, attention_mask [B,T] (1=keep) ->
        last_hidden_state [B,T,d_model]."""
        cfg = self.cfg
        emb = self.param("token_embed", nn.initializers.normal(1.0),
                         (cfg.vocab_size, cfg.d_model))
        x = emb[input_ids].astype(cfg.dtype)
        if attention_mask is None:
            mask_bias = jnp.zeros((1, 1, 1, 1), jnp.float32)
        else:
            mask_bias = jnp.where(attention_mask[:, None, None, :] > 0,
                                  0.0, -1e9).astype(jnp.float32)
        position_bias = None
        for i in range(cfg.num_layers):
            x, position_bias = T5Block(cfg, has_bias_table=(i == 0),
                                       name=f"block_{i}")(
                x, position_bias, mask_bias)
        return RMSNorm(cfg.layer_norm_epsilon, name="ln_final")(x)
