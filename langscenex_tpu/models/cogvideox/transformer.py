"""CogVideoX 3D-full-attention DiT in flax, TPU-first.

Architecture parity with the denoiser the reference drives
(diffusers CogVideoXTransformer3DModel, used at
cogvideox_interpolation/pipeline.py:9-13,726-741): per-frame 2x2 patch
embedding, text tokens prepended, joint full attention over
[text; all video patches] with qk layernorm and 3D RoPE on the video
tokens only, adaLN-Zero ("expert" LayerNormZero with separate video/text
gates) conditioning from the sinusoidal timestep embedding, GELU MLP,
final AdaLayerNorm + linear unpatchify.

TPU-first choices: attention runs as one fused jnp.einsum softmax over the
~17.8k-token sequence in bf16 (flash/splash Pallas kernel is a planned
drop-in at attention()); tensor-parallel sharding splits heads and MLP
hidden on the mesh 'model' axis via logical sharding constraints.

Shapes: latents [B, F, C, H, W] (13 latent frames at 49 video frames,
pipeline.py:284-291), text [B, L, text_dim].
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.ln_modulate import ln_modulate


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    # defaults = CogVideoX-5b(-I2V) scale (the reference's fine-tune base)
    num_layers: int = 42
    num_heads: int = 48
    head_dim: int = 64
    in_channels: int = 32          # 16 noisy + 16 conditioning latents
    out_channels: int = 16
    patch_size: int = 2
    text_embed_dim: int = 4096
    time_embed_dim: int = 512
    timestep_activation_fn: str = "silu"
    use_rotary: bool = True
    rope_base: float = 10000.0
    attn_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False   # per-block rematerialization for training
    # ONE [hidden, 3*hidden] projection instead of separate to_q/to_k/
    # to_v: the three separate matmuls measured 40.8% MFU on v5e (each
    # re-streams the [T,hidden] activation from HBM); the fused matmul
    # measured 87% — a ~280 ms saving on the B=1 DiT forward
    # (experiments/ab_qkv_fused.py, round 4). Columns are interleaved
    # PER HEAD ([head0: q(64) k(64) v(64)][head1: ...]) so a 'model'-axis
    # sharding of the output dim splits heads cleanly for TP.
    # utils/convert.py interleaves torch q/k/v weights to match.
    fuse_qkv: bool = True

    @property
    def hidden(self) -> int:
        return self.num_heads * self.head_dim


def sinusoidal_timestep(t: jnp.ndarray, dim: int,
                        max_period: float = 10000.0) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def rope_3d(cfg: TransformerConfig, frames: int, height: int, width: int):
    """3D rotary embeddings over (t, h, w) patch grid, matching diffusers'
    get_3d_rotary_pos_embed split: head_dim partitioned 1/4 temporal,
    3/8 height, 3/8 width (pipeline.py:472-497 usage).

    Returns (cos, sin) each [frames*height*width, head_dim//2]."""
    assert cfg.head_dim % 16 == 0, "3D RoPE needs head_dim % 16 == 0"
    dim_t = cfg.head_dim // 4
    dim_h = cfg.head_dim * 3 // 8
    dim_w = cfg.head_dim * 3 // 8

    def axis_freqs(n, dim):
        inv = 1.0 / (cfg.rope_base ** (jnp.arange(0, dim, 2) / dim))
        return jnp.outer(jnp.arange(n, dtype=jnp.float32), inv)  # [n, dim/2]

    ft = axis_freqs(frames, dim_t)
    fh = axis_freqs(height, dim_h)
    fw = axis_freqs(width, dim_w)
    # broadcast to the full (t, h, w) grid, concat along the freq axis
    t_grid = jnp.broadcast_to(ft[:, None, None, :],
                              (frames, height, width, dim_t // 2))
    h_grid = jnp.broadcast_to(fh[None, :, None, :],
                              (frames, height, width, dim_h // 2))
    w_grid = jnp.broadcast_to(fw[None, None, :, :],
                              (frames, height, width, dim_w // 2))
    freqs = jnp.concatenate([t_grid, h_grid, w_grid], axis=-1)
    freqs = freqs.reshape(frames * height * width, -1)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x [..., T, D] with interleaved-pair rotation (diffusers
    apply_rotary_emb use_real_unbind_dim=-1 convention). Keeps x's dtype
    (an f32 upcast here costs ~200MB per tensor at DiT scale)."""
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    rx1 = x1 * cos - x2 * sin
    rx2 = x2 * cos + x1 * sin
    return jnp.stack([rx1, rx2], axis=-1).reshape(x.shape)


def rope_full_tables(cos: jnp.ndarray, sin: jnp.ndarray, text_len: int):
    """Expand half-width video rope tables to full-sequence, full-D form
    for the fused pair-swap rotation (`apply_rope_fused`).

    The interleaved rotation r[2i] = x[2i]·c_i − x[2i+1]·s_i,
    r[2i+1] = x[2i+1]·c_i + x[2i]·s_i is exactly
    ``x·C + swap_pairs(x)·S`` with C[d] = c_{d//2} and
    S[d] = s_{d//2}·(+1 if d odd else −1). Text tokens get the identity
    rotation (C=1, S=0), so the caller can rotate the WHOLE joint
    [text; video] q/k in one fused elementwise pass — no per-block
    slicing or dynamic-update-slice over the ~109 MB head tensors, and
    no stride-2 slices (which materialize 32-lane intermediates that
    Mosaic/XLA pad to 128 lanes). Returns (C, S) each
    [text_len + T_video, D] f32."""
    T, half = cos.shape
    c = jnp.repeat(cos, 2, axis=-1)                       # [T, D]
    sgn = jnp.where(jnp.arange(2 * half) % 2 == 1, 1.0, -1.0)
    s = jnp.repeat(sin, 2, axis=-1) * sgn[None]
    c = jnp.concatenate([jnp.ones((text_len, 2 * half), c.dtype), c], 0)
    s = jnp.concatenate([jnp.zeros((text_len, 2 * half), s.dtype), s], 0)
    return c, s


def apply_rope_fused(x: jnp.ndarray, cos_full: jnp.ndarray,
                     sin_full: jnp.ndarray):
    """Fused rotation over the full joint sequence: x [..., T, D] with
    full-width tables from `rope_full_tables`. Bit-equivalent math to
    `apply_rope` on the video rows, identity on the text rows."""
    D = x.shape[-1]
    xs = jnp.flip(x.reshape(x.shape[:-1] + (D // 2, 2)), -1)
    xs = xs.reshape(x.shape)
    return x * cos_full.astype(x.dtype) + xs * sin_full.astype(x.dtype)


class LayerNormZero(nn.Module):
    """CogVideoXLayerNormZero: SiLU(temb) -> 6*hidden; LN then per-stream
    (video/text) shift/scale, returning the per-token gate for the
    residual add.

    Joint form: ``x`` is the whole [text; video] sequence; the text
    prefix (``text_len`` rows) and video suffix are modulated as slices
    of the SAME LayerNorm pass. The per-stream shift/scale/gate stay
    [B, hidden] — a position-SELECT formulation ([B, T, hidden]
    where(mask, ...)) depends only on temb, so XLA hoists all 84 of
    them out of the block chain and keeps them live program-long:
    measured +5.3 GB HBM temp memory at DiT scale (OOM on v5e). Slicing
    the normed stream keeps every big tensor data-dependent on x, so
    liveness stays block-local."""
    hidden: int
    text_len: int

    @nn.compact
    def __call__(self, x, temb):
        emb = nn.Dense(6 * self.hidden, name="linear")(nn.silu(temb))
        shift, scale, gate, t_shift, t_scale, t_gate = jnp.split(emb, 6, -1)
        # fused LN + per-stream modulate (ops/ln_modulate.py): one
        # read + one write instead of XLA's ~3x traffic through the
        # norm/modulate boundary (measured ~400 ms of the 6.02 s B=2
        # step, experiments/ab_mlp2.py). Params keep the nn.LayerNorm
        # names (norm/{scale,bias}) for converter/checkpoint compat;
        # math matches nn.LayerNorm(eps=1e-5, fast-variance, f32 stats).
        g_ = _NormParams(self.hidden, name="norm")()
        n_scale, n_bias = g_
        out = ln_modulate(x, n_scale, n_bias, scale, shift,
                          t_scale, t_shift, self.text_len)
        return out, gate[:, None], t_gate[:, None]


class _NormParams(nn.Module):
    """Parameter shell matching nn.LayerNorm's tree (scale, bias)."""
    hidden: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.hidden,)),
                self.param("bias", nn.initializers.zeros, (self.hidden,)))


def attention(q, k, v, dtype):
    """Joint full attention [B, H, T, D]: Pallas flash-attention kernel on
    TPU for the ~17.8k-token sequence (materialized logits would be tens
    of GB), fused einsum elsewhere. bounded_logits: norm_q/norm_k cap
    |logits| at ~sqrt(D)·O(1), so the no-running-max softmax kernel is
    exact here (ops/flash_attention._attn_kernel_nomax)."""
    from ...ops.flash_attention import attention_auto
    return attention_auto(q, k, v, dtype=dtype, bounded_logits=True)


class JointAttention(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, x, rope):
        """x is the joint [text; video] sequence [B, T, hidden]; rope is
        the full-sequence fused table pair (identity on text rows)."""
        cfg = self.cfg
        B, T, _ = x.shape

        # NATIVE [B, T, H, D] layout end-to-end (round 5): qk-norm and
        # rope are last-dim elementwise (layout-agnostic), and the
        # bounded flash kernel reads/writes this layout directly
        # (ops/flash_attention.attention_bthd) — no [B,H,T,D]
        # transposes or pad copies over the ~218 MB head tensors.
        def heads(name):
            y = nn.Dense(cfg.hidden, name=name)(x)
            return y.reshape(B, T, cfg.num_heads, cfg.head_dim)

        if cfg.fuse_qkv:
            # one [hidden, 3*hidden] matmul, columns interleaved per head
            # (see TransformerConfig.fuse_qkv); slicing the trailing 192
            # after the head reshape is shard-local under 'qkv'→model TP
            D = cfg.head_dim
            y = nn.Dense(3 * cfg.hidden, name="to_qkv")(x)
            y = nn.with_logical_constraint(y, ("batch", None, "qkv"))
            y = y.reshape(B, T, cfg.num_heads, 3 * D)
            q, k, v = y[..., :D], y[..., D:2 * D], y[..., 2 * D:]
        else:
            q, k, v = heads("to_q"), heads("to_k"), heads("to_v")
        # qk layernorm (CogVideoX norm_q/norm_k)
        q = nn.LayerNorm(epsilon=1e-6, name="norm_q")(q)
        k = nn.LayerNorm(epsilon=1e-6, name="norm_k")(k)
        if rope is not None:
            # two fused elementwise passes instead of slice + stride-2
            # deinterleave + dynamic-update-slice per tensor; tables
            # broadcast over the H axis ([T, D] against [B, T, H, D])
            cos_full, sin_full = rope
            q = apply_rope_fused(q, cos_full[:, None], sin_full[:, None])
            k = apply_rope_fused(k, cos_full[:, None], sin_full[:, None])
        from ...ops.flash_attention import attention_bthd
        out = attention_bthd(q, k, v, dtype=cfg.attn_dtype)
        out = out.reshape(B, T, cfg.hidden)
        out = nn.Dense(cfg.hidden, name="to_out")(out)
        # shard the head projection over the model axis
        return nn.with_logical_constraint(out, ("batch", None, "embed"))


class FeedForward(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(4 * self.hidden, name="fc1")(x)
        h = nn.gelu(h, approximate=True)
        h = nn.with_logical_constraint(h, ("batch", None, "mlp"))
        return nn.Dense(self.hidden, name="fc2")(h)


class Block(nn.Module):
    cfg: TransformerConfig
    text_len: int

    @nn.compact
    def __call__(self, x, temb, rope):
        """x: joint [text; video] residual stream [B, T, hidden]; the
        first ``text_len`` rows are text (static split)."""
        cfg, Tt = self.cfg, self.text_len

        def gated(y, g, tg):
            # per-stream residual gates on the prefix/suffix slices —
            # fused concat-of-elementwise, data-dependent on the stream
            return jnp.concatenate([tg * y[:, :Tt], g * y[:, Tt:]], axis=1)

        n, g, tg = LayerNormZero(cfg.hidden, Tt, name="norm1")(x, temb)
        x = x + gated(JointAttention(cfg, name="attn")(n, rope), g, tg)
        n, g, tg = LayerNormZero(cfg.hidden, Tt, name="norm2")(x, temb)
        x = x + gated(FeedForward(cfg.hidden, name="ff")(n), g, tg)
        return x


class CogVideoXTransformer(nn.Module):
    cfg: TransformerConfig = TransformerConfig()

    @nn.compact
    def __call__(self, latents: jnp.ndarray, text: jnp.ndarray,
                 timestep: jnp.ndarray) -> jnp.ndarray:
        """latents [B,F,C,H,W], text [B,L,text_dim], timestep [B]."""
        cfg = self.cfg
        B, F, C, H, W = latents.shape
        p = cfg.patch_size
        Hp, Wp = H // p, W // p

        # patch embed: 2x2 conv per frame (CogVideoXPatchEmbed)
        x = latents.reshape(B * F, C, H, W).transpose(0, 2, 3, 1)
        x = nn.Conv(cfg.hidden, (p, p), strides=(p, p), name="patch_embed")(x)
        x = x.reshape(B, F * Hp * Wp, cfg.hidden)

        text_h = nn.Dense(cfg.hidden, name="text_proj")(text)

        # timestep conditioning: sinusoidal at hidden width (diffusers
        # Timesteps(inner_dim)) -> MLP down to time_embed_dim (512). temb
        # STAYS at 512: the per-block adaLN linears map 512 -> 6*hidden;
        # projecting temb to hidden first would double the parameter
        # count (measured 9.55B vs the correct ~5.8B)
        temb = sinusoidal_timestep(timestep, cfg.hidden)
        temb = nn.Dense(cfg.time_embed_dim, name="time_fc1")(temb)
        temb = nn.silu(temb)
        temb = nn.Dense(cfg.time_embed_dim, name="time_fc2")(temb)
        # keep conditioning in the compute dtype: an f32 temb promotes the
        # whole residual stream to f32 through the adaLN modulation
        # (measured 2x step time at 5B scale)
        temb = temb.astype(latents.dtype)

        Tt = text.shape[1]
        if cfg.use_rotary:
            # full [text; video] tables built ONCE and shared by all 42
            # blocks; text rows carry the identity rotation
            rope = rope_full_tables(*rope_3d(cfg, F, Hp, Wp), text_len=Tt)
        else:
            rope = None

        # single joint residual stream for the whole stack: one concat
        # here, one slice at the end — attention/FF consume the joint
        # stream directly instead of splitting/re-concatenating per block
        joint = jnp.concatenate([text_h, x], axis=1)
        # remat trades the per-block activation stash for recompute in the
        # backward pass — 42 blocks x 18k x 3072 bf16 activations don't fit
        # HBM otherwise when fine-tuning
        block_cls = nn.remat(Block) if cfg.remat else Block
        for i in range(cfg.num_layers):
            joint = block_cls(cfg, Tt, name=f"block_{i}")(joint, temb, rope)

        joint = nn.LayerNorm(epsilon=1e-5, name="norm_final")(joint)
        video = joint[:, Tt:]

        # AdaLayerNorm final (norm_out): SiLU(temb) -> 2*hidden shift/scale
        mod = nn.Dense(2 * cfg.hidden, name="norm_out_linear")(nn.silu(temb))
        shift, scale = jnp.split(mod, 2, -1)
        video = nn.LayerNorm(epsilon=1e-5, name="norm_out")(video)
        video = video * (1 + scale[:, None]) + shift[:, None]

        video = nn.Dense(cfg.out_channels * p * p, name="proj_out")(video)
        # unpatchify -> [B,F,C_out,H,W]
        video = video.reshape(B, F, Hp, Wp, p, p, cfg.out_channels)
        video = video.transpose(0, 1, 6, 2, 4, 3, 5).reshape(
            B, F, cfg.out_channels, H, W)
        return video
