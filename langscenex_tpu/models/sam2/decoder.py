"""SAM prompt encoder + two-way-transformer mask decoder, in flax.

Parity targets (1:1 weight-mappable via utils/convert.convert_sam2):
  auto-seg/sam2/modeling/sam/prompt_encoder.py:17-182  PromptEncoder
      (gaussian random-frequency point encoding, 4 point embeddings +
      not-a-point + no-mask, 3-conv mask downscaling)
  auto-seg/sam2/modeling/sam/transformer.py:44-286     TwoWayTransformer
      (self attn, token->image / image->token cross attn at downsample 2)
  auto-seg/sam2/modeling/sam/mask_decoder.py:15-295    MaskDecoder
      (obj-score + iou + 4 mask tokens, high-res skip upscaling,
      hypernetwork MLPs, sigmoid iou head, MLP object-score head,
      dynamic multimask-via-stability fallback)
"""
from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..vggt import StridedDeconv, resize_bilinear_ac  # torch-layout deconv


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    depth: int = 2
    num_multimask: int = 3     # + 1 single-mask token
    mask_in_chans: int = 16
    iou_head_hidden: int = 256
    # build_sam.py postprocessing overrides (always on in the reference)
    stability_delta: float = 0.05
    stability_thresh: float = 0.98


class MLP(nn.Module):
    """sam2_utils.MLP: relu between layers, optional final sigmoid.
    Param names layers_{i} mirror the torch ModuleList."""
    hidden: int
    out: int
    num_layers: int = 3
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            d = self.out if i == self.num_layers - 1 else self.hidden
            x = nn.Dense(d, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        if self.sigmoid_output:
            x = jax.nn.sigmoid(x)
        return x


def LayerNorm2d(name):
    """sam2_utils.LayerNorm2d on channels-last input: plain LN over the
    channel axis, eps 1e-6 (biased variance, same as flax)."""
    return nn.LayerNorm(epsilon=1e-6, name=name)


class AttentionDS(nn.Module):
    """sam/transformer.py:215-286: separate q/k/v projections with an
    internal dim = dim/downsample_rate and optional distinct kv input dim."""
    dim: int
    num_heads: int
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        d = self.dim // self.downsample_rate
        H = self.num_heads
        hd = d // H
        qh = nn.Dense(d, name="q_proj")(q).reshape(*q.shape[:-1], H, hd)
        kh = nn.Dense(d, name="k_proj")(k).reshape(*k.shape[:-1], H, hd)
        vh = nn.Dense(d, name="v_proj")(v).reshape(*v.shape[:-1], H, hd)
        logits = jnp.einsum('bqhd,bkhd->bhqk', qh, kh,
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits / math.sqrt(hd), axis=-1)
        o = jnp.einsum('bhqk,bkhd->bqhd', p, vh,
                       preferred_element_type=jnp.float32)
        o = o.reshape(*q.shape[:-1], d)
        return nn.Dense(self.dim, name="out_proj")(o)


class PromptEncoder(nn.Module):
    """prompt_encoder.py:17-182. Point coords are ABSOLUTE pixels in the
    ``input_image_size`` frame (+0.5 pixel-center shift applied inside)."""
    cfg: DecoderConfig = DecoderConfig()
    input_image_size: Tuple[int, int] = (1024, 1024)
    image_embedding_size: Tuple[int, int] = (64, 64)

    def setup(self):
        C = self.cfg.dim
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, C // 2))
        self.point_embeddings = [
            self.param(f"point_embeddings_{i}",
                       nn.initializers.normal(1.0), (1, C))
            for i in range(4)]
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, C))
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, C))
        mc = self.cfg.mask_in_chans
        self.mask_conv0 = nn.Conv(mc // 4, (2, 2), strides=(2, 2),
                                  name="mask_downscaling_0")
        self.mask_ln1 = LayerNorm2d("mask_downscaling_1")
        self.mask_conv3 = nn.Conv(mc, (2, 2), strides=(2, 2),
                                  name="mask_downscaling_3")
        self.mask_ln4 = LayerNorm2d("mask_downscaling_4")
        self.mask_conv6 = nn.Conv(C, (1, 1), name="mask_downscaling_6")

    def _pe_encoding(self, coords01):
        """coords normalized to [0,1]^2, [...,2] -> [..., dim]."""
        x = (2.0 * coords01 - 1.0) @ self.pe_gaussian
        x = 2.0 * jnp.pi * x
        return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)

    def get_dense_pe(self):
        """[H, W, dim] grid encoding (pixel centers)."""
        h, w = self.image_embedding_size
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
        return self._pe_encoding(jnp.stack([gx, gy], axis=-1))

    def encode_points(self, coords, labels):
        """coords [B,N,2] absolute (x,y) pixels; labels [B,N] int
        (-1 pad, 0 neg, 1 pos, 2/3 box corners)."""
        H, W = self.input_image_size
        c = (coords + 0.5) / jnp.asarray([W, H], jnp.float32)
        emb = self._pe_encoding(c)
        lab = labels[..., None]
        emb = jnp.where(lab == -1, self.not_a_point_embed[0], emb)
        for i in range(4):
            emb = jnp.where(lab == i, emb + self.point_embeddings[i][0], emb)
        return emb

    def encode_mask(self, mask):
        """mask [B,1,4H,4W] logits -> dense [B,H,W,dim]."""
        x = mask.transpose(0, 2, 3, 1)
        x = nn.gelu(self.mask_ln1(self.mask_conv0(x)), approximate=False)
        x = nn.gelu(self.mask_ln4(self.mask_conv3(x)), approximate=False)
        return self.mask_conv6(x)

    def no_mask_dense(self):
        h, w = self.image_embedding_size
        return jnp.broadcast_to(self.no_mask_embed.reshape(1, 1, 1, -1),
                                (1, h, w, self.cfg.dim))

    def __call__(self, coords, labels, mask: Optional[jnp.ndarray]):
        sparse = self.encode_points(coords, labels)
        dense = self.encode_mask(mask) if mask is not None \
            else self.no_mask_dense()
        return sparse, dense


class TwoWayAttentionBlock(nn.Module):
    """sam/transformer.py:137-212."""
    cfg: DecoderConfig
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        cfg = self.cfg
        if self.skip_first_layer_pe:
            queries = AttentionDS(cfg.dim, cfg.num_heads, name="self_attn")(
                queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + AttentionDS(
                cfg.dim, cfg.num_heads, name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + AttentionDS(
            cfg.dim, cfg.num_heads, 2, name="cross_attn_token_to_image")(
            q, k, keys)
        queries = nn.LayerNorm(name="norm2")(queries)

        h = nn.Dense(cfg.mlp_dim, name="mlp_layers_0")(queries)
        h = nn.Dense(cfg.dim, name="mlp_layers_1")(nn.relu(h))
        queries = nn.LayerNorm(name="norm3")(queries + h)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + AttentionDS(
            cfg.dim, cfg.num_heads, 2, name="cross_attn_image_to_token")(
            k, q, queries)
        keys = nn.LayerNorm(name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """sam/transformer.py:44-134."""
    cfg: DecoderConfig

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding [B,HW,C], image_pe [B,HW,C], points [B,N,C]."""
        queries = point_embedding
        keys = image_embedding
        for i in range(self.cfg.depth):
            queries, keys = TwoWayAttentionBlock(
                self.cfg, skip_first_layer_pe=(i == 0),
                name=f"layers_{i}")(queries, keys, point_embedding, image_pe)
        q = queries + point_embedding
        k = keys + image_pe
        attn = AttentionDS(self.cfg.dim, self.cfg.num_heads, 2,
                           name="final_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(name="norm_final_attn")(queries + attn)
        return queries, keys


class MaskDecoder(nn.Module):
    """mask_decoder.py:15-295 with the SAM2 video-predictor settings:
    pred_obj_scores (MLP head), high-res skip features, sigmoid iou head,
    multimask-token obj ptrs, dynamic multimask-via-stability."""
    cfg: DecoderConfig = DecoderConfig()

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt,
                 dense_prompt, multimask_output: bool,
                 high_res_features: Optional[List[jnp.ndarray]] = None,
                 use_stability_fallback: bool = True):
        """image_embeddings [B,H,W,C]; image_pe [H,W,C]; sparse [B,N,C];
        dense [B',H,W,C] (broadcastable) ->
        (masks [B,M,4H,4W], iou [B,M], sam_tokens_out [B,M,C],
        object_score_logits [B,1])."""
        cfg = self.cfg
        B, H, W, C = image_embeddings.shape
        n_mask = cfg.num_multimask + 1

        obj_score_token = self.param("obj_score_token",
                                     nn.initializers.normal(1.0), (1, C))
        iou_token = self.param("iou_token",
                               nn.initializers.normal(1.0), (1, C))
        mask_tokens = self.param("mask_tokens",
                                 nn.initializers.normal(1.0), (n_mask, C))
        out_tokens = jnp.concatenate([obj_score_token, iou_token,
                                      mask_tokens], axis=0)
        tokens = jnp.broadcast_to(out_tokens[None],
                                  (B,) + out_tokens.shape)
        tokens = jnp.concatenate([tokens, sparse_prompt], axis=1)

        src = (image_embeddings + dense_prompt).reshape(B, H * W, C)
        pe = jnp.broadcast_to(image_pe.reshape(1, H * W, C), (B, H * W, C))
        hs, src = TwoWayTransformer(cfg, name="transformer")(src, pe, tokens)
        iou_token_out = hs[:, 1]
        mask_tokens_out = hs[:, 2:2 + n_mask]

        # upscaling with high-res skips (mask_decoder.py:217-225)
        src = src.reshape(B, H, W, C)
        up = StridedDeconv(C // 4, 2, name="output_upscaling_0")(src)
        if high_res_features is not None:
            up = up + high_res_features[1]
        up = LayerNorm2d("output_upscaling_1")(up)
        up = nn.gelu(up, approximate=False)
        up = StridedDeconv(C // 8, 2, name="output_upscaling_3")(up)
        if high_res_features is not None:
            up = up + high_res_features[0]
        up = nn.gelu(up, approximate=False)            # [B,4H,4W,C/8]

        hyper = jnp.stack([
            MLP(C, C // 8, 3, name=f"output_hypernetworks_mlps_{i}")(
                mask_tokens_out[:, i])
            for i in range(n_mask)], axis=1)           # [B,M,C/8]
        masks = jnp.einsum('bmc,bhwc->bmhw', hyper, up,
                           preferred_element_type=jnp.float32)

        iou_pred = MLP(cfg.iou_head_hidden, n_mask, 3, sigmoid_output=True,
                       name="iou_prediction_head")(iou_token_out)
        object_score_logits = MLP(C, 1, 3, name="pred_obj_score_head")(
            hs[:, 0])

        if multimask_output:
            out_masks = masks[:, 1:]
            out_iou = iou_pred[:, 1:]
            sam_tokens_out = mask_tokens_out[:, 1:]
        else:
            if use_stability_fallback:
                out_masks, out_iou = self._stability_select(masks, iou_pred)
            else:
                out_masks = masks[:, 0:1]
                out_iou = iou_pred[:, 0:1]
            sam_tokens_out = mask_tokens_out[:, 0:1]
        return out_masks, out_iou, sam_tokens_out, object_score_logits

    def _stability_select(self, masks, iou_pred):
        """mask_decoder.py:247-295: fall back from the single-mask token to
        the best multimask output when stability is low."""
        d = self.cfg.stability_delta
        flat = masks.reshape(*masks.shape[:2], -1)
        area_i = jnp.sum(flat > d, axis=-1).astype(jnp.float32)
        area_u = jnp.sum(flat > -d, axis=-1).astype(jnp.float32)
        stability = jnp.where(area_u > 0, area_i / area_u, 1.0)[:, 0]
        is_stable = stability >= self.cfg.stability_thresh

        multi = masks[:, 1:]
        multi_iou = iou_pred[:, 1:]
        best = jnp.argmax(multi_iou, axis=-1)
        bidx = jnp.arange(masks.shape[0])
        best_masks = multi[bidx, best][:, None]
        best_iou = multi_iou[bidx, best][:, None]
        out_masks = jnp.where(is_stable[:, None, None, None],
                              masks[:, 0:1], best_masks)
        out_iou = jnp.where(is_stable[:, None], iou_pred[:, 0:1], best_iou)
        return out_masks, out_iou
