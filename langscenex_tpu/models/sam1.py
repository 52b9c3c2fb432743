"""SAM v1 (ViT-H) in flax: image encoder + prompt encoder + mask decoder
and the *modified* 4-level automatic mask generator the reference vendors.

Parity targets (1:1 weight-mappable via utils/convert.convert_sam1,
validated in tests/test_sam1.py against a torch mirror):
  segment-anything-1/segment_anything/modeling/image_encoder.py
      ViTDet backbone: 16x16 patch embed, abs pos embed, windowed blocks
      (window 14) with decomposed relative-position attention, global
      attention at [7,15,23,31] (ViT-H: embed 1280, depth 32, heads 16),
      2-conv LayerNorm2d neck to 256 channels
  .../modeling/prompt_encoder.py, mask_decoder.py, transformer.py
      same architecture family as SAM2's (no object-score token, no
      high-res skips, linear iou head)
  .../automatic_mask_generator.py:137-169 (modified)
      returns FOUR granularity levels: default = the 3 multimask outputs
      flattened, then small/medium/large = multimask tokens 0/1/2
  .../build_sam.py:14-24  ViT-H configuration

TPU notes: window partition is a reshape; decomposed rel-pos bias is two
einsums folded into the attention logits; the encoder jits as one program.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .sam2.decoder import (MLP, LayerNorm2d, TwoWayTransformer,
                           DecoderConfig)
from .sam2.hiera import window_partition, window_unpartition
from ..ops.connected import mask_nms


@dataclasses.dataclass(frozen=True)
class SAM1Config:
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1280            # ViT-H
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (7, 15, 23, 31)
    # decoder family (same dims as SAM)
    decoder_dim: int = 256
    decoder_heads: int = 8
    decoder_mlp: int = 2048
    decoder_depth: int = 2
    num_multimask: int = 3
    mask_in_chans: int = 16

    @property
    def feat_size(self) -> int:
        return self.img_size // self.patch_size


def _get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray):
    """image_encoder.py:292-322 for q_size == k_size (the only case SAM
    hits): gather the (2s-1, hd) table into [s, s, hd] by relative offset,
    linearly interpolating the table when the grid differs from the
    pretraining size."""
    max_rel = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel:
        # torch F.interpolate mode='linear' (align_corners=False)
        L = rel_pos.shape[0]
        src = (jnp.arange(max_rel) + 0.5) * (L / max_rel) - 0.5
        lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, L - 1)
        hi = jnp.minimum(lo + 1, L - 1)
        f = jnp.clip(src - lo, 0.0, 1.0)
        rel_pos = rel_pos[lo] * (1 - f)[:, None] + rel_pos[hi] * f[:, None]
    coords = (jnp.arange(q_size)[:, None] - jnp.arange(k_size)[None, :]
              + (k_size - 1))
    return rel_pos[coords]


class SAM1Attention(nn.Module):
    """Decomposed relative-position attention
    (image_encoder.py:185-240, :325-361)."""
    num_heads: int
    rel_pos_size: int        # input grid side for the rel-pos tables

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        nH = self.num_heads
        hd = C // nH
        qkv = nn.Dense(3 * C, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, nH, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = (t.reshape(B * nH, H * W, hd) for t in qkv)

        scale = 1.0 / math.sqrt(hd)
        attn = jnp.einsum('bqd,bkd->bqk', q * scale, k,
                          preferred_element_type=jnp.float32)

        rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                           (2 * self.rel_pos_size - 1, hd))
        rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                           (2 * self.rel_pos_size - 1, hd))
        Rh = _get_rel_pos(H, H, rel_h)
        Rw = _get_rel_pos(W, W, rel_w)
        r_q = q.reshape(B * nH, H, W, hd)
        bias_h = jnp.einsum('bhwc,hkc->bhwk', r_q, Rh)
        bias_w = jnp.einsum('bhwc,wkc->bhwk', r_q, Rw)
        attn = (attn.reshape(B * nH, H, W, H, W)
                + bias_h[:, :, :, :, None]
                + bias_w[:, :, :, None, :]).reshape(B * nH, H * W, H * W)

        p = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum('bqk,bkd->bqd', p, v,
                       preferred_element_type=jnp.float32)
        o = o.reshape(B, nH, H, W, hd).transpose(0, 2, 3, 1, 4
                                                 ).reshape(B, H, W, C)
        return nn.Dense(C, name="proj")(o)


class SAM1Block(nn.Module):
    """image_encoder.py:119-182."""
    num_heads: int
    window_size: int          # 0 = global
    feat_size: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        ws = self.window_size
        if ws > 0:
            x, pad_hw = window_partition(x, ws)
        rp = ws if ws > 0 else self.feat_size
        x = SAM1Attention(self.num_heads, rp, name="attn")(x)
        if ws > 0:
            x = window_unpartition(x, ws, pad_hw, (H, W))
        x = shortcut + x
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), name="mlp_lin1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, name="mlp_lin2")(h)
        return x + h


class ImageEncoderViT(nn.Module):
    """image_encoder.py:17-116."""
    cfg: SAM1Config = SAM1Config()

    @nn.compact
    def __call__(self, x):
        """[B,3,H,W] -> [B, H/16, W/16, out_chans]."""
        cfg = self.cfg
        p = cfg.patch_size
        fs = cfg.feat_size
        x = x.transpose(0, 2, 3, 1)
        x = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p),
                    name="patch_embed_proj")(x)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, fs, fs, cfg.embed_dim))
        x = x + pos[:, :x.shape[1], :x.shape[2]]
        for i in range(cfg.depth):
            ws = 0 if i in cfg.global_attn_indexes else cfg.window_size
            x = SAM1Block(cfg.num_heads, ws, fs, cfg.mlp_ratio,
                          name=f"blocks_{i}")(x)
        x = nn.Conv(cfg.out_chans, (1, 1), use_bias=False,
                    name="neck_0")(x)
        x = LayerNorm2d("neck_1")(x)
        x = nn.Conv(cfg.out_chans, (3, 3), padding=1, use_bias=False,
                    name="neck_2")(x)
        return LayerNorm2d("neck_3")(x)


class SAM1PromptEncoder(nn.Module):
    """prompt_encoder.py — identical structure to SAM2's (which inherited
    it); reimplemented here with SAM1's config plumbing."""
    cfg: SAM1Config = SAM1Config()

    def setup(self):
        C = self.cfg.decoder_dim
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
        # no mask_downscaling path: the pipeline prompts SAM1 with the
        # point grid only (the converter drops those checkpoint keys)

    def _pe(self, coords01):
        x = (2.0 * coords01 - 1.0) @ self.pe_gaussian
        return jnp.concatenate([jnp.sin(2 * jnp.pi * x),
                                jnp.cos(2 * jnp.pi * x)], axis=-1)

    def get_dense_pe(self, hw):
        h, w = hw
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
        return self._pe(jnp.stack([gx, gy], axis=-1))

    def __call__(self, coords, labels, hw):
        """coords [B,N,2] absolute pixels in the img_size frame."""
        S = self.cfg.img_size
        emb = self._pe((coords + 0.5) / S)
        lab = labels[..., None]
        emb = jnp.where(lab == -1, self.not_a_point_embed[0], emb)
        for i in range(4):
            emb = jnp.where(lab == i, emb + self.point_embeddings[i][0],
                            emb)
        dense = jnp.broadcast_to(
            self.no_mask_embed.reshape(1, 1, 1, -1),
            (1, hw[0], hw[1], self.cfg.decoder_dim))
        return emb, dense


class SAM1MaskDecoder(nn.Module):
    """mask_decoder.py (SAM1): iou token + 4 mask tokens, two-way
    transformer, plain output upscaling, hypernetwork MLPs, linear iou
    head."""
    cfg: SAM1Config = SAM1Config()

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt,
                 dense_prompt, multimask_output: bool):
        from .vggt import StridedDeconv
        cfg = self.cfg
        dcfg = DecoderConfig(dim=cfg.decoder_dim, num_heads=cfg.decoder_heads,
                             mlp_dim=cfg.decoder_mlp, depth=cfg.decoder_depth,
                             num_multimask=cfg.num_multimask)
        B, H, W, C = image_embeddings.shape
        n_mask = cfg.num_multimask + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, C))
        mask_tokens = self.param("mask_tokens",
                                 nn.initializers.normal(1.0), (n_mask, C))
        out_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.broadcast_to(out_tokens[None], (B,) + out_tokens.shape)
        tokens = jnp.concatenate([tokens, sparse_prompt], axis=1)

        src = (image_embeddings + dense_prompt).reshape(B, H * W, C)
        pe = jnp.broadcast_to(image_pe.reshape(1, H * W, C), (B, H * W, C))
        hs, src = TwoWayTransformer(dcfg, name="transformer")(src, pe,
                                                              tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1:1 + n_mask]

        src = src.reshape(B, H, W, C)
        up = StridedDeconv(C // 4, 2, name="output_upscaling_0")(src)
        up = LayerNorm2d("output_upscaling_1")(up)
        up = nn.gelu(up, approximate=False)
        up = StridedDeconv(C // 8, 2, name="output_upscaling_3")(up)
        up = nn.gelu(up, approximate=False)

        hyper = jnp.stack([
            MLP(C, C // 8, 3, name=f"output_hypernetworks_mlps_{i}")(
                mask_tokens_out[:, i])
            for i in range(n_mask)], axis=1)
        masks = jnp.einsum('bmc,bhwc->bmhw', hyper, up,
                           preferred_element_type=jnp.float32)
        iou_pred = MLP(256, n_mask, 3, name="iou_prediction_head")(
            iou_token_out)
        if multimask_output:
            return masks[:, 1:], iou_pred[:, 1:]
        return masks[:, :1], iou_pred[:, :1]


class SAM1(nn.Module):
    cfg: SAM1Config = SAM1Config()

    def setup(self):
        self.image_encoder = ImageEncoderViT(self.cfg)
        self.prompt_encoder = SAM1PromptEncoder(self.cfg)
        self.mask_decoder = SAM1MaskDecoder(self.cfg)

    def encode_image(self, images):
        return self.image_encoder(images)

    def decode_points(self, feats, coords, labels,
                      multimask_output: bool = True):
        """feats [B,h,w,256]; coords [B,N,2] pixels in the model frame."""
        hw = feats.shape[1:3]
        sparse, dense = self.prompt_encoder(coords, labels, hw)
        pe = self.prompt_encoder.get_dense_pe(hw)
        return self.mask_decoder(feats, pe, sparse, dense,
                                 multimask_output)


# ------------------------------------------------------------------- AMG

@dataclasses.dataclass(frozen=True)
class SAM1AMGConfig:
    points_per_side: int = 32
    points_per_batch: int = 64
    pred_iou_thresh: float = 0.7
    stability_score_thresh: float = 0.85
    stability_offset: float = 1.0
    box_nms_thresh: float = 0.7
    crop_n_layers: int = 1       # the reference runs with 1 crop layer
    crop_overlap_ratio: float = 512 / 1500
    min_mask_region_area: int = 100
    # hard pre-NMS cap per level (top-K by predicted_iou): bounds the
    # [N, H*W] NMS matmul memory when thresholds are disabled (the
    # --full-random no-egress configuration keeps every proposal; with
    # real weights the thresholds already bound N far below this)
    max_proposals: int = 512


def build_point_grid(n: int) -> np.ndarray:
    step = 1.0 / (2 * n)
    xs = np.linspace(step, 1 - step, n)
    gx, gy = np.meshgrid(xs, xs, indexing='xy')
    return np.stack([gx, gy], -1).reshape(-1, 2).astype(np.float32)


def generate_crop_boxes(im_h, im_w, n_layers, overlap_ratio):
    """amg.py generate_crop_boxes: full image + 2^(i+1) x 2^(i+1)
    overlapping crops per layer, XYXY."""
    boxes = [(0, 0, im_w, im_h)]
    short = min(im_h, im_w)
    for layer in range(n_layers):
        n = 2 ** (layer + 1)
        overlap = int(overlap_ratio * short * (2 / n))

        def crop_len(orig, n_crops, ov):
            return int(math.ceil((ov * (n_crops - 1) + orig) / n_crops))
        cw = crop_len(im_w, n, overlap)
        ch = crop_len(im_h, n, overlap)
        x0s = [int((cw - overlap) * i) for i in range(n)]
        y0s = [int((ch - overlap) * i) for i in range(n)]
        for y0 in y0s:
            for x0 in x0s:
                boxes.append((x0, y0, min(x0 + cw, im_w),
                              min(y0 + ch, im_h)))
    return boxes


def _stability(logits, offset):
    hi = (logits > offset).sum(axis=(-2, -1)).astype(np.float32)
    lo = (logits > -offset).sum(axis=(-2, -1)).astype(np.float32)
    return hi / np.maximum(lo, 1.0)


class SAM1AutomaticMaskGenerator:
    """The modified 4-level generator (automatic_mask_generator.py:137-169):
    generate(image) -> (default, small, medium, large) lists of
    {segmentation [H,W] bool, predicted_iou, stability_score}.

    Box-NMS between proposals is realized as mask-NMS (equivalent intent;
    mask IoU is an MXU matmul on TPU while box NMS would serialize)."""

    def __init__(self, model: SAM1, params,
                 cfg: SAM1AMGConfig = SAM1AMGConfig()):
        self.model = model
        self.params = params
        self.cfg = cfg
        self.S = model.cfg.img_size
        self._encode = jax.jit(
            lambda p, im: model.apply(p, im, method=SAM1.encode_image))
        self._decode = jax.jit(
            lambda p, f, c, l: model.apply(p, f, c, l, True,
                                           method=SAM1.decode_points))

    def _process_crop(self, image, crop_box):
        """image [3,H,W] float [0,1]; returns lists of (mask@crop, iou,
        stab) in original image coords at stride-4 of the model frame."""
        cfg = self.cfg
        x0, y0, x1, y1 = crop_box
        crop = image[:, y0:y1, x0:x1]
        ch, cw = crop.shape[1:]
        # resize longest side to model img_size (ResizeLongestSide)
        scale = self.S / max(ch, cw)
        nh, nw = int(ch * scale + 0.5), int(cw * scale + 0.5)
        crop_r = jax.image.resize(jnp.asarray(crop), (3, nh, nw),
                                  method="bilinear")
        padded = jnp.zeros((3, self.S, self.S)).at[:, :nh, :nw].set(crop_r)
        feats = self._encode(self.params, padded[None])

        grid = build_point_grid(cfg.points_per_side)
        pts = grid * np.array([nw, nh], np.float32)
        results = []   # (mask_lowres, iou) per token level
        for s in range(0, len(pts), cfg.points_per_batch):
            batch = jnp.asarray(pts[s:s + cfg.points_per_batch])[:, None]
            B = batch.shape[0]
            featsB = jnp.broadcast_to(feats, (B,) + feats.shape[1:])
            labels = jnp.ones((B, 1), jnp.int32)
            masks, ious = self._decode(self.params, featsB, batch, labels)
            results.append((np.asarray(masks), np.asarray(ious)))
        masks = np.concatenate([m for m, _ in results])   # [N,3,h,w]
        ious = np.concatenate([i for _, i in results])    # [N,3]
        # valid region of the low-res mask = the unpadded part
        h4 = masks.shape[-2]
        vh = max(int(round(h4 * nh / self.S)), 1)
        vw = max(int(round(h4 * nw / self.S)), 1)
        return masks[..., :vh, :vw], ious

    def generate(self, image: np.ndarray) -> Tuple[List[Dict], ...]:
        cfg = self.cfg
        _, H, W = image.shape
        crop_boxes = generate_crop_boxes(H, W, cfg.crop_n_layers,
                                         cfg.crop_overlap_ratio)
        per_level: List[List[Dict]] = [[] for _ in range(4)]
        for crop_box in crop_boxes:
            masks, ious = self._process_crop(image, crop_box)
            stab = _stability(masks, cfg.stability_offset)
            x0, y0, x1, y1 = crop_box
            for n in range(masks.shape[0]):
                for tok in range(3):
                    iou = float(ious[n, tok])
                    st = float(stab[n, tok])
                    if iou <= cfg.pred_iou_thresh or \
                            st <= cfg.stability_score_thresh:
                        continue
                    seg = _mask_to_image(masks[n, tok] > 0, crop_box,
                                         (H, W))
                    if seg.sum() < cfg.min_mask_region_area:
                        continue
                    entry = {"segmentation": seg, "predicted_iou": iou,
                             "stability_score": st}
                    per_level[0].append(entry)        # default: all tokens
                    per_level[1 + tok].append(entry)  # s / m / l
        out = []
        for lvl in range(4):
            entries = per_level[lvl]
            if not entries:
                out.append([])
                continue
            if cfg.max_proposals and len(entries) > cfg.max_proposals:
                entries = sorted(entries, key=lambda e: -e["predicted_iou"]
                                 )[:cfg.max_proposals]
            m = jnp.asarray(np.stack([e["segmentation"] for e in entries]))
            sc = jnp.asarray(np.array(
                [e["predicted_iou"] for e in entries], np.float32))
            keep = np.asarray(mask_nms(m, sc, cfg.box_nms_thresh))
            out.append([e for e, k in zip(entries, keep) if k])
        return tuple(out)


def _mask_to_image(m: np.ndarray, crop_box, hw) -> np.ndarray:
    """Place a crop-space low-res mask into full-image coords (nearest)."""
    H, W = hw
    x0, y0, x1, y1 = crop_box
    ch, cw = y1 - y0, x1 - x0
    ys = (np.arange(ch) * m.shape[0]) // ch
    xs = (np.arange(cw) * m.shape[1]) // cw
    out = np.zeros((H, W), bool)
    out[y0:y1, x0:x1] = m[ys][:, xs]
    return out
