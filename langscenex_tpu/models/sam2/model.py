"""SAM2 assembled model + video predictor.

Parity targets: auto-seg/sam2/modeling/sam2_base.py track_step:704,
_prepare_memory_conditioned_features:493, _encode_new_memory:664, and
sam2_video_predictor.py SAM2VideoPredictor.{init_state:40, add_new_mask:
317, propagate_in_video:647}.

TPU structure: per-frame work (encode -> memory-condition -> decode ->
memory-encode) is one jitted step with static shapes; the video loop is a
host loop over frames (streaming, as the reference) with the fixed-size
MemoryBank threaded through. Batch axis = objects, so multi-object
propagation is one batched program.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .hiera import HieraConfig, ImageEncoder, sine_pos_embed
from .decoder import DecoderConfig, MaskDecoder, PromptEncoder
from .memory import (MemoryConfig, MemoryAttention, MemoryEncoder,
                     MemoryBank, init_bank, bank_insert, bank_as_memory)


@dataclasses.dataclass(frozen=True)
class SAM2Config:
    hiera: HieraConfig = HieraConfig()
    decoder: DecoderConfig = DecoderConfig()
    memory: MemoryConfig = MemoryConfig()
    image_size: int = 1024


class SAM2(nn.Module):
    cfg: SAM2Config = SAM2Config()

    def setup(self):
        self.image_encoder = ImageEncoder(self.cfg.hiera)
        self.prompt_encoder = PromptEncoder(self.cfg.decoder)
        self.mask_decoder = MaskDecoder(self.cfg.decoder)
        self.memory_attention = MemoryAttention(self.cfg.memory)
        self.memory_encoder = MemoryEncoder(self.cfg.memory)

    def encode_image(self, images: jnp.ndarray) -> Dict:
        return self.image_encoder(images)

    def condition_on_memory(self, vision_feats, vision_pos, memory, mem_pos):
        return self.memory_attention(vision_feats, vision_pos, memory, mem_pos)

    def decode_masks(self, feats, coords, labels, mask_prompt=None,
                     multimask=True):
        """feats [B,H,W,C] (possibly memory-conditioned)."""
        H, W = feats.shape[1:3]
        sparse, dense = self.prompt_encoder(coords, labels, mask_prompt,
                                            (H, W))
        pe = sine_pos_embed(H, W, feats.shape[-1])
        return self.mask_decoder(feats, pe, sparse, dense, multimask)

    def encode_memory(self, feats, mask_logits):
        return self.memory_encoder(feats, mask_logits)


class TrackState(NamedTuple):
    bank: MemoryBank
    obj_ptr: jnp.ndarray     # [B, C] last object pointer token


class SAM2VideoPredictor:
    """Streaming multi-object video propagation (sam2_video_predictor.py).

    Host-side API over the jitted per-frame step:
      init_state(frames) -> caches per-frame image features
      add_new_mask(frame_idx, obj_id, mask) -> prompts an object
      propagate_in_video() -> yields per-frame mask logits per object
    """

    def __init__(self, model: SAM2, params, image_hw: Tuple[int, int]):
        self.model = model
        self.params = params
        self.image_hw = image_hw
        self._encode = jax.jit(
            lambda p, im: model.apply(p, im, method=SAM2.encode_image))
        self._step = jax.jit(self._frame_step)

    # -- jitted per-frame, per-object-batch step ------------------------
    def _frame_step(self, params, feats, vision_pos, bank_feats, bank_pos,
                    bank_valid, mask_prompt, use_prompt):
        def apply(method, *a, **k):
            return self.model.apply(params, *a, method=method, **k)

        B = mask_prompt.shape[0]
        mem, mem_pe = bank_as_memory(
            MemoryBank(bank_feats, bank_pos, bank_valid,
                       jnp.zeros((), jnp.int32)))
        cond = apply(SAM2.condition_on_memory, feats, vision_pos, mem,
                     jnp.zeros_like(mem))
        # no-point prompt: decode from memory-conditioned features alone,
        # optionally with a mask prompt (when the object was just added)
        coords = jnp.zeros((B, 1, 2))
        labels = jnp.full((B, 1), -1, jnp.int32)
        masks, ious, mtok = apply(SAM2.decode_masks, cond, coords, labels,
                                  jnp.where(use_prompt, 1.0, 0.0) * mask_prompt
                                  if mask_prompt is not None else None,
                                  multimask=False)
        new_mem = apply(SAM2.encode_memory, cond, masks)
        return masks, ious, mtok, new_mem

    # -- host API --------------------------------------------------------
    def init_state(self, frames: np.ndarray) -> Dict:
        """frames [T,3,H,W] float in [0,1]; encodes and caches features."""
        feats = []
        for t in range(frames.shape[0]):
            out = self._encode(self.params, jnp.asarray(frames[t:t + 1]))
            feats.append(out)
        f0 = feats[0]["vision_feats"]
        return {
            "frames": frames,
            "feats": feats,
            "obj_ids": [],
            "prompts": {},        # frame_idx -> {obj_id: mask}
            "bank": None,         # created per propagation (B = n objects)
        }

    def add_new_mask(self, state: Dict, frame_idx: int, obj_id: int,
                     mask: np.ndarray) -> None:
        """mask [H,W] bool at image resolution (add_new_mask:317)."""
        if obj_id not in state["obj_ids"]:
            state["obj_ids"].append(obj_id)
        state["prompts"].setdefault(frame_idx, {})[obj_id] = mask

    def propagate_in_video(self, state: Dict, start_frame: int = 0,
                           reverse: bool = False):
        """Yields (frame_idx, obj_ids, mask_logits [B,1,H',W'])."""
        T = state["frames"].shape[0]
        order = range(start_frame, T) if not reverse else \
            range(start_frame, -1, -1)
        obj_ids = list(state["obj_ids"])
        B = len(obj_ids)
        if B == 0:
            return
        f0 = state["feats"][0]["vision_feats"]
        Hf, Wf = f0.shape[1:3]
        bank = state["bank"]
        if bank is None or bank.feats.shape[0] != B:
            bank = init_bank(B, self.model.cfg.memory.num_maskmem,
                             Hf * Wf, self.model.cfg.memory.mem_dim)
        for t in order:
            feats = state["feats"][t]["vision_feats"]
            vpos = state["feats"][t]["vision_pos"][None]
            featsB = jnp.broadcast_to(feats, (B,) + feats.shape[1:])
            prompts = state["prompts"].get(t, {})
            mask_prompt = np.zeros((B, 1, Hf * 4, Wf * 4), np.float32)
            use_prompt = np.zeros((B, 1, 1, 1), np.float32)
            for i, oid in enumerate(obj_ids):
                if oid in prompts:
                    m = prompts[oid].astype(np.float32)
                    m = _resize_mask(m, (Hf * 4, Wf * 4))
                    mask_prompt[i, 0] = (m * 20.0 - 10.0)   # logits
                    use_prompt[i] = 1.0
            masks, ious, mtok, new_mem = self._step(
                self.params, featsB, vpos, bank.feats, bank.pos, bank.valid,
                jnp.asarray(mask_prompt), jnp.asarray(use_prompt))
            # per-object memories (sam2_base keeps one bank per object)
            is_cond = t in state["prompts"]
            mem_flat = new_mem.reshape(B, Hf * Wf, -1)
            bank = bank_insert(bank, mem_flat, jnp.zeros_like(mem_flat),
                               is_cond)
            yield t, obj_ids, np.asarray(masks)
        state["bank"] = bank


def _resize_mask(m: np.ndarray, hw):
    H, W = hw
    ys = (np.arange(H) * m.shape[0]) // H
    xs = (np.arange(W) * m.shape[1]) // W
    return m[ys][:, xs]
