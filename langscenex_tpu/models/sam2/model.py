"""SAM2 assembled model + video predictor.

Parity targets: auto-seg/sam2/modeling/sam2_base.py (track_step:704,
_forward_sam_heads:251, _use_mask_as_output:411, _prepare_memory_
conditioned_features:493, _encode_new_memory:664) with the
sam2_hiera_l.yaml + build_sam.py video-predictor settings: directly_add_
no_mem_embed, use_obj_ptrs_in_encoder (past-only, ptr split into 4x64
tokens), pred_obj_scores (+MLP), fixed_no_obj_ptr, sigmoid 20/-10 mask
scaling for the memory encoder, binarize-from-points, multimask tracking
with multimask-token obj ptrs, and use_mask_input_as_output_without_sam.

TPU structure: per-frame work (encode -> memory-condition -> decode ->
memory-encode) is jitted with static shapes per memory-token count (the
count saturates at num_maskmem + max_obj_ptrs after warmup, so programs
compile once per distinct prefix length); the video loop is a host loop
over frames, as in the reference. The object batch dim groups objects that
share a prompt-frame signature so their memory shapes match.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .hiera import HieraConfig, ImageEncoder
from .decoder import DecoderConfig, MaskDecoder, PromptEncoder
from .memory import MemoryConfig, MemoryAttention, MemoryEncoder

NO_OBJ_SCORE = -1024.0


@dataclasses.dataclass(frozen=True)
class SAM2Config:
    hiera: HieraConfig = HieraConfig()
    decoder: DecoderConfig = DecoderConfig()
    memory: MemoryConfig = MemoryConfig()
    image_size: int = 1024
    backbone_stride: int = 16
    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0
    binarize_mask_from_pts_for_mem_enc: bool = True
    non_overlap_masks_for_mem_enc: bool = False

    @property
    def embed_hw(self) -> Tuple[int, int]:
        s = self.image_size // self.backbone_stride
        return (s, s)


class SAM2(nn.Module):
    """Submodule names mirror the torch checkpoint prefixes
    (image_encoder, sam_prompt_encoder, sam_mask_decoder, memory_attention,
    memory_encoder, obj_ptr_proj, mask_downsample + the sam2_base glue
    params)."""
    cfg: SAM2Config = SAM2Config()

    def setup(self):
        cfg = self.cfg
        self.image_encoder = ImageEncoder(cfg.hiera)
        self.sam_prompt_encoder = PromptEncoder(
            cfg.decoder,
            input_image_size=(cfg.image_size, cfg.image_size),
            image_embedding_size=cfg.embed_hw)
        self.sam_mask_decoder = MaskDecoder(cfg.decoder)
        self.memory_attention = MemoryAttention(cfg.memory)
        self.memory_encoder = MemoryEncoder(cfg.memory)
        C = cfg.decoder.dim
        self.conv_s0 = nn.Conv(C // 8, (1, 1), name="conv_s0")
        self.conv_s1 = nn.Conv(C // 4, (1, 1), name="conv_s1")
        self.no_mem_embed = self.param(
            "no_mem_embed", nn.initializers.normal(0.02), (1, 1, C))
        self.no_mem_pos_enc = self.param(
            "no_mem_pos_enc", nn.initializers.normal(0.02), (1, 1, C))
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc", nn.initializers.normal(0.02),
            (cfg.memory.num_maskmem, 1, 1, cfg.memory.mem_dim))
        self.no_obj_ptr = self.param(
            "no_obj_ptr", nn.initializers.normal(0.02), (1, C))
        self.obj_ptr_proj_l0 = nn.Dense(C, name="obj_ptr_proj_0")
        self.obj_ptr_proj_l1 = nn.Dense(C, name="obj_ptr_proj_1")
        self.obj_ptr_proj_l2 = nn.Dense(C, name="obj_ptr_proj_2")
        self.mask_downsample = nn.Conv(1, (4, 4), strides=(4, 4),
                                       name="mask_downsample")

    # ------------------------------------------------------------ pieces

    def _obj_ptr_proj(self, x):
        """MLP(C, C, C, 3) on SAM output tokens (sam2_base.py:237-241)."""
        x = nn.relu(self.obj_ptr_proj_l0(x))
        x = nn.relu(self.obj_ptr_proj_l1(x))
        return self.obj_ptr_proj_l2(x)

    def forward_image(self, images: jnp.ndarray) -> Dict:
        """images [B,3,H,W] -> backbone dict with SAM-projected high-res
        levels (sam2_base.py:463-475)."""
        out = self.image_encoder(images)
        fpn = list(out["backbone_fpn"])
        fpn[0] = self.conv_s0(fpn[0])
        fpn[1] = self.conv_s1(fpn[1])
        out["backbone_fpn"] = fpn
        return out

    def condition_features(self, feats, curr_pos, memory, memory_pos,
                           num_obj_ptr_tokens: int = 0):
        """feats [B,h,w,C] + memory [B,M,mem_dim] -> conditioned feats.
        (_prepare_memory_conditioned_features step 2)."""
        B, h, w, C = feats.shape
        x = self.memory_attention(
            feats.reshape(B, h * w, C),
            memory,
            jnp.broadcast_to(curr_pos.reshape(1, h * w, C), (B, h * w, C)),
            memory_pos,
            num_obj_ptr_tokens=num_obj_ptr_tokens)
        return x.reshape(B, h, w, C)

    def add_no_mem_embed(self, feats):
        """Initial conditioning frames skip memory attention
        (directly_add_no_mem_embed, sam2_base.py:639-643)."""
        B, h, w, C = feats.shape
        return (feats.reshape(B, h * w, C) + self.no_mem_embed
                ).reshape(B, h, w, C)

    def forward_sam_heads(self, backbone_features, point_coords=None,
                          point_labels=None, mask_inputs=None,
                          high_res_features=None, multimask_output=False):
        """sam2_base.py:251-409. backbone_features [B,h,w,C] channels-last;
        mask_inputs [B,1,4h,4w] low-res logits (already sized for the
        prompt encoder) or None."""
        cfg = self.cfg
        B, h, w, C = backbone_features.shape
        if point_coords is None:
            point_coords = jnp.zeros((B, 1, 2))
            point_labels = -jnp.ones((B, 1), jnp.int32)
        sparse, dense = self.sam_prompt_encoder(point_coords, point_labels,
                                                mask_inputs)
        image_pe = self.sam_prompt_encoder.get_dense_pe()
        low_res_multimasks, ious, sam_tokens, obj_logits = \
            self.sam_mask_decoder(backbone_features, image_pe, sparse,
                                  dense, multimask_output,
                                  high_res_features=high_res_features)
        is_obj = obj_logits > 0                         # [B,1]
        low_res_multimasks = jnp.where(is_obj[..., None, None],
                                       low_res_multimasks, NO_OBJ_SCORE)
        high_res_multimasks = jax.image.resize(
            low_res_multimasks,
            low_res_multimasks.shape[:2] + (cfg.image_size, cfg.image_size),
            method="bilinear")

        sam_output_token = sam_tokens[:, 0]
        if multimask_output:
            best = jnp.argmax(ious, axis=-1)
            bidx = jnp.arange(B)
            low_res_masks = low_res_multimasks[bidx, best][:, None]
            high_res_masks = high_res_multimasks[bidx, best][:, None]
            if sam_tokens.shape[1] > 1:
                sam_output_token = sam_tokens[bidx, best]
        else:
            low_res_masks = low_res_multimasks
            high_res_masks = high_res_multimasks

        obj_ptr = self._obj_ptr_proj(sam_output_token)
        lam = is_obj.astype(jnp.float32)                # [B,1]
        obj_ptr = lam * obj_ptr + (1 - lam) * self.no_obj_ptr
        return (low_res_multimasks, high_res_multimasks, ious,
                low_res_masks, high_res_masks, obj_ptr, obj_logits)

    def use_mask_as_output(self, backbone_features, high_res_features,
                           mask_inputs):
        """sam2_base.py:411-461: prompted frames emit the input mask
        directly; the SAM decoder still runs on the downsampled mask to
        produce the object pointer."""
        out_scale, out_bias = 20.0, -10.0
        mask_f = mask_inputs.astype(jnp.float32)        # [B,1,H,W]
        high_res_masks = mask_f * out_scale + out_bias
        B, _, H, W = high_res_masks.shape
        low_res_masks = jax.image.resize(
            high_res_masks, (B, 1, H // 4, W // 4), method="bilinear",
            antialias=True)
        ious = jnp.ones((B, 1), jnp.float32)
        ds = self.mask_downsample(mask_f.transpose(0, 2, 3, 1)
                                  ).transpose(0, 3, 1, 2)
        _, _, _, _, _, obj_ptr, _ = self.forward_sam_heads(
            backbone_features, mask_inputs=ds,
            high_res_features=high_res_features)
        is_obj = jnp.any(mask_f.reshape(B, -1) > 0, axis=1)[:, None]
        lam = is_obj.astype(jnp.float32)
        obj_logits = out_scale * lam + out_bias
        obj_ptr = lam * obj_ptr + (1 - lam) * self.no_obj_ptr
        return (low_res_masks, high_res_masks, ious, low_res_masks,
                high_res_masks, obj_ptr, obj_logits)

    def encode_new_memory(self, pix_feat, high_res_masks,
                          is_mask_from_pts: bool = False):
        """sam2_base.py:664-702. pix_feat [B,h,w,C] (pre-conditioning
        features); high_res_masks [B,1,16h,16w] logits."""
        cfg = self.cfg
        if cfg.binarize_mask_from_pts_for_mem_enc and is_mask_from_pts:
            mask_for_mem = (high_res_masks > 0).astype(jnp.float32)
        else:
            mask_for_mem = jax.nn.sigmoid(high_res_masks)
        mask_for_mem = (mask_for_mem * cfg.sigmoid_scale_for_mem_enc
                        + cfg.sigmoid_bias_for_mem_enc)
        return self.memory_encoder(pix_feat, mask_for_mem)


class FrameOutput(NamedTuple):
    """Per-(object-group, frame) tracking output kept in the host dict."""
    maskmem: np.ndarray       # [B, h*w, mem_dim]
    obj_ptr: np.ndarray       # [B, C]
    is_cond: bool


class SAM2VideoPredictor:
    """Streaming multi-object video propagation
    (auto-seg/sam2/sam2_video_predictor.py semantics over the flax SAM2).

    Host API:
      init_state(frames)                      -> state dict
      add_new_mask(state, frame_idx, obj_id, mask)
      propagate_in_video(state, start_frame, reverse) -> yields
          (frame_idx, obj_ids, low_res_mask_logits [B,1,h*4,w*4])
    """

    def __init__(self, model: SAM2, params, max_frames_to_track=None):
        self.model = model
        self.params = params
        cfg = model.cfg
        self.num_maskmem = cfg.memory.num_maskmem
        self.max_obj_ptrs = cfg.memory.max_obj_ptrs
        self.mem_dim = cfg.memory.mem_dim
        self.C = cfg.decoder.dim
        # params as a jit ARGUMENT, not a closed-over constant: the
        # Hiera-L tree (~900 MB f32) would lower INTO the remote-compile
        # request and trip the tunnel's HTTP 413 body limit (the same
        # class as video_inference r3 and the LoRA step r4; hit here by
        # the first full-size --full-random quick_start run)
        self._encode = jax.jit(partial(model.apply,
                                       method=SAM2.forward_image))
        self._cond_step = jax.jit(self._cond_step_impl)
        self._track_step = jax.jit(self._track_step_impl,
                                   static_argnames=("n_ptr_tokens",))
        self._mem_pos = None

    # --------------------------------------------------- jitted steps

    def _cond_step_impl(self, params, feats, high0, high1, mask_inputs):
        """Prompted frame: mask-as-output + memory encode (binarized).
        Raw (unconditioned) features, as sam2_base.py:734-741."""
        m = self.model
        (low, high, _, _, _, obj_ptr, _) = m.apply(
            params, feats, [high0, high1], mask_inputs,
            method=SAM2.use_mask_as_output)
        # mask-prompted frames have point_inputs=None -> no binarization
        # (sam2_base.py:685-691); sigmoid of +-10 logits is ~0/1 anyway
        mem = m.apply(params, feats, high, False,
                      method=SAM2.encode_new_memory)
        return low, high, obj_ptr, mem

    def _track_step_impl(self, params, feats, curr_pos, high0, high1,
                         memory, memory_pos, n_ptr_tokens):
        """Unprompted frame: memory-condition -> SAM heads (multimask
        tracking) -> memory encode."""
        m = self.model
        cond = m.apply(params, feats, curr_pos, memory, memory_pos,
                       n_ptr_tokens, method=SAM2.condition_features)
        (_, _, ious, low, high, obj_ptr, obj_logits) = m.apply(
            params, cond, None, None, None, [high0, high1], True,
            method=SAM2.forward_sam_heads)
        mem = m.apply(params, feats, high, False,
                      method=SAM2.encode_new_memory)
        return low, high, obj_ptr, obj_logits, mem

    # --------------------------------------------------- host API

    def init_state(self, frames: np.ndarray) -> Dict:
        """frames [T,3,H,W] float in [0,1] at the model's image_size."""
        return {"frames": frames, "obj_ids": [], "prompts": {},
                "outputs": {}}       # outputs[(group_sig, t)] = FrameOutput

    def add_new_mask(self, state, frame_idx: int, obj_id, mask: np.ndarray):
        if obj_id not in state["obj_ids"]:
            state["obj_ids"].append(obj_id)
        state["prompts"].setdefault(int(frame_idx), {})[obj_id] = \
            mask.astype(np.float32)

    def _frame_feats(self, state, t):
        out = self._encode(self.params,
                           jnp.asarray(state["frames"][t:t + 1]))
        fpn = out["backbone_fpn"]
        pos = out["vision_pos_enc"][-1]          # [h, w, C]
        if self._mem_pos is None:
            # memory spatial pos enc at mem_dim channels (sine over h,w)
            from .hiera import sine_pos_embed
            h, w = fpn[-1].shape[1:3]
            self._mem_pos = np.asarray(
                sine_pos_embed(h, w, self.mem_dim)).reshape(-1, self.mem_dim)
        return fpn, pos

    def _group_signature(self, state, obj_id):
        return tuple(sorted(t for t, objs in state["prompts"].items()
                            if obj_id in objs))

    def _assemble_memory(self, state, sig, obj_list, t, reverse):
        """Build [B, M, mem_dim] memory + pos from cond frames (t_pos=0)
        and the previous num_maskmem-1 frames, plus past object pointers
        split into C/mem_dim tokens (sam2_base.py:516-636, r=1)."""
        outputs = state["outputs"]
        mems, poss = [], []
        tpos_enc = np.asarray(
            self.params["params"]["maskmem_tpos_enc"])  # [N,1,1,mem]
        cond_frames = [ct for ct in sig if (sig, ct) in outputs]
        for ct in cond_frames:
            o = outputs[(sig, ct)]
            mems.append(o.maskmem)
            poss.append(self._mem_pos[None] + tpos_enc[self.num_maskmem - 1])
        for t_pos in range(1, self.num_maskmem):
            t_rel = self.num_maskmem - t_pos
            prev = t + t_rel if reverse else t - t_rel
            o = outputs.get((sig, prev))
            if o is None or o.is_cond:
                continue
            mems.append(o.maskmem)
            poss.append(self._mem_pos[None]
                        + tpos_enc[self.num_maskmem - t_pos - 1])
        # object pointers: cond frames in the past + previous frames
        ptrs = []
        for ct in cond_frames:
            if (ct >= t if reverse else ct <= t):
                ptrs.append(outputs[(sig, ct)].obj_ptr)
        for t_diff in range(1, self.max_obj_ptrs):
            pt = t + t_diff if reverse else t - t_diff
            o = outputs.get((sig, pt))
            if o is not None and not o.is_cond:
                ptrs.append(o.obj_ptr)
        B = len(obj_list)
        hw = self._mem_pos.shape[0]
        mem = np.concatenate(mems, axis=1) if mems else \
            np.zeros((B, 0, self.mem_dim), np.float32)
        pos = np.concatenate([np.broadcast_to(p, (B, hw, self.mem_dim))
                              for p in poss], axis=1) if poss else \
            np.zeros((B, 0, self.mem_dim), np.float32)
        n_ptr_tokens = 0
        if ptrs:
            split = self.C // self.mem_dim
            p = np.stack(ptrs, axis=1)                  # [B, P, C]
            p = p.reshape(B, -1, split, self.mem_dim
                          ).reshape(B, -1, self.mem_dim)
            mem = np.concatenate([mem, p], axis=1)
            pos = np.concatenate(
                [pos, np.zeros_like(p)], axis=1)
            n_ptr_tokens = p.shape[1]
        return (jnp.asarray(mem), jnp.asarray(pos), n_ptr_tokens)

    def propagate_in_video(self, state, start_frame: int = 0,
                           reverse: bool = False):
        T = state["frames"].shape[0]
        order = range(start_frame, T) if not reverse else \
            range(start_frame, -1, -1)
        # group objects by prompt-frame signature (same signature = same
        # memory shapes = one batched program)
        groups: Dict[tuple, List] = {}
        for oid in state["obj_ids"]:
            groups.setdefault(self._group_signature(state, oid),
                              []).append(oid)

        for t in order:
            fpn, pos = self._frame_feats(state, t)
            h, w = fpn[-1].shape[1:3]
            all_ids, all_masks = [], []
            for sig, obj_list in groups.items():
                B = len(obj_list)
                featsB = jnp.broadcast_to(fpn[-1], (B,) + fpn[-1].shape[1:])
                high0 = jnp.broadcast_to(fpn[0], (B,) + fpn[0].shape[1:])
                high1 = jnp.broadcast_to(fpn[1], (B,) + fpn[1].shape[1:])
                if t in sig:
                    masks = np.stack([state["prompts"][t][oid]
                                      for oid in obj_list])[:, None]
                    low, high, obj_ptr, mem = self._cond_step(
                        self.params, featsB, high0, high1,
                        jnp.asarray(masks))
                    out = FrameOutput(
                        np.asarray(mem).reshape(B, h * w, self.mem_dim),
                        np.asarray(obj_ptr), True)
                else:
                    mem_in, mem_pos, n_ptr = self._assemble_memory(
                        state, sig, obj_list, t, reverse)
                    if mem_in.shape[1] == 0:
                        continue     # object not yet prompted on this pass
                    low, high, obj_ptr, obj_logits, mem = self._track_step(
                        self.params, featsB, pos, high0, high1,
                        mem_in, mem_pos, n_ptr_tokens=n_ptr)
                    out = FrameOutput(
                        np.asarray(mem).reshape(B, h * w, self.mem_dim),
                        np.asarray(obj_ptr), False)
                state["outputs"][(sig, t)] = out
                all_ids.extend(obj_list)
                all_masks.append(np.asarray(low))
            if all_masks:
                yield t, all_ids, np.concatenate(all_masks, axis=0)


def init_sam2_params(model: "SAM2", key: int = 0):
    """Initialize the full SAM2 param tree by touching every submodule
    (flax lazy init only creates params on the traced path). Used for
    random-weight smoke tests; real weights come from
    utils/convert.convert_sam2."""
    import jax
    S = model.cfg.image_size
    img = jnp.zeros((1, 3, S, S))

    def init_all(mdl, img):
        out = mdl.forward_image(img)
        feats = out["backbone_fpn"][-1]
        high = out["backbone_fpn"][:2]
        pos = out["vision_pos_enc"][-1]
        mask = jnp.zeros((1, 1, S, S))
        res = mdl.use_mask_as_output(feats, high, mask)
        high_masks = res[4]
        mem = mdl.encode_new_memory(feats, high_masks, False)
        hw = feats.shape[1] * feats.shape[2]
        memory = mem.reshape(1, hw, -1)
        cond = mdl.condition_features(feats, pos, memory,
                                      jnp.zeros_like(memory), 0)
        mdl.add_no_mem_embed(feats)
        return mdl.forward_sam_heads(cond, high_res_features=high,
                                     multimask_output=True)

    return SAM2.init(model, jax.random.PRNGKey(key), img, method=init_all)
