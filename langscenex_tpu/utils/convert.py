"""Weight conversion: torch state_dicts -> flax param trees.

The reference runs four foreign checkpoints (CogVideoX fine-tune, SAM1/
SAM2, VGGT-1B, OpenSeg; SURVEY.md §hard-parts #4). No network egress is
available in this environment, so conversion is exercised against
synthetic state_dicts in tests; the mappers are the contract for loading
real checkpoints later.

Conventions handled:
  torch Linear weight [out, in]  -> flax Dense kernel [in, out]
  torch Conv2d weight [O,I,kh,kw] -> flax Conv kernel [kh,kw,I,O]
  torch Conv3d weight [O,I,kt,kh,kw] -> [kt,kh,kw,I,O]
  torch LayerNorm weight/bias -> scale/bias
  torch BatchNorm running stats -> flax batch_stats collection
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def t2f_linear(w: np.ndarray, b=None) -> Dict[str, np.ndarray]:
    out = {"kernel": np.asarray(w).T}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def t2f_conv(w: np.ndarray, b=None) -> Dict[str, np.ndarray]:
    w = np.asarray(w)
    if w.ndim == 4:
        k = w.transpose(2, 3, 1, 0)
    elif w.ndim == 5:
        k = w.transpose(2, 3, 4, 1, 0)
    else:
        raise ValueError(f"conv weight rank {w.ndim}")
    out = {"kernel": k}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def t2f_layernorm(w: np.ndarray, b: np.ndarray) -> Dict[str, np.ndarray]:
    return {"scale": np.asarray(w), "bias": np.asarray(b)}


def t2f_batchnorm(sd: Dict[str, np.ndarray], prefix: str
                  ) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats) entries."""
    params = {"scale": np.asarray(sd[prefix + ".weight"]),
              "bias": np.asarray(sd[prefix + ".bias"])}
    stats = {"mean": np.asarray(sd[prefix + ".running_mean"]),
             "var": np.asarray(sd[prefix + ".running_var"])}
    return params, stats


def convert_autoencoder(sd: Dict[str, np.ndarray]) -> Dict:
    """Per-scene language AE (field_construction/auto_encoder.py layout:
    encoder = ModuleList[Linear, (BN, ReLU, Linear)*6],
    decoder = ModuleList[Linear, (ReLU, Linear)*6]) -> models/autoencoder
    flax params + batch_stats."""
    params = {"encoder": {}, "decoder": {}}
    stats = {"encoder": {}}
    # encoder module indices: Linear at 0, then (BN, ReLU, Linear) triples
    enc_linear_idx = [0] + [3 * i for i in range(1, 7)]
    enc_bn_idx = [3 * i - 2 for i in range(1, 7)]
    for j, mi in enumerate(enc_linear_idx):
        params["encoder"][f"Dense_{j}"] = t2f_linear(
            sd[f"encoder.{mi}.weight"], sd[f"encoder.{mi}.bias"])
    for j, mi in enumerate(enc_bn_idx):
        p, s = t2f_batchnorm(sd, f"encoder.{mi}")
        params["encoder"][f"BatchNorm_{j}"] = p
        stats["encoder"][f"BatchNorm_{j}"] = s
    dec_linear_idx = [0] + [2 * i for i in range(1, 7)]
    for j, mi in enumerate(dec_linear_idx):
        params["decoder"][f"Dense_{j}"] = t2f_linear(
            sd[f"decoder.{mi}.weight"], sd[f"decoder.{mi}.bias"])
    return {"params": params, "batch_stats": stats}


def convert_lpips_vgg(sd: Dict[str, np.ndarray]) -> Dict:
    """taming LPIPS checkpoint (net.slice*/lin* layout,
    cogvideox_interpolation/lpips.py) -> models/lpips flax params."""
    params = {"vgg": {}, }
    conv_i = 0
    # torchvision VGG16 features module indices of conv layers
    tv_conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for i, ti in enumerate(tv_conv_idx):
        wkey = f"net.features.{ti}.weight"
        if wkey not in sd:
            continue
        params["vgg"][f"conv_{conv_i}"] = t2f_conv(
            sd[wkey], sd.get(f"net.features.{ti}.bias"))
        conv_i += 1
    for i in range(5):
        k = f"lin{i}.model.1.weight"
        if k in sd:
            params[f"lin_{i}"] = t2f_conv(sd[k])
    return {"params": params}


def convert_cogvideox_dit(sd: Dict[str, np.ndarray],
                          fuse_qkv: bool = True,
                          head_dim: int = 64) -> Dict:
    """diffusers CogVideoXTransformer3DModel state_dict -> flax params for
    models/cogvideox/transformer.CogVideoXTransformer.

    Key layout (diffusers 0.30+, the class the reference instantiates at
    cogvideox_interpolation/pipeline.py:9-13): patch_embed.proj/.text_proj,
    time_embedding.linear_1/2, transformer_blocks.N.{norm1,attn1,norm2,ff},
    norm_final, norm_out.{norm,linear}, proj_out.

    proj_out rows are reordered: torch unpatchify emits (c, ph, pw) per
    token, ours emits (ph, pw, c).

    ``fuse_qkv`` (default — matches TransformerConfig.fuse_qkv): the
    separate torch to_q/to_k/to_v weights are interleaved PER HEAD into
    one ``to_qkv`` kernel [hidden, heads*3*head_dim] with column order
    [head h: q(head_dim) k(head_dim) v(head_dim)] — the layout the fused
    projection slices shard-locally under tensor parallelism.
    """
    p = {}
    p["patch_embed"] = t2f_conv(sd["patch_embed.proj.weight"],
                                sd["patch_embed.proj.bias"])
    p["text_proj"] = t2f_linear(sd["patch_embed.text_proj.weight"],
                                sd["patch_embed.text_proj.bias"])
    p["time_fc1"] = t2f_linear(sd["time_embedding.linear_1.weight"],
                               sd["time_embedding.linear_1.bias"])
    p["time_fc2"] = t2f_linear(sd["time_embedding.linear_2.weight"],
                               sd["time_embedding.linear_2.bias"])

    n_layers = 0
    while f"transformer_blocks.{n_layers}.norm1.linear.weight" in sd:
        n_layers += 1
    for i in range(n_layers):
        b = f"transformer_blocks.{i}"
        blk = {}
        for ours, theirs in (("norm1", "norm1"), ("norm2", "norm2")):
            blk[ours] = {
                "linear": t2f_linear(sd[f"{b}.{theirs}.linear.weight"],
                                     sd[f"{b}.{theirs}.linear.bias"]),
                "norm": t2f_layernorm(sd[f"{b}.{theirs}.norm.weight"],
                                      sd[f"{b}.{theirs}.norm.bias"]),
            }
        attn = {}
        if fuse_qkv:
            ws, bs = [], []
            for proj in ("to_q", "to_k", "to_v"):
                lin = t2f_linear(sd[f"{b}.attn1.{proj}.weight"],
                                 sd[f"{b}.attn1.{proj}.bias"])
                ws.append(lin["kernel"])          # [H_in, H_out]
                bs.append(lin["bias"])
            h_in, h_out = ws[0].shape
            # head_dim=64 is the CogVideoX-2b/5b value; a wrong value
            # that still divides h_out would reshape fine but interleave
            # the WRONG columns (silent numeric corruption) — derive it
            # from the model config at call sites (convert_cli passes
            # TransformerConfig().head_dim) and hard-fail on remainder.
            assert h_out % head_dim == 0, (
                f"head_dim {head_dim} does not divide attention width "
                f"{h_out} — pass the checkpoint's true head_dim")
            nh = h_out // head_dim
            # [H_in, nh, 3, head_dim] -> [H_in, nh*3*head_dim]
            k3 = np.stack([w.reshape(h_in, nh, head_dim) for w in ws],
                          axis=2).reshape(h_in, nh * 3 * head_dim)
            b3 = np.stack([v.reshape(nh, head_dim) for v in bs],
                          axis=1).reshape(nh * 3 * head_dim)
            attn["to_qkv"] = {"kernel": k3, "bias": b3}
        else:
            for proj in ("to_q", "to_k", "to_v"):
                attn[proj] = t2f_linear(sd[f"{b}.attn1.{proj}.weight"],
                                        sd[f"{b}.attn1.{proj}.bias"])
        attn["to_out"] = t2f_linear(sd[f"{b}.attn1.to_out.0.weight"],
                                    sd[f"{b}.attn1.to_out.0.bias"])
        for qk in ("norm_q", "norm_k"):
            attn[qk] = t2f_layernorm(sd[f"{b}.attn1.{qk}.weight"],
                                     sd[f"{b}.attn1.{qk}.bias"])
        blk["attn"] = attn
        blk["ff"] = {
            "fc1": t2f_linear(sd[f"{b}.ff.net.0.proj.weight"],
                              sd[f"{b}.ff.net.0.proj.bias"]),
            "fc2": t2f_linear(sd[f"{b}.ff.net.2.weight"],
                              sd[f"{b}.ff.net.2.bias"]),
        }
        p[f"block_{i}"] = blk

    p["norm_final"] = t2f_layernorm(sd["norm_final.weight"],
                                    sd["norm_final.bias"])
    p["norm_out_linear"] = t2f_linear(sd["norm_out.linear.weight"],
                                      sd["norm_out.linear.bias"])
    p["norm_out"] = t2f_layernorm(sd["norm_out.norm.weight"],
                                  sd["norm_out.norm.bias"])

    # proj_out: [C*ps*ps, inner] rows ordered (c, ph, pw) -> (ph, pw, c)
    w = np.asarray(sd["proj_out.weight"])
    bias = np.asarray(sd["proj_out.bias"])
    inner = w.shape[1]
    # patch size from the patch-embed conv
    ps = np.asarray(sd["patch_embed.proj.weight"]).shape[-1]
    c_out = w.shape[0] // (ps * ps)
    w = w.reshape(c_out, ps, ps, inner).transpose(1, 2, 0, 3
                                                  ).reshape(-1, inner)
    bias = bias.reshape(c_out, ps, ps).transpose(1, 2, 0).reshape(-1)
    p["proj_out"] = t2f_linear(w, bias)
    return {"params": p}


def convert_t5_encoder(sd: Dict[str, np.ndarray]) -> Dict:
    """torch T5EncoderModel state_dict -> flax params for
    models/t5_encoder.T5Encoder (validated numerically against torch at
    random init in tests/test_t5.py — no checkpoint download needed)."""
    p = {"token_embed": np.asarray(sd["shared.weight"])}
    n_layers = 0
    while f"encoder.block.{n_layers}.layer.0.layer_norm.weight" in sd:
        n_layers += 1
    for i in range(n_layers):
        b = f"encoder.block.{i}"
        attn = {proj: t2f_linear(
            sd[f"{b}.layer.0.SelfAttention.{proj}.weight"])
            for proj in ("q", "k", "v", "o")}
        if i == 0:
            attn["relative_attention_bias"] = np.asarray(
                sd[f"{b}.layer.0.SelfAttention."
                   f"relative_attention_bias.weight"])
        p[f"block_{i}"] = {
            "attn": attn,
            "ln_attn": {"weight": np.asarray(
                sd[f"{b}.layer.0.layer_norm.weight"])},
            "wi_0": t2f_linear(sd[f"{b}.layer.1.DenseReluDense.wi_0.weight"]),
            "wi_1": t2f_linear(sd[f"{b}.layer.1.DenseReluDense.wi_1.weight"]),
            "wo": t2f_linear(sd[f"{b}.layer.1.DenseReluDense.wo.weight"]),
            "ln_ff": {"weight": np.asarray(
                sd[f"{b}.layer.1.layer_norm.weight"])},
        }
    p["ln_final"] = {"weight": np.asarray(sd["encoder.final_layer_norm.weight"])}
    return {"params": p}


def _vggt_block(sd: Dict[str, np.ndarray], p: str) -> Dict:
    """One ViT block (vggt/layers/block.py layout: norm1/attn/ls?/norm2/
    mlp) -> models/vggt.ViTBlock params. LayerScale and qk-norm entries are
    emitted only when present in the state_dict."""
    attn = {"qkv": t2f_linear(sd[f"{p}.attn.qkv.weight"],
                              sd.get(f"{p}.attn.qkv.bias")),
            "proj": t2f_linear(sd[f"{p}.attn.proj.weight"],
                               sd.get(f"{p}.attn.proj.bias"))}
    if f"{p}.attn.q_norm.weight" in sd:
        attn["q_norm"] = t2f_layernorm(sd[f"{p}.attn.q_norm.weight"],
                                       sd[f"{p}.attn.q_norm.bias"])
        attn["k_norm"] = t2f_layernorm(sd[f"{p}.attn.k_norm.weight"],
                                       sd[f"{p}.attn.k_norm.bias"])
    blk = {
        "norm1": t2f_layernorm(sd[f"{p}.norm1.weight"],
                               sd[f"{p}.norm1.bias"]),
        "norm2": t2f_layernorm(sd[f"{p}.norm2.weight"],
                               sd[f"{p}.norm2.bias"]),
        "attn": attn,
        "mlp_fc1": t2f_linear(sd[f"{p}.mlp.fc1.weight"],
                              sd[f"{p}.mlp.fc1.bias"]),
        "mlp_fc2": t2f_linear(sd[f"{p}.mlp.fc2.weight"],
                              sd[f"{p}.mlp.fc2.bias"]),
    }
    if f"{p}.ls1.gamma" in sd:
        blk["ls1"] = {"gamma": np.asarray(sd[f"{p}.ls1.gamma"])}
        blk["ls2"] = {"gamma": np.asarray(sd[f"{p}.ls2.gamma"])}
    return blk


def _count(sd: Dict, fmt: str) -> int:
    n = 0
    while fmt.format(n) in sd:
        n += 1
    return n


def _vggt_dpt_head(sd: Dict[str, np.ndarray], h: str) -> Dict:
    """One DPT head (vggt/heads/dpt_head.py layout) -> models/vggt.DPTHead
    params. ConvTranspose resize weights stay in torch (Cin,Cout,k,k)
    layout — StridedDeconv consumes them verbatim."""
    d = {"norm": t2f_layernorm(sd[f"{h}.norm.weight"], sd[f"{h}.norm.bias"])}
    for i in range(4):
        d[f"projects_{i}"] = t2f_conv(sd[f"{h}.projects.{i}.weight"],
                                      sd[f"{h}.projects.{i}.bias"])
    for i in (0, 1):
        d[f"resize_layers_{i}"] = {
            "weight": np.asarray(sd[f"{h}.resize_layers.{i}.weight"]),
            "bias": np.asarray(sd[f"{h}.resize_layers.{i}.bias"])}
    d["resize_layers_3"] = t2f_conv(sd[f"{h}.resize_layers.3.weight"],
                                    sd[f"{h}.resize_layers.3.bias"])
    for i in range(1, 5):
        d[f"layer{i}_rn"] = t2f_conv(sd[f"{h}.scratch.layer{i}_rn.weight"])
    for i in range(1, 5):
        r = f"{h}.scratch.refinenet{i}"
        blk = {}
        for unit in ("resConfUnit1", "resConfUnit2"):
            if f"{r}.{unit}.conv1.weight" in sd:
                blk[unit] = {
                    "conv1": t2f_conv(sd[f"{r}.{unit}.conv1.weight"],
                                      sd[f"{r}.{unit}.conv1.bias"]),
                    "conv2": t2f_conv(sd[f"{r}.{unit}.conv2.weight"],
                                      sd[f"{r}.{unit}.conv2.bias"])}
        blk["out_conv"] = t2f_conv(sd[f"{r}.out_conv.weight"],
                                   sd[f"{r}.out_conv.bias"])
        d[f"refinenet{i}"] = blk
    d["output_conv1"] = t2f_conv(sd[f"{h}.scratch.output_conv1.weight"],
                                 sd[f"{h}.scratch.output_conv1.bias"])
    # feature-only heads (track feature extractor) have no output_conv2
    if f"{h}.scratch.output_conv2.0.weight" in sd:
        d["output_conv2_0"] = t2f_conv(
            sd[f"{h}.scratch.output_conv2.0.weight"],
            sd[f"{h}.scratch.output_conv2.0.bias"])
        d["output_conv2_2"] = t2f_conv(
            sd[f"{h}.scratch.output_conv2.2.weight"],
            sd[f"{h}.scratch.output_conv2.2.bias"])
    return d


def _track_attn(sd: Dict, p: str, name: str) -> Dict:
    """torch nn.MultiheadAttention -> models/vggt_track.MHA (fused
    in_proj kept verbatim — the flax module applies x @ W[:d].T like
    F.linear)."""
    return {"in_proj_weight": np.asarray(sd[f"{p}.in_proj_weight"]),
            "in_proj_bias": np.asarray(sd[f"{p}.in_proj_bias"]),
            "out_proj": t2f_linear(sd[f"{p}.out_proj.weight"],
                                   sd[f"{p}.out_proj.bias"])}


def _track_attn_block(sd: Dict, p: str, cross: bool) -> Dict:
    blk = {"norm1": t2f_layernorm(sd[f"{p}.norm1.weight"],
                                  sd[f"{p}.norm1.bias"]),
           "norm2": t2f_layernorm(sd[f"{p}.norm2.weight"],
                                  sd[f"{p}.norm2.bias"]),
           "mlp": {"fc1": t2f_linear(sd[f"{p}.mlp.fc1.weight"],
                                     sd[f"{p}.mlp.fc1.bias"]),
                   "fc2": t2f_linear(sd[f"{p}.mlp.fc2.weight"],
                                     sd[f"{p}.mlp.fc2.bias"])}}
    if cross:
        blk["norm_context"] = t2f_layernorm(
            sd[f"{p}.norm_context.weight"], sd[f"{p}.norm_context.bias"])
        blk["cross_attn"] = _track_attn(sd, f"{p}.cross_attn", "cross_attn")
    else:
        blk["attn"] = _track_attn(sd, f"{p}.attn", "attn")
    return blk


def _vggt_track_head(sd: Dict[str, np.ndarray]) -> Dict:
    """track_head.* keys (vggt/heads/track_head.py + track_modules/*)
    -> models/vggt.TrackHead params."""
    t = "track_head.tracker"
    uf = {"input_norm": t2f_layernorm(
              sd[f"{t}.updateformer.input_norm.weight"],
              sd[f"{t}.updateformer.input_norm.bias"]),
          "input_transform": t2f_linear(
              sd[f"{t}.updateformer.input_transform.weight"],
              sd[f"{t}.updateformer.input_transform.bias"]),
          "output_norm": t2f_layernorm(
              sd[f"{t}.updateformer.output_norm.weight"],
              sd[f"{t}.updateformer.output_norm.bias"]),
          "flow_head": t2f_linear(
              sd[f"{t}.updateformer.flow_head.weight"],
              sd[f"{t}.updateformer.flow_head.bias"]),
          "virual_tracks": np.asarray(
              sd[f"{t}.updateformer.virual_tracks"])}
    i = 0
    while f"{t}.updateformer.time_blocks.{i}.norm1.weight" in sd:
        uf[f"time_blocks_{i}"] = _track_attn_block(
            sd, f"{t}.updateformer.time_blocks.{i}", False)
        i += 1
    j = 0
    while f"{t}.updateformer.space_virtual_blocks.{j}.norm1.weight" in sd:
        uf[f"space_virtual_blocks_{j}"] = _track_attn_block(
            sd, f"{t}.updateformer.space_virtual_blocks.{j}", False)
        uf[f"space_point2virtual_blocks_{j}"] = _track_attn_block(
            sd, f"{t}.updateformer.space_point2virtual_blocks.{j}", True)
        uf[f"space_virtual2point_blocks_{j}"] = _track_attn_block(
            sd, f"{t}.updateformer.space_virtual2point_blocks.{j}", True)
        j += 1

    tracker = {
        "updateformer": uf,
        "fmap_norm": t2f_layernorm(sd[f"{t}.fmap_norm.weight"],
                                   sd[f"{t}.fmap_norm.bias"]),
        # GroupNorm(1, C) == LayerNorm over C (same formula, eps 1e-5)
        "ffeat_norm": t2f_layernorm(sd[f"{t}.ffeat_norm.weight"],
                                    sd[f"{t}.ffeat_norm.bias"]),
        "corr_mlp": {"fc1": t2f_linear(sd[f"{t}.corr_mlp.fc1.weight"],
                                       sd[f"{t}.corr_mlp.fc1.bias"]),
                     "fc2": t2f_linear(sd[f"{t}.corr_mlp.fc2.weight"],
                                       sd[f"{t}.corr_mlp.fc2.bias"])},
        "ffeat_updater_0": t2f_linear(sd[f"{t}.ffeat_updater.0.weight"],
                                      sd[f"{t}.ffeat_updater.0.bias"]),
        "vis_predictor_0": t2f_linear(sd[f"{t}.vis_predictor.0.weight"],
                                      sd[f"{t}.vis_predictor.0.bias"]),
        "query_ref_token": np.asarray(sd[f"{t}.query_ref_token"]),
    }
    if f"{t}.conf_predictor.0.weight" in sd:
        tracker["conf_predictor_0"] = t2f_linear(
            sd[f"{t}.conf_predictor.0.weight"],
            sd[f"{t}.conf_predictor.0.bias"])
    return {"feature_extractor": _vggt_dpt_head(
                sd, "track_head.feature_extractor"),
            "tracker": tracker}


def convert_vggt(sd: Dict[str, np.ndarray],
                 include_track: bool = False) -> Dict:
    """facebook/VGGT-1B state_dict (vggt/models/vggt.py:18-26 layout:
    aggregator{patch_embed=DINOv2 ViT-L/14-reg, frame_blocks, global_blocks,
    camera_token, register_token}, camera_head, depth_head, point_head,
    track_head) -> flax params for models/vggt.VGGT.

    ``include_track`` emits the track_head subtree (only load it into a
    model with cfg.enable_track_head=True — flax apply is strict about
    extra params; the pipeline's pose path never needs it). The DINOv2
    mask_token is dropped (unused buffer).
    Numerically validated against a random-init torch mirror in
    tests/test_vggt.py::TestVGGTConversion."""
    agg = {}
    # DINOv2 patch-embed ViT
    pe = {"patch_embed_proj": t2f_conv(
        sd["aggregator.patch_embed.patch_embed.proj.weight"],
        sd["aggregator.patch_embed.patch_embed.proj.bias"]),
        "cls_token": np.asarray(sd["aggregator.patch_embed.cls_token"]),
        "pos_embed": np.asarray(sd["aggregator.patch_embed.pos_embed"]),
        "register_tokens": np.asarray(
            sd["aggregator.patch_embed.register_tokens"]),
        "norm": t2f_layernorm(sd["aggregator.patch_embed.norm.weight"],
                              sd["aggregator.patch_embed.norm.bias"])}
    n_vit = _count(sd, "aggregator.patch_embed.blocks.{}.norm1.weight")
    for i in range(n_vit):
        pe[f"blocks_{i}"] = _vggt_block(
            sd, f"aggregator.patch_embed.blocks.{i}")
    agg["patch_embed"] = pe

    agg["camera_token"] = np.asarray(sd["aggregator.camera_token"])
    agg["register_token"] = np.asarray(sd["aggregator.register_token"])
    n_aa = _count(sd, "aggregator.frame_blocks.{}.norm1.weight")
    for i in range(n_aa):
        agg[f"frame_blocks_{i}"] = _vggt_block(
            sd, f"aggregator.frame_blocks.{i}")
        agg[f"global_blocks_{i}"] = _vggt_block(
            sd, f"aggregator.global_blocks.{i}")

    cam = {
        "token_norm": t2f_layernorm(sd["camera_head.token_norm.weight"],
                                    sd["camera_head.token_norm.bias"]),
        "trunk_norm": t2f_layernorm(sd["camera_head.trunk_norm.weight"],
                                    sd["camera_head.trunk_norm.bias"]),
        "empty_pose_tokens": np.asarray(sd["camera_head.empty_pose_tokens"]),
        "embed_pose": t2f_linear(sd["camera_head.embed_pose.weight"],
                                 sd["camera_head.embed_pose.bias"]),
        # nn.Sequential(SiLU, Linear) — params live at index 1
        "poseLN_modulation": t2f_linear(
            sd["camera_head.poseLN_modulation.1.weight"],
            sd["camera_head.poseLN_modulation.1.bias"]),
        "pose_branch_fc1": t2f_linear(
            sd["camera_head.pose_branch.fc1.weight"],
            sd["camera_head.pose_branch.fc1.bias"]),
        "pose_branch_fc2": t2f_linear(
            sd["camera_head.pose_branch.fc2.weight"],
            sd["camera_head.pose_branch.fc2.bias"]),
    }
    n_trunk = _count(sd, "camera_head.trunk.{}.norm1.weight")
    for i in range(n_trunk):
        cam[f"trunk_{i}"] = _vggt_block(sd, f"camera_head.trunk.{i}")

    p = {"aggregator": agg, "camera_head": cam}
    if "depth_head.norm.weight" in sd:
        p["depth_head"] = _vggt_dpt_head(sd, "depth_head")
    if "point_head.norm.weight" in sd:
        p["point_head"] = _vggt_dpt_head(sd, "point_head")
    if include_track and "track_head.tracker.fmap_norm.weight" in sd:
        p["track_head"] = _vggt_track_head(sd)
    return {"params": p}


def _sam2_attn_ds(sd: Dict, p: str) -> Dict:
    """sam/transformer.py Attention/RoPEAttention: q/k/v/out projections."""
    return {f"{n}_proj": t2f_linear(sd[f"{p}.{n}_proj.weight"],
                                    sd[f"{p}.{n}_proj.bias"])
            for n in ("q", "k", "v", "out")}


def _sam2_hiera_block(sd: Dict, p: str) -> Dict:
    blk = {
        "norm1": t2f_layernorm(sd[f"{p}.norm1.weight"],
                               sd[f"{p}.norm1.bias"]),
        "norm2": t2f_layernorm(sd[f"{p}.norm2.weight"],
                               sd[f"{p}.norm2.bias"]),
        "attn": {"qkv": t2f_linear(sd[f"{p}.attn.qkv.weight"],
                                   sd[f"{p}.attn.qkv.bias"]),
                 "proj": t2f_linear(sd[f"{p}.attn.proj.weight"],
                                    sd[f"{p}.attn.proj.bias"])},
        "mlp_fc1": t2f_linear(sd[f"{p}.mlp.layers.0.weight"],
                              sd[f"{p}.mlp.layers.0.bias"]),
        "mlp_fc2": t2f_linear(sd[f"{p}.mlp.layers.1.weight"],
                              sd[f"{p}.mlp.layers.1.bias"]),
    }
    if f"{p}.proj.weight" in sd:
        blk["proj"] = t2f_linear(sd[f"{p}.proj.weight"],
                                 sd[f"{p}.proj.bias"])
    return blk


def _sam2_mlp(sd: Dict, p: str, n: int) -> Dict:
    return {f"layers_{i}": t2f_linear(sd[f"{p}.layers.{i}.weight"],
                                      sd[f"{p}.layers.{i}.bias"])
            for i in range(n)}


def convert_sam2(sd: Dict[str, np.ndarray]) -> Dict:
    """sam2_hiera_large.pt ``model`` state_dict -> flax params for
    models/sam2.SAM2. Covers the full video-predictor graph: Hiera trunk +
    FPN neck, prompt encoder, two-way mask decoder (incl. conv_s0/s1 and
    object-score head), memory attention (RoPE), memory encoder (ConvNeXt
    fuser), and the sam2_base glue params (no_mem_embed, maskmem_tpos_enc,
    no_obj_ptr, obj_ptr_proj, mask_downsample).
    Validated numerically against a random-init torch mirror in
    tests/test_sam2.py::TestSAM2Conversion."""
    # ---- image encoder
    trunk = {
        "patch_embed_proj": t2f_conv(
            sd["image_encoder.trunk.patch_embed.proj.weight"],
            sd["image_encoder.trunk.patch_embed.proj.bias"]),
        "pos_embed": np.asarray(
            sd["image_encoder.trunk.pos_embed"]).transpose(0, 2, 3, 1),
        "pos_embed_window": np.asarray(
            sd["image_encoder.trunk.pos_embed_window"]).transpose(0, 2, 3, 1),
    }
    n_blocks = _count(sd, "image_encoder.trunk.blocks.{}.norm1.weight")
    for i in range(n_blocks):
        trunk[f"blocks_{i}"] = _sam2_hiera_block(
            sd, f"image_encoder.trunk.blocks.{i}")
    n_convs = _count(sd, "image_encoder.neck.convs.{}.conv.weight")
    neck = {f"convs_{j}": t2f_conv(
        sd[f"image_encoder.neck.convs.{j}.conv.weight"],
        sd[f"image_encoder.neck.convs.{j}.conv.bias"])
        for j in range(n_convs)}

    # ---- prompt encoder
    pe = {"pe_gaussian": np.asarray(
        sd["sam_prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]),
        "not_a_point_embed": np.asarray(
            sd["sam_prompt_encoder.not_a_point_embed.weight"]),
        "no_mask_embed": np.asarray(
            sd["sam_prompt_encoder.no_mask_embed.weight"])}
    for i in range(4):
        pe[f"point_embeddings_{i}"] = np.asarray(
            sd[f"sam_prompt_encoder.point_embeddings.{i}.weight"])
    for j in (0, 3, 6):
        pe[f"mask_downscaling_{j}"] = t2f_conv(
            sd[f"sam_prompt_encoder.mask_downscaling.{j}.weight"],
            sd[f"sam_prompt_encoder.mask_downscaling.{j}.bias"])
    for j in (1, 4):
        pe[f"mask_downscaling_{j}"] = t2f_layernorm(
            sd[f"sam_prompt_encoder.mask_downscaling.{j}.weight"],
            sd[f"sam_prompt_encoder.mask_downscaling.{j}.bias"])

    # ---- mask decoder
    md = {"obj_score_token": np.asarray(
        sd["sam_mask_decoder.obj_score_token.weight"]),
        "iou_token": np.asarray(sd["sam_mask_decoder.iou_token.weight"]),
        "mask_tokens": np.asarray(sd["sam_mask_decoder.mask_tokens.weight"])}
    tw = {}
    n_tw = _count(sd, "sam_mask_decoder.transformer.layers.{}.norm1.weight")
    for i in range(n_tw):
        p = f"sam_mask_decoder.transformer.layers.{i}"
        tw[f"layers_{i}"] = {
            "self_attn": _sam2_attn_ds(sd, f"{p}.self_attn"),
            "cross_attn_token_to_image": _sam2_attn_ds(
                sd, f"{p}.cross_attn_token_to_image"),
            "cross_attn_image_to_token": _sam2_attn_ds(
                sd, f"{p}.cross_attn_image_to_token"),
            "mlp_layers_0": t2f_linear(sd[f"{p}.mlp.layers.0.weight"],
                                       sd[f"{p}.mlp.layers.0.bias"]),
            "mlp_layers_1": t2f_linear(sd[f"{p}.mlp.layers.1.weight"],
                                       sd[f"{p}.mlp.layers.1.bias"]),
            **{f"norm{k}": t2f_layernorm(sd[f"{p}.norm{k}.weight"],
                                         sd[f"{p}.norm{k}.bias"])
               for k in (1, 2, 3, 4)},
        }
    tw["final_attn_token_to_image"] = _sam2_attn_ds(
        sd, "sam_mask_decoder.transformer.final_attn_token_to_image")
    tw["norm_final_attn"] = t2f_layernorm(
        sd["sam_mask_decoder.transformer.norm_final_attn.weight"],
        sd["sam_mask_decoder.transformer.norm_final_attn.bias"])
    md["transformer"] = tw
    for j in (0, 3):
        md[f"output_upscaling_{j}"] = {
            "weight": np.asarray(
                sd[f"sam_mask_decoder.output_upscaling.{j}.weight"]),
            "bias": np.asarray(
                sd[f"sam_mask_decoder.output_upscaling.{j}.bias"])}
    md["output_upscaling_1"] = t2f_layernorm(
        sd["sam_mask_decoder.output_upscaling.1.weight"],
        sd["sam_mask_decoder.output_upscaling.1.bias"])
    n_hyper = _count(
        sd, "sam_mask_decoder.output_hypernetworks_mlps.{}.layers.0.weight")
    for i in range(n_hyper):
        md[f"output_hypernetworks_mlps_{i}"] = _sam2_mlp(
            sd, f"sam_mask_decoder.output_hypernetworks_mlps.{i}", 3)
    md["iou_prediction_head"] = _sam2_mlp(
        sd, "sam_mask_decoder.iou_prediction_head", 3)
    md["pred_obj_score_head"] = _sam2_mlp(
        sd, "sam_mask_decoder.pred_obj_score_head", 3)

    # ---- memory attention
    ma = {"norm": t2f_layernorm(sd["memory_attention.norm.weight"],
                                sd["memory_attention.norm.bias"])}
    n_ma = _count(sd, "memory_attention.layers.{}.norm1.weight")
    for i in range(n_ma):
        p = f"memory_attention.layers.{i}"
        ma[f"layers_{i}"] = {
            "self_attn": _sam2_attn_ds(sd, f"{p}.self_attn"),
            "cross_attn_image": _sam2_attn_ds(sd, f"{p}.cross_attn_image"),
            "linear1": t2f_linear(sd[f"{p}.linear1.weight"],
                                  sd[f"{p}.linear1.bias"]),
            "linear2": t2f_linear(sd[f"{p}.linear2.weight"],
                                  sd[f"{p}.linear2.bias"]),
            **{f"norm{k}": t2f_layernorm(sd[f"{p}.norm{k}.weight"],
                                         sd[f"{p}.norm{k}.bias"])
               for k in (1, 2, 3)},
        }

    # ---- memory encoder
    mds = {}
    for i in range(4):
        mds[f"encoder_{3 * i}"] = t2f_conv(
            sd[f"memory_encoder.mask_downsampler.encoder.{3 * i}.weight"],
            sd[f"memory_encoder.mask_downsampler.encoder.{3 * i}.bias"])
        mds[f"encoder_{3 * i + 1}"] = t2f_layernorm(
            sd[f"memory_encoder.mask_downsampler.encoder.{3 * i + 1}.weight"],
            sd[f"memory_encoder.mask_downsampler.encoder.{3 * i + 1}.bias"])
    mds["encoder_12"] = t2f_conv(
        sd["memory_encoder.mask_downsampler.encoder.12.weight"],
        sd["memory_encoder.mask_downsampler.encoder.12.bias"])
    me = {"mask_downsampler": mds,
          "pix_feat_proj": t2f_conv(
              sd["memory_encoder.pix_feat_proj.weight"],
              sd["memory_encoder.pix_feat_proj.bias"]),
          "out_proj": t2f_conv(sd["memory_encoder.out_proj.weight"],
                               sd["memory_encoder.out_proj.bias"])}
    n_fuse = _count(sd, "memory_encoder.fuser.layers.{}.dwconv.weight")
    for i in range(n_fuse):
        p = f"memory_encoder.fuser.layers.{i}"
        me[f"fuser_layers_{i}"] = {
            "dwconv": t2f_conv(sd[f"{p}.dwconv.weight"],
                               sd[f"{p}.dwconv.bias"]),
            "norm": t2f_layernorm(sd[f"{p}.norm.weight"],
                                  sd[f"{p}.norm.bias"]),
            "pwconv1": t2f_linear(sd[f"{p}.pwconv1.weight"],
                                  sd[f"{p}.pwconv1.bias"]),
            "pwconv2": t2f_linear(sd[f"{p}.pwconv2.weight"],
                                  sd[f"{p}.pwconv2.bias"]),
            "gamma": np.asarray(sd[f"{p}.gamma"]),
        }

    p = {
        "image_encoder": {"trunk": trunk, "neck": neck},
        "sam_prompt_encoder": pe,
        "sam_mask_decoder": md,
        "memory_attention": ma,
        "memory_encoder": me,
        "conv_s0": t2f_conv(sd["sam_mask_decoder.conv_s0.weight"],
                            sd["sam_mask_decoder.conv_s0.bias"]),
        "conv_s1": t2f_conv(sd["sam_mask_decoder.conv_s1.weight"],
                            sd["sam_mask_decoder.conv_s1.bias"]),
        "no_mem_embed": np.asarray(sd["no_mem_embed"]),
        "no_mem_pos_enc": np.asarray(sd["no_mem_pos_enc"]),
        "maskmem_tpos_enc": np.asarray(sd["maskmem_tpos_enc"]),
        "no_obj_ptr": np.asarray(sd["no_obj_ptr"]),
        "mask_downsample": t2f_conv(sd["mask_downsample.weight"],
                                    sd["mask_downsample.bias"]),
    }
    for i in range(3):
        p[f"obj_ptr_proj_{i}"] = t2f_linear(
            sd[f"obj_ptr_proj.layers.{i}.weight"],
            sd[f"obj_ptr_proj.layers.{i}.bias"])
    return {"params": p}


def convert_sam1(sd: Dict[str, np.ndarray]) -> Dict:
    """sam_vit_h_4b8939.pth state_dict (segment-anything-1 layout:
    image_encoder ViTDet backbone with decomposed rel-pos, prompt_encoder,
    mask_decoder) -> flax params for models/sam1.SAM1.
    Validated numerically against a random-init torch mirror in
    tests/test_sam1.py."""
    enc = {"patch_embed_proj": t2f_conv(
        sd["image_encoder.patch_embed.proj.weight"],
        sd["image_encoder.patch_embed.proj.bias"]),
        "pos_embed": np.asarray(sd["image_encoder.pos_embed"])}
    n_blocks = _count(sd, "image_encoder.blocks.{}.norm1.weight")
    for i in range(n_blocks):
        p = f"image_encoder.blocks.{i}"
        enc[f"blocks_{i}"] = {
            "norm1": t2f_layernorm(sd[f"{p}.norm1.weight"],
                                   sd[f"{p}.norm1.bias"]),
            "norm2": t2f_layernorm(sd[f"{p}.norm2.weight"],
                                   sd[f"{p}.norm2.bias"]),
            "attn": {
                "qkv": t2f_linear(sd[f"{p}.attn.qkv.weight"],
                                  sd[f"{p}.attn.qkv.bias"]),
                "proj": t2f_linear(sd[f"{p}.attn.proj.weight"],
                                   sd[f"{p}.attn.proj.bias"]),
                "rel_pos_h": np.asarray(sd[f"{p}.attn.rel_pos_h"]),
                "rel_pos_w": np.asarray(sd[f"{p}.attn.rel_pos_w"]),
            },
            "mlp_lin1": t2f_linear(sd[f"{p}.mlp.lin1.weight"],
                                   sd[f"{p}.mlp.lin1.bias"]),
            "mlp_lin2": t2f_linear(sd[f"{p}.mlp.lin2.weight"],
                                   sd[f"{p}.mlp.lin2.bias"]),
        }
    enc["neck_0"] = t2f_conv(sd["image_encoder.neck.0.weight"])
    enc["neck_1"] = t2f_layernorm(sd["image_encoder.neck.1.weight"],
                                  sd["image_encoder.neck.1.bias"])
    enc["neck_2"] = t2f_conv(sd["image_encoder.neck.2.weight"])
    enc["neck_3"] = t2f_layernorm(sd["image_encoder.neck.3.weight"],
                                  sd["image_encoder.neck.3.bias"])

    # mask_downscaling.* keys are intentionally dropped: the pipeline's
    # SAM1 usage is point-grid prompting only (automatic_mask_generator
    # feeds no mask prompts), so the flax module never builds that path
    pe = {"pe_gaussian": np.asarray(
        sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]),
        "not_a_point_embed": np.asarray(
            sd["prompt_encoder.not_a_point_embed.weight"]),
        "no_mask_embed": np.asarray(sd["prompt_encoder.no_mask_embed.weight"])}
    for i in range(4):
        pe[f"point_embeddings_{i}"] = np.asarray(
            sd[f"prompt_encoder.point_embeddings.{i}.weight"])

    md = {"iou_token": np.asarray(sd["mask_decoder.iou_token.weight"]),
          "mask_tokens": np.asarray(sd["mask_decoder.mask_tokens.weight"])}
    tw = {}
    n_tw = _count(sd, "mask_decoder.transformer.layers.{}.norm1.weight")
    for i in range(n_tw):
        p = f"mask_decoder.transformer.layers.{i}"
        tw[f"layers_{i}"] = {
            "self_attn": _sam2_attn_ds(sd, f"{p}.self_attn"),
            "cross_attn_token_to_image": _sam2_attn_ds(
                sd, f"{p}.cross_attn_token_to_image"),
            "cross_attn_image_to_token": _sam2_attn_ds(
                sd, f"{p}.cross_attn_image_to_token"),
            "mlp_layers_0": t2f_linear(sd[f"{p}.mlp.lin1.weight"],
                                       sd[f"{p}.mlp.lin1.bias"]),
            "mlp_layers_1": t2f_linear(sd[f"{p}.mlp.lin2.weight"],
                                       sd[f"{p}.mlp.lin2.bias"]),
            **{f"norm{k}": t2f_layernorm(sd[f"{p}.norm{k}.weight"],
                                         sd[f"{p}.norm{k}.bias"])
               for k in (1, 2, 3, 4)},
        }
    tw["final_attn_token_to_image"] = _sam2_attn_ds(
        sd, "mask_decoder.transformer.final_attn_token_to_image")
    tw["norm_final_attn"] = t2f_layernorm(
        sd["mask_decoder.transformer.norm_final_attn.weight"],
        sd["mask_decoder.transformer.norm_final_attn.bias"])
    md["transformer"] = tw
    for j in (0, 3):
        md[f"output_upscaling_{j}"] = {
            "weight": np.asarray(sd[f"mask_decoder.output_upscaling.{j}.weight"]),
            "bias": np.asarray(sd[f"mask_decoder.output_upscaling.{j}.bias"])}
    md["output_upscaling_1"] = t2f_layernorm(
        sd["mask_decoder.output_upscaling.1.weight"],
        sd["mask_decoder.output_upscaling.1.bias"])
    n_hyper = _count(
        sd, "mask_decoder.output_hypernetworks_mlps.{}.layers.0.weight")
    for i in range(n_hyper):
        md[f"output_hypernetworks_mlps_{i}"] = _sam2_mlp(
            sd, f"mask_decoder.output_hypernetworks_mlps.{i}", 3)
    md["iou_prediction_head"] = _sam2_mlp(
        sd, "mask_decoder.iou_prediction_head", 3)

    return {"params": {"image_encoder": enc, "prompt_encoder": pe,
                       "mask_decoder": md}}


def t2f_conv2d_as_3d(w: np.ndarray, b=None) -> Dict[str, np.ndarray]:
    """torch Conv2d [O,I,kh,kw] -> flax 3D kernel [1,kh,kw,I,O] (per-frame
    conv expressed as a kt=1 3D conv)."""
    k = np.asarray(w).transpose(2, 3, 1, 0)[None]
    out = {"kernel": k}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def _cvx_groupnorm(sd: Dict, p: str) -> Dict:
    return t2f_layernorm(sd[f"{p}.weight"], sd[f"{p}.bias"])


def _cvx_causal(sd: Dict, p: str) -> Dict:
    return {"conv": t2f_conv(sd[f"{p}.conv.weight"], sd[f"{p}.conv.bias"])}


def _cvx_spatial_norm(sd: Dict, p: str) -> Dict:
    return {"norm_layer": _cvx_groupnorm(sd, f"{p}.norm_layer"),
            "conv_y": _cvx_causal(sd, f"{p}.conv_y"),
            "conv_b": _cvx_causal(sd, f"{p}.conv_b")}


def _cvx_resnet(sd: Dict, p: str, spatial: bool) -> Dict:
    r = {"conv1": _cvx_causal(sd, f"{p}.conv1"),
         "conv2": _cvx_causal(sd, f"{p}.conv2")}
    for n in ("norm1", "norm2"):
        r[n] = _cvx_spatial_norm(sd, f"{p}.{n}") if spatial \
            else _cvx_groupnorm(sd, f"{p}.{n}")
    if f"{p}.conv_shortcut.weight" in sd:
        r["conv_shortcut"] = t2f_conv(sd[f"{p}.conv_shortcut.weight"],
                                      sd[f"{p}.conv_shortcut.bias"])
    return r


def convert_cogvideox_vae(sd: Dict[str, np.ndarray]) -> Dict:
    """diffusers AutoencoderKLCogVideoX state_dict (the class the
    reference instantiates at cogvideox_interpolation/pipeline.py:135-140;
    layout of diffusers 0.30+: encoder/decoder.{conv_in, down/up_blocks.N.
    {resnets,downsamplers/upsamplers}, mid_block.resnets, norm_out,
    conv_out}, decoder norms = CogVideoXSpatialNorm3D, no quant convs)
    -> flax params for models/cogvideox/vae.AutoencoderKL3D.
    Validated numerically against a random-init torch mirror in
    tests/test_vae.py::TestVAEConversion."""
    enc = {"conv_in": _cvx_causal(sd, "encoder.conv_in"),
           "conv_out": _cvx_causal(sd, "encoder.conv_out"),
           "norm_out": _cvx_groupnorm(sd, "encoder.norm_out")}
    n_blocks = _count(
        sd, "encoder.down_blocks.{}.resnets.0.conv1.conv.weight")
    for i in range(n_blocks):
        j = 0
        while f"encoder.down_blocks.{i}.resnets.{j}.conv1.conv.weight" in sd:
            enc[f"down_blocks_{i}_resnets_{j}"] = _cvx_resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}", False)
            j += 1
        dkey = f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"
        if dkey in sd:
            enc[f"down_blocks_{i}_downsamplers_0"] = {
                "conv": t2f_conv2d_as_3d(
                    sd[dkey],
                    sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"])}
    for j in (0, 1):
        enc[f"mid_resnets_{j}"] = _cvx_resnet(
            sd, f"encoder.mid_block.resnets.{j}", False)

    dec = {"conv_in": _cvx_causal(sd, "decoder.conv_in"),
           "conv_out": _cvx_causal(sd, "decoder.conv_out"),
           "norm_out": _cvx_spatial_norm(sd, "decoder.norm_out")}
    n_up = _count(sd, "decoder.up_blocks.{}.resnets.0.conv1.conv.weight")
    for i in range(n_up):
        j = 0
        while f"decoder.up_blocks.{i}.resnets.{j}.conv1.conv.weight" in sd:
            dec[f"up_blocks_{i}_resnets_{j}"] = _cvx_resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}", True)
            j += 1
        ukey = f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"
        if ukey in sd:
            dec[f"up_blocks_{i}_upsamplers_0"] = {
                "conv": t2f_conv2d_as_3d(
                    sd[ukey],
                    sd[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"])}
    for j in (0, 1):
        dec[f"mid_resnets_{j}"] = _cvx_resnet(
            sd, f"decoder.mid_block.resnets.{j}", True)

    return {"params": {"encoder": enc, "decoder": dec}}


def convert_clip_vision(sd: Dict[str, np.ndarray]) -> Dict:
    """HuggingFace ``CLIPVisionModelWithProjection`` state_dict
    (openai/clip-vit-large-patch14) -> flax params for
    models/clip_dense.CLIPVisionDense. Note HF's historical key typo
    ``pre_layrnorm``. Verified numerically vs torch at random init in
    tests/test_clip_dense.py."""
    pre = "vision_model."
    out = {
        "class_embedding": np.asarray(sd[pre + "embeddings.class_embedding"]),
        "position_embedding": np.asarray(
            sd[pre + "embeddings.position_embedding.weight"]),
        "patch_embedding": t2f_conv(
            sd[pre + "embeddings.patch_embedding.weight"]),
        "pre_layernorm": t2f_layernorm(
            sd[pre + "pre_layrnorm.weight"], sd[pre + "pre_layrnorm.bias"]),
        "post_layernorm": t2f_layernorm(
            sd[pre + "post_layernorm.weight"],
            sd[pre + "post_layernorm.bias"]),
        "visual_projection": t2f_linear(sd["visual_projection.weight"]),
    }
    i = 0
    while f"{pre}encoder.layers.{i}.layer_norm1.weight" in sd:
        lp = f"{pre}encoder.layers.{i}."
        out[f"layers_{i}"] = {
            "layer_norm1": t2f_layernorm(sd[lp + "layer_norm1.weight"],
                                         sd[lp + "layer_norm1.bias"]),
            "layer_norm2": t2f_layernorm(sd[lp + "layer_norm2.weight"],
                                         sd[lp + "layer_norm2.bias"]),
            "self_attn": {
                name: t2f_linear(sd[lp + f"self_attn.{name}.weight"],
                                 sd[lp + f"self_attn.{name}.bias"])
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "fc1": t2f_linear(sd[lp + "mlp.fc1.weight"],
                              sd[lp + "mlp.fc1.bias"]),
            "fc2": t2f_linear(sd[lp + "mlp.fc2.weight"],
                              sd[lp + "mlp.fc2.bias"]),
        }
        i += 1
    return out


def convert_clip_text(sd: Dict[str, np.ndarray]) -> Dict:
    """HF ``CLIPTextModelWithProjection`` state_dict -> flax params for
    models/clip_dense.CLIPTextEncoder. Verified numerically vs torch in
    tests/test_clip_dense.py."""
    pre = "text_model."
    out = {
        "token_embedding": {"embedding": np.asarray(
            sd[pre + "embeddings.token_embedding.weight"])},
        "position_embedding": np.asarray(
            sd[pre + "embeddings.position_embedding.weight"]),
        "final_layer_norm": t2f_layernorm(
            sd[pre + "final_layer_norm.weight"],
            sd[pre + "final_layer_norm.bias"]),
        "text_projection": t2f_linear(sd["text_projection.weight"]),
    }
    i = 0
    while f"{pre}encoder.layers.{i}.layer_norm1.weight" in sd:
        lp = f"{pre}encoder.layers.{i}."
        out[f"layers_{i}"] = {
            "layer_norm1": t2f_layernorm(sd[lp + "layer_norm1.weight"],
                                         sd[lp + "layer_norm1.bias"]),
            "layer_norm2": t2f_layernorm(sd[lp + "layer_norm2.weight"],
                                         sd[lp + "layer_norm2.bias"]),
            "self_attn": {
                name: t2f_linear(sd[lp + f"self_attn.{name}.weight"],
                                 sd[lp + f"self_attn.{name}.bias"])
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "fc1": t2f_linear(sd[lp + "mlp.fc1.weight"],
                              sd[lp + "mlp.fc1.bias"]),
            "fc2": t2f_linear(sd[lp + "mlp.fc2.weight"],
                              sd[lp + "mlp.fc2.bias"]),
        }
        i += 1
    return out


def walk_assign(tree: Dict, path: str, value) -> None:
    """Assign value at a '/'-separated path, creating nested dicts."""
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def convert_vq_model(sd: Dict[str, np.ndarray]) -> Dict:
    """diffusers VQModel state_dict -> flax params for
    models/vq_model.VQModel (the reference's LSeg semantic compressor,
    field_construction/preprocessor.py:115-129: custom-trained ckpt
    loaded via safetensors load_file).

    Layout (diffusers 0.30 VQModel): encoder.{conv_in, down_blocks.N.
    {resnets.M, downsamplers.0.conv}, mid_block.{resnets.0/1,
    attentions.0}, conv_norm_out, conv_out}, quant_conv,
    quantize.embedding.weight, post_quant_conv, decoder (spatial-norm
    resnets/attention: norm*.{norm_layer,conv_y,conv_b}).
    """
    def gn(prefix):
        return t2f_layernorm(sd[prefix + ".weight"], sd[prefix + ".bias"])

    def conv(prefix):
        return t2f_conv(sd[prefix + ".weight"], sd.get(prefix + ".bias"))

    def spatial_norm(prefix):
        return {"norm_layer": gn(prefix + ".norm_layer"),
                "conv_y": conv(prefix + ".conv_y"),
                "conv_b": conv(prefix + ".conv_b")}

    def resnet(prefix, spatial):
        out = {}
        for nm in ("norm1", "norm2"):
            out[nm] = (spatial_norm(f"{prefix}.{nm}") if spatial
                       else gn(f"{prefix}.{nm}"))
        out["conv1"] = conv(prefix + ".conv1")
        out["conv2"] = conv(prefix + ".conv2")
        if prefix + ".conv_shortcut.weight" in sd:
            out["conv_shortcut"] = conv(prefix + ".conv_shortcut")
        return out

    def attn(prefix, spatial):
        out = {}
        if spatial:
            out["spatial_norm"] = spatial_norm(prefix + ".spatial_norm")
        else:
            out["group_norm"] = gn(prefix + ".group_norm")
        for nm in ("to_q", "to_k", "to_v"):
            out[nm] = t2f_linear(sd[f"{prefix}.{nm}.weight"],
                                 sd[f"{prefix}.{nm}.bias"])
        out["to_out"] = t2f_linear(sd[prefix + ".to_out.0.weight"],
                                   sd[prefix + ".to_out.0.bias"])
        return out

    enc = {"conv_in": conv("encoder.conv_in"),
           "conv_norm_out": gn("encoder.conv_norm_out"),
           "conv_out": conv("encoder.conv_out")}
    i = 0
    while f"encoder.down_blocks.{i}.resnets.0.conv1.weight" in sd:
        j = 0
        while f"encoder.down_blocks.{i}.resnets.{j}.conv1.weight" in sd:
            enc[f"down_{i}_res_{j}"] = resnet(
                f"encoder.down_blocks.{i}.resnets.{j}", spatial=False)
            j += 1
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            enc[f"down_{i}_downsample"] = {
                "conv": conv(f"encoder.down_blocks.{i}.downsamplers.0.conv")}
        i += 1
    enc["mid_res_0"] = resnet("encoder.mid_block.resnets.0", spatial=False)
    enc["mid_res_1"] = resnet("encoder.mid_block.resnets.1", spatial=False)
    enc["mid_attn"] = attn("encoder.mid_block.attentions.0", spatial=False)

    dec = {"conv_in": conv("decoder.conv_in"),
           "conv_norm_out": spatial_norm("decoder.conv_norm_out"),
           "conv_out": conv("decoder.conv_out")}
    i = 0
    while f"decoder.up_blocks.{i}.resnets.0.conv1.weight" in sd:
        j = 0
        while f"decoder.up_blocks.{i}.resnets.{j}.conv1.weight" in sd:
            dec[f"up_{i}_res_{j}"] = resnet(
                f"decoder.up_blocks.{i}.resnets.{j}", spatial=True)
            j += 1
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            dec[f"up_{i}_upsample"] = {
                "conv": conv(f"decoder.up_blocks.{i}.upsamplers.0.conv")}
        i += 1
    dec["mid_res_0"] = resnet("decoder.mid_block.resnets.0", spatial=True)
    dec["mid_res_1"] = resnet("decoder.mid_block.resnets.1", spatial=True)
    dec["mid_attn"] = attn("decoder.mid_block.attentions.0", spatial=True)

    return {"params": {
        "encoder": enc, "decoder": dec,
        "quant_conv": conv("quant_conv"),
        "post_quant_conv": conv("post_quant_conv"),
        "codebook": np.asarray(sd["quantize.embedding.weight"]),
    }}
