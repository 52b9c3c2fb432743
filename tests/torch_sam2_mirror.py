"""Random-init torch mirror of SAM2 (video-predictor configuration) for
converter validation.

Implements the reference semantics (auto-seg/sam2/modeling/*) with a
state_dict whose keys match the sam2_hiera_large.pt checkpoint layout so
utils/convert.convert_sam2 can be cross-validated numerically without any
checkpoint download. Written fresh against the reference's documented
behavior — not imported from it.
"""
import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class LayerNorm2d(nn.Module):
    def __init__(self, c, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(c))
        self.bias = nn.Parameter(torch.zeros(c))
        self.eps = eps

    def forward(self, x):           # [B,C,H,W]
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class MLP(nn.Module):
    def __init__(self, din, hidden, dout, n, sigmoid_output=False):
        super().__init__()
        dims = [din] + [hidden] * (n - 1)
        outs = [hidden] * (n - 1) + [dout]
        self.layers = nn.ModuleList(nn.Linear(a, b)
                                    for a, b in zip(dims, outs))
        self.sigmoid_output = sigmoid_output

    def forward(self, x):
        for i, l in enumerate(self.layers):
            x = l(x)
            if i < len(self.layers) - 1:
                x = F.relu(x)
        return torch.sigmoid(x) if self.sigmoid_output else x


# ------------------------------------------------------------------ Hiera

def window_partition(x, ws):
    B, H, W, C = x.shape
    ph, pw = (ws - H % ws) % ws, (ws - W % ws) % ws
    x = F.pad(x, (0, 0, 0, pw, 0, ph))
    Hp, Wp = H + ph, W + pw
    x = x.view(B, Hp // ws, ws, Wp // ws, ws, C)
    return (x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C), (Hp, Wp))


def window_unpartition(x, ws, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = x.shape[0] // ((Hp // ws) * (Wp // ws))
    x = x.view(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class MultiScaleAttention(nn.Module):
    def __init__(self, dim, dim_out, heads, q_pool=False):
        super().__init__()
        self.qkv = nn.Linear(dim, 3 * dim_out)
        self.proj = nn.Linear(dim_out, dim_out)
        self.heads = heads
        self.q_pool = q_pool

    def forward(self, x):
        B, H, W, _ = x.shape
        qkv = self.qkv(x).reshape(B, H * W, 3, self.heads, -1)
        q, k, v = qkv.unbind(2)
        if self.q_pool:
            q = q.reshape(B, H, W, -1).permute(0, 3, 1, 2)
            q = F.max_pool2d(q, 2, 2).permute(0, 2, 3, 1)
            H, W = q.shape[1:3]
            q = q.reshape(B, H * W, self.heads, -1)
        o = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        o = o.transpose(1, 2).reshape(B, H, W, -1)
        return self.proj(o)


class HieraBlock(nn.Module):
    def __init__(self, dim, dim_out, heads, window_size, q_pool, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = MultiScaleAttention(dim, dim_out, heads, q_pool)
        self.norm2 = nn.LayerNorm(dim_out, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.layers = nn.ModuleList([
            nn.Linear(dim_out, int(dim_out * mlp_ratio)),
            nn.Linear(int(dim_out * mlp_ratio), dim_out)])
        if dim != dim_out:
            self.proj = nn.Linear(dim, dim_out)
        self.dim, self.dim_out = dim, dim_out
        self.window_size = window_size
        self.q_pool = q_pool

    def forward(self, x):
        B, H, W, _ = x.shape
        shortcut = x
        x = self.norm1(x)
        if self.dim != self.dim_out:
            shortcut = self.proj(x)
            if self.q_pool:
                shortcut = F.max_pool2d(
                    shortcut.permute(0, 3, 1, 2), 2, 2).permute(0, 2, 3, 1)
        ws = self.window_size
        if ws > 0:
            xw, pad_hw = window_partition(x, ws)
        else:
            xw = x
        xw = self.attn(xw)
        if self.q_pool:
            ws = ws // 2
            H, W = shortcut.shape[1:3]
            if ws > 0:
                pad_hw = (-(-H // ws) * ws, -(-W // ws) * ws)
        if self.window_size > 0:
            x = window_unpartition(xw, ws, pad_hw, (H, W))
        else:
            x = xw
        x = shortcut + x
        h = self.norm2(x)
        h = self.mlp.layers[1](F.gelu(self.mlp.layers[0](h)))
        return x + h


class Hiera(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        c = cfg
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, c["embed_dim"], 7, 4, 3)
        bh, bw = c["pos_bkg"]
        self.pos_embed = nn.Parameter(
            torch.randn(1, c["embed_dim"], bh, bw) * 0.02)
        w0 = c["window_spec"][0]
        self.pos_embed_window = nn.Parameter(
            torch.randn(1, c["embed_dim"], w0, w0) * 0.02)
        stages = c["stages"]
        stage_ends = [sum(stages[:i]) - 1 for i in range(1, len(stages) + 1)]
        q_pool_blocks = [e + 1 for e in stage_ends[:-1]]
        self.stage_ends = stage_ends
        depth = sum(stages)
        blocks = []
        dim, heads, cur_stage = c["embed_dim"], c["num_heads"], 1
        for i in range(depth):
            dim_out = dim
            ws = c["window_spec"][cur_stage - 1]
            if i in c["global_att"]:
                ws = 0
            if i - 1 in stage_ends:
                dim_out, heads = dim * 2, heads * 2
                cur_stage += 1
            blocks.append(HieraBlock(dim, dim_out, heads, ws,
                                     i in q_pool_blocks))
            dim = dim_out
        self.blocks = nn.ModuleList(blocks)

    def forward(self, x):
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        H, W = x.shape[1:3]
        pos = F.interpolate(self.pos_embed, size=(H, W), mode="bicubic")
        win = self.pos_embed_window
        pos = pos + win.tile([p // w for p, w in zip(pos.shape, win.shape)])
        x = x + pos.permute(0, 2, 3, 1)
        outs = []
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in self.stage_ends:
                outs.append(x.permute(0, 3, 1, 2))
        return outs


def sine_pos(h, w, dim):
    npf = dim // 2
    eps = 1e-6
    scale = 2 * math.pi
    y = torch.arange(1, h + 1).float() / (h + eps) * scale
    x = torch.arange(1, w + 1).float() / (w + eps) * scale
    i = torch.arange(npf).float()
    dim_t = 10000.0 ** (2 * torch.div(i, 2, rounding_mode="floor") / npf)

    def enc(v):
        a = v[:, None] / dim_t
        return torch.stack((a[:, 0::2].sin(), a[:, 1::2].cos()),
                           dim=2).flatten(1)

    ye = enc(y)[:, None, :].expand(h, w, npf)
    xe = enc(x)[None, :, :].expand(h, w, npf)
    return torch.cat([ye, xe], -1).permute(2, 0, 1)   # [dim, h, w]


class ImageEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.trunk = Hiera(cfg)
        self.neck = nn.Module()
        convs = []
        for ch in cfg["backbone_channel_list"]:
            m = nn.Module()
            m.conv = nn.Conv2d(ch, cfg["d_model"], 1)
            convs.append(m)
        self.neck.convs = nn.ModuleList(convs)
        self.top_down = cfg["fpn_top_down_levels"]
        self.scalp = cfg["scalp"]
        self.d_model = cfg["d_model"]

    def forward(self, x):
        xs = self.trunk(x)
        n = len(xs) - 1
        out = [None] * len(xs)
        pos = [None] * len(xs)
        prev = None
        for i in range(n, -1, -1):
            lat = self.neck.convs[n - i].conv(xs[i])
            if i in self.top_down and prev is not None:
                prev = lat + F.interpolate(prev, scale_factor=2.0,
                                           mode="nearest")
            else:
                prev = lat
            out[i] = prev
            pos[i] = sine_pos(prev.shape[-2], prev.shape[-1], self.d_model
                              )[None].expand(prev.shape[0], -1, -1, -1)
        if self.scalp:
            out, pos = out[:-self.scalp], pos[:-self.scalp]
        return out, pos


# --------------------------------------------------------- prompt encoder

class PromptEncoder(nn.Module):
    def __init__(self, dim, image_size, embed_hw, mask_in_chans=16):
        super().__init__()
        self.pe_layer = nn.Module()
        self.pe_layer.register_buffer(
            "positional_encoding_gaussian_matrix", torch.randn(2, dim // 2))
        self.point_embeddings = nn.ModuleList(
            [nn.Embedding(1, dim) for _ in range(4)])
        self.not_a_point_embed = nn.Embedding(1, dim)
        self.no_mask_embed = nn.Embedding(1, dim)
        mc = mask_in_chans
        self.mask_downscaling = nn.Sequential(
            nn.Conv2d(1, mc // 4, 2, 2), LayerNorm2d(mc // 4), nn.GELU(),
            nn.Conv2d(mc // 4, mc, 2, 2), LayerNorm2d(mc), nn.GELU(),
            nn.Conv2d(mc, dim, 1))
        self.image_size = image_size
        self.embed_hw = embed_hw
        self.dim = dim

    def _pe(self, coords01):
        g = self.pe_layer.positional_encoding_gaussian_matrix
        c = (2 * coords01 - 1) @ g * (2 * math.pi)
        return torch.cat([c.sin(), c.cos()], -1)

    def get_dense_pe(self):
        h, w = self.embed_hw
        ys = (torch.arange(h).float() + 0.5) / h
        xs = (torch.arange(w).float() + 0.5) / w
        gx, gy = torch.meshgrid(xs, ys, indexing="xy")
        pe = self._pe(torch.stack([gx, gy], -1))
        return pe.permute(2, 0, 1)[None]              # [1, C, h, w]

    def forward(self, coords, labels, mask):
        c = (coords + 0.5) / self.image_size
        emb = self._pe(c)
        emb = torch.where(labels[..., None] == -1,
                          self.not_a_point_embed.weight[0], emb)
        for i in range(4):
            emb = torch.where(labels[..., None] == i,
                              emb + self.point_embeddings[i].weight[0], emb)
        if mask is not None:
            dense = self.mask_downscaling(mask)
        else:
            h, w = self.embed_hw
            dense = self.no_mask_embed.weight.reshape(1, -1, 1, 1).expand(
                coords.shape[0], self.dim, h, w)
        return emb, dense


# ----------------------------------------------------------- mask decoder

class AttentionDS(nn.Module):
    def __init__(self, dim, heads, downsample_rate=1, kv_in_dim=None):
        super().__init__()
        d = dim // downsample_rate
        kv = kv_in_dim if kv_in_dim is not None else dim
        self.q_proj = nn.Linear(dim, d)
        self.k_proj = nn.Linear(kv, d)
        self.v_proj = nn.Linear(kv, d)
        self.out_proj = nn.Linear(d, dim)
        self.heads = heads
        self.internal = d

    def _split(self, x):
        b, n, c = x.shape
        return x.reshape(b, n, self.heads, c // self.heads).transpose(1, 2)

    def forward(self, q, k, v):
        q, k, v = self.q_proj(q), self.k_proj(k), self.v_proj(v)
        q, k, v = self._split(q), self._split(k), self._split(v)
        o = F.scaled_dot_product_attention(q, k, v)
        b, h, n, hd = o.shape
        return self.out_proj(o.transpose(1, 2).reshape(b, n, h * hd))


class TwoWayBlock(nn.Module):
    def __init__(self, dim, heads, mlp_dim, skip_first_pe):
        super().__init__()
        self.self_attn = AttentionDS(dim, heads)
        self.norm1 = nn.LayerNorm(dim)
        self.cross_attn_token_to_image = AttentionDS(dim, heads, 2)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Module()
        self.mlp.layers = nn.ModuleList(
            [nn.Linear(dim, mlp_dim), nn.Linear(mlp_dim, dim)])
        self.norm3 = nn.LayerNorm(dim)
        self.norm4 = nn.LayerNorm(dim)
        self.cross_attn_image_to_token = AttentionDS(dim, heads, 2)
        self.skip_first_pe = skip_first_pe

    def forward(self, queries, keys, qpe, kpe):
        if self.skip_first_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + qpe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        q, k = queries + qpe, keys + kpe
        queries = self.norm2(
            queries + self.cross_attn_token_to_image(q, k, keys))
        h = self.mlp.layers[1](F.relu(self.mlp.layers[0](queries)))
        queries = self.norm3(queries + h)
        q, k = queries + qpe, keys + kpe
        keys = self.norm4(
            keys + self.cross_attn_image_to_token(k, q, queries))
        return queries, keys


class TwoWayTransformer(nn.Module):
    def __init__(self, depth, dim, heads, mlp_dim):
        super().__init__()
        self.layers = nn.ModuleList(
            [TwoWayBlock(dim, heads, mlp_dim, i == 0) for i in range(depth)])
        self.final_attn_token_to_image = AttentionDS(dim, heads, 2)
        self.norm_final_attn = nn.LayerNorm(dim)

    def forward(self, image_embedding, image_pe, point_embedding):
        bs, c, h, w = image_embedding.shape
        keys = image_embedding.flatten(2).permute(0, 2, 1)
        kpe = image_pe.flatten(2).permute(0, 2, 1)
        queries = point_embedding
        for layer in self.layers:
            queries, keys = layer(queries, keys, point_embedding, kpe)
        q, k = queries + point_embedding, keys + kpe
        queries = self.norm_final_attn(
            queries + self.final_attn_token_to_image(q, k, keys))
        return queries, keys


class MaskDecoder(nn.Module):
    def __init__(self, dim, heads, mlp_dim, depth, n_multi=3,
                 iou_hidden=256, stability_delta=0.05,
                 stability_thresh=0.98):
        super().__init__()
        self.transformer = TwoWayTransformer(depth, dim, heads, mlp_dim)
        self.iou_token = nn.Embedding(1, dim)
        self.num_mask_tokens = n_multi + 1
        self.mask_tokens = nn.Embedding(self.num_mask_tokens, dim)
        self.obj_score_token = nn.Embedding(1, dim)
        self.output_upscaling = nn.Sequential(
            nn.ConvTranspose2d(dim, dim // 4, 2, 2), LayerNorm2d(dim // 4),
            nn.GELU(), nn.ConvTranspose2d(dim // 4, dim // 8, 2, 2),
            nn.GELU())
        self.conv_s0 = nn.Conv2d(dim, dim // 8, 1)
        self.conv_s1 = nn.Conv2d(dim, dim // 4, 1)
        self.output_hypernetworks_mlps = nn.ModuleList(
            [MLP(dim, dim, dim // 8, 3) for _ in range(self.num_mask_tokens)])
        self.iou_prediction_head = MLP(dim, iou_hidden,
                                       self.num_mask_tokens, 3,
                                       sigmoid_output=True)
        self.pred_obj_score_head = MLP(dim, dim, 1, 3)
        self.sd = stability_delta
        self.st = stability_thresh

    def forward(self, image_embeddings, image_pe, sparse, dense,
                multimask_output, high_res_features):
        B = sparse.shape[0]
        out_tokens = torch.cat([self.obj_score_token.weight,
                                self.iou_token.weight,
                                self.mask_tokens.weight], 0)
        tokens = torch.cat(
            [out_tokens[None].expand(B, -1, -1), sparse], 1)
        src = image_embeddings + dense
        hs, src = self.transformer(src, image_pe, tokens)
        iou_token_out = hs[:, 1]
        mask_tokens_out = hs[:, 2:2 + self.num_mask_tokens]
        b, n, c = src.shape
        h = w = int(math.sqrt(n))
        src = src.transpose(1, 2).view(b, c, h, w)
        dc1, ln1, act1, dc2, act2 = self.output_upscaling
        s0, s1 = high_res_features
        up = act1(ln1(dc1(src) + s1))
        up = act2(dc2(up) + s0)
        hyper = torch.stack([m(mask_tokens_out[:, i]) for i, m in
                             enumerate(self.output_hypernetworks_mlps)], 1)
        b, c, hh, ww = up.shape
        masks = (hyper @ up.view(b, c, hh * ww)).view(b, -1, hh, ww)
        iou = self.iou_prediction_head(iou_token_out)
        obj = self.pred_obj_score_head(hs[:, 0])
        if multimask_output:
            return masks[:, 1:], iou[:, 1:], mask_tokens_out[:, 1:], obj
        # dynamic multimask via stability
        flat = masks.flatten(-2)
        ai = (flat > self.sd).sum(-1).float()
        au = (flat > -self.sd).sum(-1).float()
        stab = torch.where(au > 0, ai / au, torch.ones_like(au))[:, 0]
        stable = stab >= self.st
        multi, miou = masks[:, 1:], iou[:, 1:]
        best = miou.argmax(-1)
        bi = torch.arange(B)
        bm, bi2 = multi[bi, best][:, None], miou[bi, best][:, None]
        om = torch.where(stable[:, None, None, None], masks[:, 0:1], bm)
        oi = torch.where(stable[:, None], iou[:, 0:1], bi2)
        return om, oi, mask_tokens_out[:, 0:1], obj


# --------------------------------------------------------- memory modules

def axial_cos_sin(dim, end_x, end_y, theta=10000.0):
    q = dim // 4
    freqs = 1.0 / (theta ** (torch.arange(0, dim, 4)[:q].float() / dim))
    t = torch.arange(end_x * end_y).float()
    tx, ty = t % end_x, torch.div(t, end_x, rounding_mode="floor")
    ang = torch.cat([tx[:, None] * freqs, ty[:, None] * freqs], -1)
    return ang.cos(), ang.sin()


def apply_rot(x, cos, sin):
    x1, x2 = x[..., 0::2], x[..., 1::2]
    xr, xi = x1 * cos - x2 * sin, x1 * sin + x2 * cos
    return torch.stack([xr, xi], -1).flatten(-2)


class RoPEAttention(AttentionDS):
    def __init__(self, *a, rope_k_repeat=False, **k):
        super().__init__(*a, **k)
        self.rope_k_repeat = rope_k_repeat

    def forward(self, q, k, v, num_k_exclude_rope=0):
        q, k, v = self.q_proj(q), self.k_proj(k), self.v_proj(v)
        q, k, v = self._split(q), self._split(k), self._split(v)
        n_q = q.shape[-2]
        side = int(round(math.sqrt(n_q)))
        hd = q.shape[-1]
        cos, sin = axial_cos_sin(hd, side, side)
        q = apply_rot(q, cos, sin)
        n_rot = k.shape[-2] - num_k_exclude_rope
        if self.rope_k_repeat and n_rot != n_q:
            r = n_rot // n_q
            cos, sin = cos.repeat(r, 1), sin.repeat(r, 1)
        if num_k_exclude_rope > 0:
            k = torch.cat([apply_rot(k[..., :n_rot, :], cos, sin),
                           k[..., n_rot:, :]], -2)
        else:
            k = apply_rot(k, cos, sin)
        o = F.scaled_dot_product_attention(q, k, v)
        b, h, n, hd = o.shape
        return self.out_proj(o.transpose(1, 2).reshape(b, n, h * hd))


class MemoryAttentionLayer(nn.Module):
    def __init__(self, dim, heads, ffn, mem_dim):
        super().__init__()
        self.self_attn = RoPEAttention(dim, heads)
        self.cross_attn_image = RoPEAttention(dim, heads, 1, mem_dim,
                                              rope_k_repeat=True)
        self.linear1 = nn.Linear(dim, ffn)
        self.linear2 = nn.Linear(ffn, dim)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)

    def forward(self, tgt, memory, pos, query_pos, nk):
        t2 = self.norm1(tgt)
        tgt = tgt + self.self_attn(t2, t2, t2)
        t2 = self.norm2(tgt)
        tgt = tgt + self.cross_attn_image(t2, memory + pos, memory,
                                          num_k_exclude_rope=nk)
        t2 = self.norm3(tgt)
        return tgt + self.linear2(F.relu(self.linear1(t2)))


class MemoryAttention(nn.Module):
    def __init__(self, dim, heads, ffn, mem_dim, layers):
        super().__init__()
        self.layers = nn.ModuleList(
            [MemoryAttentionLayer(dim, heads, ffn, mem_dim)
             for _ in range(layers)])
        self.norm = nn.LayerNorm(dim)

    def forward(self, curr, memory, curr_pos, memory_pos, nk=0):
        x = curr + 0.1 * curr_pos
        for layer in self.layers:
            x = layer(x, memory, memory_pos, curr_pos, nk)
        return self.norm(x)


class CXBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = LayerNorm2d(dim)
        self.pwconv1 = nn.Linear(dim, 4 * dim)
        self.pwconv2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x):
        h = self.norm(self.dwconv(x)).permute(0, 2, 3, 1)
        h = self.pwconv2(F.gelu(self.pwconv1(h)))
        return x + (self.gamma * h).permute(0, 3, 1, 2)


class MemoryEncoder(nn.Module):
    def __init__(self, dim, mem_dim):
        super().__init__()
        self.mask_downsampler = nn.Module()
        enc = nn.Sequential()
        ch = 1
        for _ in range(4):
            enc.append(nn.Conv2d(ch, ch * 4, 3, 2, 1))
            enc.append(LayerNorm2d(ch * 4))
            enc.append(nn.GELU())
            ch *= 4
        enc.append(nn.Conv2d(ch, dim, 1))
        self.mask_downsampler.encoder = enc
        self.pix_feat_proj = nn.Conv2d(dim, dim, 1)
        self.fuser = nn.Module()
        self.fuser.layers = nn.ModuleList([CXBlock(dim) for _ in range(2)])
        self.out_proj = nn.Conv2d(dim, mem_dim, 1)

    def forward(self, pix_feat, mask_for_mem):
        m = self.mask_downsampler.encoder(mask_for_mem)
        x = self.pix_feat_proj(pix_feat) + m
        for layer in self.fuser.layers:
            x = layer(x)
        return self.out_proj(x)


# --------------------------------------------------------------- full glue

NO_OBJ_SCORE = -1024.0


class SAM2Mirror(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        c = cfg
        self.image_encoder = ImageEncoder(c)
        dim = c["d_model"]
        self.sam_prompt_encoder = PromptEncoder(dim, c["image_size"],
                                                c["embed_hw"])
        self.sam_mask_decoder = MaskDecoder(dim, c["dec_heads"],
                                            c["dec_mlp"], c["dec_depth"])
        self.memory_attention = MemoryAttention(dim, c["mem_heads"],
                                                c["mem_ffn"], c["mem_dim"],
                                                c["mem_layers"])
        self.memory_encoder = MemoryEncoder(dim, c["mem_dim"])
        self.maskmem_tpos_enc = nn.Parameter(
            torch.randn(c["num_maskmem"], 1, 1, c["mem_dim"]) * 0.02)
        self.no_mem_embed = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.no_mem_pos_enc = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.no_obj_ptr = nn.Parameter(torch.randn(1, dim) * 0.02)
        self.obj_ptr_proj = MLP(dim, dim, dim, 3)
        self.mask_downsample = nn.Conv2d(1, 1, 4, 4)
        self.cfg = c

    def forward_image(self, images):
        feats, pos = self.image_encoder(images)
        feats = list(feats)
        feats[0] = self.sam_mask_decoder.conv_s0(feats[0])
        feats[1] = self.sam_mask_decoder.conv_s1(feats[1])
        return feats, pos

    def forward_sam_heads(self, backbone_features, point_coords=None,
                          point_labels=None, mask_inputs=None,
                          high_res_features=None, multimask_output=False):
        B = backbone_features.shape[0]
        if point_coords is None:
            point_coords = torch.zeros(B, 1, 2)
            point_labels = -torch.ones(B, 1, dtype=torch.int32)
        sparse, dense = self.sam_prompt_encoder(point_coords, point_labels,
                                                mask_inputs)
        pe = self.sam_prompt_encoder.get_dense_pe()
        low_multi, ious, sam_tokens, obj = self.sam_mask_decoder(
            backbone_features, pe, sparse, dense, multimask_output,
            high_res_features)
        is_obj = obj > 0
        low_multi = torch.where(is_obj[:, None, None], low_multi,
                                torch.full_like(low_multi, NO_OBJ_SCORE))
        high_multi = F.interpolate(
            low_multi, size=(self.cfg["image_size"],) * 2, mode="bilinear",
            align_corners=False)
        sam_output_token = sam_tokens[:, 0]
        if multimask_output:
            best = ious.argmax(-1)
            bi = torch.arange(B)
            low = low_multi[bi, best][:, None]
            high = high_multi[bi, best][:, None]
            if sam_tokens.shape[1] > 1:
                sam_output_token = sam_tokens[bi, best]
        else:
            low, high = low_multi, high_multi
        obj_ptr = self.obj_ptr_proj(sam_output_token)
        lam = is_obj.float()
        obj_ptr = lam * obj_ptr + (1 - lam) * self.no_obj_ptr
        return low_multi, high_multi, ious, low, high, obj_ptr, obj

    def use_mask_as_output(self, backbone_features, high_res_features,
                           mask_inputs):
        mask_f = mask_inputs.float()
        high = mask_f * 20.0 - 10.0
        low = F.interpolate(high, size=(high.shape[-2] // 4,
                                        high.shape[-1] // 4),
                            mode="bilinear", align_corners=False,
                            antialias=True)
        _, _, _, _, _, obj_ptr, _ = self.forward_sam_heads(
            backbone_features, mask_inputs=self.mask_downsample(mask_f),
            high_res_features=high_res_features)
        is_obj = (mask_f.flatten(1) > 0).any(1)[:, None]
        lam = is_obj.float()
        obj_logits = 20.0 * lam - 10.0
        obj_ptr = lam * obj_ptr + (1 - lam) * self.no_obj_ptr
        return low, high, obj_ptr, obj_logits

    def encode_new_memory(self, pix_feat, high_res_masks, from_pts):
        if from_pts:
            m = (high_res_masks > 0).float()
        else:
            m = torch.sigmoid(high_res_masks)
        m = m * 20.0 - 10.0
        return self.memory_encoder(pix_feat, m)

    def condition_features(self, feats, curr_pos, memory, memory_pos, nk):
        B, C, h, w = feats.shape
        x = feats.flatten(2).permute(0, 2, 1)
        p = curr_pos.flatten(2).permute(0, 2, 1).expand(B, -1, -1)
        out = self.memory_attention(x, memory, p, memory_pos, nk)
        return out.permute(0, 2, 1).view(B, C, h, w)

    def add_no_mem_embed(self, feats):
        B, C, h, w = feats.shape
        x = feats.flatten(2).permute(0, 2, 1) + self.no_mem_embed
        return x.permute(0, 2, 1).view(B, C, h, w)
