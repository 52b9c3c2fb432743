"""Random-init torch mirror of SAM v1 (ViT-det encoder + SAM decoder) for
converter validation; state_dict keys match sam_vit_h_4b8939.pth."""
import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_sam2_mirror import AttentionDS, LayerNorm2d, MLP


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


def get_rel_pos(q_size, k_size, rel_pos):
    max_rel = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel:
        r = F.interpolate(rel_pos.reshape(1, rel_pos.shape[0], -1
                                          ).permute(0, 2, 1),
                          size=max_rel, mode="linear")
        rel_pos = r.reshape(-1, max_rel).permute(1, 0)
    coords = (torch.arange(q_size)[:, None] - torch.arange(k_size)[None, :]
              + (k_size - 1))
    return rel_pos[coords.long()]


class Attention(nn.Module):
    def __init__(self, dim, heads, rel_size):
        super().__init__()
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.heads = heads
        hd = dim // heads
        self.scale = hd ** -0.5
        self.rel_pos_h = nn.Parameter(torch.randn(2 * rel_size - 1, hd)
                                      * 0.02)
        self.rel_pos_w = nn.Parameter(torch.randn(2 * rel_size - 1, hd)
                                      * 0.02)

    def forward(self, x):
        B, H, W, C = x.shape
        qkv = self.qkv(x).reshape(B, H * W, 3, self.heads, -1
                                  ).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.reshape(3, B * self.heads, H * W, -1).unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        Rh = get_rel_pos(H, H, self.rel_pos_h)
        Rw = get_rel_pos(W, W, self.rel_pos_w)
        r_q = q.reshape(-1, H, W, q.shape[-1])
        rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, Rh)
        rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, Rw)
        attn = (attn.view(-1, H, W, H, W) + rel_h[:, :, :, :, None]
                + rel_w[:, :, :, None, :]).view(-1, H * W, H * W)
        attn = attn.softmax(-1)
        x = (attn @ v).view(B, self.heads, H, W, -1
                            ).permute(0, 2, 3, 1, 4).reshape(B, H, W, -1)
        return self.proj(x)


class MLPBlock(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.lin1 = nn.Linear(dim, hidden)
        self.lin2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.lin2(F.gelu(self.lin1(x)))


class Block(nn.Module):
    def __init__(self, dim, heads, window_size, feat_size, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, heads,
                              window_size if window_size > 0 else feat_size)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = MLPBlock(dim, int(dim * mlp_ratio))
        self.window_size = window_size

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.window_size > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
        x = self.attn(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (H, W))
        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class ImageEncoderViT(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        c = cfg
        fs = c["img_size"] // c["patch"]
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, c["dim"], c["patch"],
                                          c["patch"])
        self.pos_embed = nn.Parameter(torch.randn(1, fs, fs, c["dim"])
                                      * 0.02)
        self.blocks = nn.ModuleList([
            Block(c["dim"], c["heads"],
                  0 if i in c["global_idx"] else c["window"], fs)
            for i in range(c["depth"])])
        self.neck = nn.Sequential(
            nn.Conv2d(c["dim"], c["out_chans"], 1, bias=False),
            LayerNorm2d(c["out_chans"]),
            nn.Conv2d(c["out_chans"], c["out_chans"], 3, padding=1,
                      bias=False),
            LayerNorm2d(c["out_chans"]))

    def forward(self, x):
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.neck(x.permute(0, 3, 1, 2))


class PromptEncoder(nn.Module):
    def __init__(self, dim, image_size, mask_in_chans=16):
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
        self.dim = dim

    def _pe(self, coords01):
        g = self.pe_layer.positional_encoding_gaussian_matrix
        c = (2 * coords01 - 1) @ g * (2 * math.pi)
        return torch.cat([c.sin(), c.cos()], -1)

    def get_dense_pe(self, hw):
        h, w = hw
        ys = (torch.arange(h).float() + 0.5) / h
        xs = (torch.arange(w).float() + 0.5) / w
        gx, gy = torch.meshgrid(xs, ys, indexing="xy")
        return self._pe(torch.stack([gx, gy], -1)).permute(2, 0, 1)[None]

    def forward(self, coords, labels, hw):
        c = (coords + 0.5) / self.image_size
        emb = self._pe(c)
        emb = torch.where(labels[..., None] == -1,
                          self.not_a_point_embed.weight[0], emb)
        for i in range(4):
            emb = torch.where(labels[..., None] == i,
                              emb + self.point_embeddings[i].weight[0], emb)
        dense = self.no_mask_embed.weight.reshape(1, -1, 1, 1).expand(
            coords.shape[0], self.dim, hw[0], hw[1])
        return emb, dense


class TwoWayBlock(nn.Module):
    def __init__(self, dim, heads, mlp_dim, skip_first_pe):
        super().__init__()
        self.self_attn = AttentionDS(dim, heads)
        self.norm1 = nn.LayerNorm(dim)
        self.cross_attn_token_to_image = AttentionDS(dim, heads, 2)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = MLPBlock(dim, mlp_dim)
        self.mlp.act = nn.ReLU()
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
        h = self.mlp.lin2(F.relu(self.mlp.lin1(queries)))
        queries = self.norm3(queries + h)
        q, k = queries + qpe, keys + kpe
        keys = self.norm4(
            keys + self.cross_attn_image_to_token(k, q, queries))
        return queries, keys


class TwoWayTransformer(nn.Module):
    def __init__(self, depth, dim, heads, mlp_dim):
        super().__init__()
        self.layers = nn.ModuleList(
            [TwoWayBlock(dim, heads, mlp_dim, i == 0)
             for i in range(depth)])
        self.final_attn_token_to_image = AttentionDS(dim, heads, 2)
        self.norm_final_attn = nn.LayerNorm(dim)

    def forward(self, image_embedding, image_pe, point_embedding):
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
    def __init__(self, dim, heads, mlp_dim, depth, n_multi=3):
        super().__init__()
        self.transformer = TwoWayTransformer(depth, dim, heads, mlp_dim)
        self.iou_token = nn.Embedding(1, dim)
        self.num_mask_tokens = n_multi + 1
        self.mask_tokens = nn.Embedding(self.num_mask_tokens, dim)
        self.output_upscaling = nn.Sequential(
            nn.ConvTranspose2d(dim, dim // 4, 2, 2), LayerNorm2d(dim // 4),
            nn.GELU(), nn.ConvTranspose2d(dim // 4, dim // 8, 2, 2),
            nn.GELU())
        self.output_hypernetworks_mlps = nn.ModuleList(
            [MLP(dim, dim, dim // 8, 3)
             for _ in range(self.num_mask_tokens)])
        self.iou_prediction_head = MLP(dim, 256, self.num_mask_tokens, 3)

    def forward(self, image_embeddings, image_pe, sparse, dense,
                multimask_output):
        B = sparse.shape[0]
        out_tokens = torch.cat([self.iou_token.weight,
                                self.mask_tokens.weight], 0)
        tokens = torch.cat([out_tokens[None].expand(B, -1, -1), sparse], 1)
        src = image_embeddings + dense
        hs, src = self.transformer(src, image_pe, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1:1 + self.num_mask_tokens]
        b, n, c = src.shape
        h = w = int(math.sqrt(n))
        src = src.transpose(1, 2).view(b, c, h, w)
        up = self.output_upscaling(src)
        hyper = torch.stack([m(mask_tokens_out[:, i]) for i, m in
                             enumerate(self.output_hypernetworks_mlps)], 1)
        b, c, hh, ww = up.shape
        masks = (hyper @ up.view(b, c, hh * ww)).view(b, -1, hh, ww)
        iou = self.iou_prediction_head(iou_token_out)
        if multimask_output:
            return masks[:, 1:], iou[:, 1:]
        return masks[:, :1], iou[:, :1]


class SAM1Mirror(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.image_encoder = ImageEncoderViT(cfg)
        self.prompt_encoder = PromptEncoder(cfg["out_chans"],
                                            cfg["img_size"])
        self.mask_decoder = MaskDecoder(cfg["out_chans"], cfg["dec_heads"],
                                        cfg["dec_mlp"], cfg["dec_depth"])

    def decode_points(self, feats, coords, labels, multimask=True):
        hw = feats.shape[-2:]
        sparse, dense = self.prompt_encoder(coords, labels, hw)
        pe = self.prompt_encoder.get_dense_pe(hw)
        return self.mask_decoder(feats, pe, sparse, dense, multimask)
