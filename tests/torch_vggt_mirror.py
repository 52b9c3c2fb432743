"""Random-init torch mirror of VGGT for converter validation.

Implements the reference semantics (vggt/models/{vggt,aggregator}.py,
vggt/heads/{camera_head,dpt_head,head_act,utils}.py, vggt/layers/*) with a
state_dict whose keys match the facebook/VGGT-1B checkpoint layout, so
utils/convert.convert_vggt can be cross-validated numerically without any
checkpoint download. Written fresh against the reference's documented
behavior — not imported from it.
"""
import math

import torch
import torch.nn as nn
import torch.nn.functional as F

MEAN = torch.tensor([0.485, 0.456, 0.406]).view(1, 1, 3, 1, 1)
STD = torch.tensor([0.229, 0.224, 0.225]).view(1, 1, 3, 1, 1)


def rope2d(t, pos, freq):
    """t [B,H,N,hd], pos [N,2] (y,x): vertical half rotated by y,
    horizontal by x; NeoX rotate-half within each half."""
    hd = t.shape[-1]
    half, quarter = hd // 2, hd // 4
    inv = 1.0 / (freq ** (torch.arange(0, half, 2).float() / half))

    def rot(x, p):
        ang = p[:, None].float() * inv
        ang = torch.cat([ang, ang], -1)
        x1, x2 = x[..., :quarter], x[..., quarter:]
        return x * ang.cos() + torch.cat([-x2, x1], -1) * ang.sin()

    return torch.cat([rot(t[..., :half], pos[:, 0]),
                      rot(t[..., half:], pos[:, 1])], -1)


class Attention(nn.Module):
    def __init__(self, dim, heads, qk_norm=False, rope_freq=None, eps=1e-5):
        super().__init__()
        self.h = heads
        self.hd = dim // heads
        self.qkv = nn.Linear(dim, 3 * dim)
        self.q_norm = nn.LayerNorm(self.hd, eps=eps) if qk_norm \
            else nn.Identity()
        self.k_norm = nn.LayerNorm(self.hd, eps=eps) if qk_norm \
            else nn.Identity()
        self.proj = nn.Linear(dim, dim)
        self.rope_freq = rope_freq

    def forward(self, x, pos=None):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.h, self.hd
                                  ).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q, k = self.q_norm(q), self.k_norm(k)
        if self.rope_freq is not None and pos is not None:
            q = rope2d(q, pos, self.rope_freq)
            k = rope2d(k, pos, self.rope_freq)
        a = (q @ k.transpose(-1, -2)) / math.sqrt(self.hd)
        o = a.softmax(-1) @ v
        return self.proj(o.transpose(1, 2).reshape(B, N, C))


class LayerScale(nn.Module):
    def __init__(self, dim, init):
        super().__init__()
        self.gamma = nn.Parameter(torch.full((dim,), init))

    def forward(self, x):
        return x * self.gamma


class Mlp(nn.Module):
    def __init__(self, dim, hidden, out):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, out)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0, init_values=None,
                 qk_norm=False, rope_freq=None, eps=1e-5):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=eps)
        self.attn = Attention(dim, heads, qk_norm, rope_freq, eps)
        self.ls1 = LayerScale(dim, init_values) if init_values \
            else nn.Identity()
        self.norm2 = nn.LayerNorm(dim, eps=eps)
        self.mlp = Mlp(dim, int(dim * mlp_ratio), dim)
        self.ls2 = LayerScale(dim, init_values) if init_values \
            else nn.Identity()

    def forward(self, x, pos=None):
        x = x + self.ls1(self.attn(self.norm1(x), pos))
        return x + self.ls2(self.mlp(self.norm2(x)))


class PatchEmbedConv(nn.Module):
    def __init__(self, patch, dim):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, patch, stride=patch)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class DinoViT(nn.Module):
    """DINOv2 ViT w/ registers; state_dict keys mirror
    vggt/layers/vision_transformer.py (cls_token, pos_embed,
    register_tokens, mask_token, blocks.N.*, norm)."""

    def __init__(self, patch, dim, depth, heads, n_reg, pos_grid):
        super().__init__()
        self.patch_embed = PatchEmbedConv(patch, dim)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(
            torch.randn(1, 1 + pos_grid * pos_grid, dim) * 0.02)
        self.register_tokens = nn.Parameter(torch.randn(1, n_reg, dim) * .02)
        self.mask_token = nn.Parameter(torch.zeros(1, dim))
        self.blocks = nn.ModuleList(
            [Block(dim, heads, init_values=1.0, eps=1e-6)
             for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.n_reg = n_reg
        self.pos_grid = pos_grid

    def forward(self, x):
        B = x.shape[0]
        t = self.patch_embed(x)
        t = torch.cat([self.cls_token.expand(B, -1, -1), t], 1)
        assert t.shape[1] == self.pos_embed.shape[1], \
            "mirror only supports the native pos grid"
        t = t + self.pos_embed
        t = torch.cat([t[:, :1], self.register_tokens.expand(B, -1, -1),
                       t[:, 1:]], 1)
        for blk in self.blocks:
            t = blk(t)
        t = self.norm(t)
        return t[:, 1 + self.n_reg:]


class Aggregator(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        c = cfg
        self.patch_embed = DinoViT(c["patch"], c["vit_dim"], c["vit_depth"],
                                   c["vit_heads"], c["n_reg"], c["pos_grid"])
        self.camera_token = nn.Parameter(torch.randn(1, 2, 1, c["dim"]))
        self.register_token = nn.Parameter(
            torch.randn(1, 2, c["n_reg"], c["dim"]))
        self.frame_blocks = nn.ModuleList(
            [Block(c["dim"], c["heads"], init_values=0.01, qk_norm=True,
                   rope_freq=c["rope_freq"]) for _ in range(c["depth"])])
        self.global_blocks = nn.ModuleList(
            [Block(c["dim"], c["heads"], init_values=0.01, qk_norm=True,
                   rope_freq=c["rope_freq"]) for _ in range(c["depth"])])
        self.cfg = c

    def forward(self, images):
        c = self.cfg
        B, S, _, H, W = images.shape
        x = (images - MEAN) / STD
        pt = self.patch_embed(x.reshape(B * S, 3, H, W))
        ns = 1 + c["n_reg"]
        cam = torch.cat([self.camera_token[:, 0:1].expand(B, 1, 1, -1),
                         self.camera_token[:, 1:2].expand(B, S - 1, 1, -1)],
                        1).reshape(B * S, 1, -1)
        reg = torch.cat(
            [self.register_token[:, 0:1].expand(B, 1, c["n_reg"], -1),
             self.register_token[:, 1:2].expand(B, S - 1, c["n_reg"], -1)],
            1).reshape(B * S, c["n_reg"], -1)
        tokens = torch.cat([cam, reg, pt], 1)
        T = tokens.shape[1]
        Hp, Wp = H // c["patch"], W // c["patch"]
        ys, xs = torch.meshgrid(torch.arange(Hp), torch.arange(Wp),
                                indexing="ij")
        grid = torch.stack([ys.reshape(-1), xs.reshape(-1)], -1) + 1
        pos_f = torch.cat([torch.zeros(ns, 2, dtype=torch.long), grid], 0)
        pos_g = pos_f.repeat(S, 1)

        inters = []
        for fb, gb in zip(self.frame_blocks, self.global_blocks):
            tokens = fb(tokens, pos_f)
            frame_out = tokens
            xg = tokens.reshape(B, S * T, -1)
            xg = gb(xg, pos_g)
            tokens = xg.reshape(B * S, T, -1)
            inters.append(torch.cat(
                [frame_out, tokens], -1).reshape(B, S, T, -1))
        return inters, ns


class CameraHead(nn.Module):
    def __init__(self, dim, heads, trunk_depth, iterations):
        super().__init__()
        self.trunk = nn.Sequential(
            *[Block(dim, heads, init_values=0.01)
              for _ in range(trunk_depth)])
        self.token_norm = nn.LayerNorm(dim)
        self.trunk_norm = nn.LayerNorm(dim)
        self.empty_pose_tokens = nn.Parameter(torch.zeros(1, 1, 9))
        self.embed_pose = nn.Linear(9, dim)
        self.poseLN_modulation = nn.Sequential(
            nn.SiLU(), nn.Linear(dim, 3 * dim))
        self.adaln_norm = nn.LayerNorm(dim, elementwise_affine=False,
                                       eps=1e-6)
        self.pose_branch = Mlp(dim, dim // 2, 9)
        self.iterations = iterations

    def forward(self, tokens):
        pose_tokens = self.token_norm(tokens[:, :, 0])
        B, S, _ = pose_tokens.shape
        pred = None
        for _ in range(self.iterations):
            if pred is None:
                inp = self.embed_pose(self.empty_pose_tokens.expand(B, S, 9))
            else:
                pred = pred.detach()
                inp = self.embed_pose(pred)
            shift, scale, gate = self.poseLN_modulation(inp).chunk(3, -1)
            z = gate * (self.adaln_norm(pose_tokens) * (1 + scale) + shift)
            z = z + pose_tokens
            z = self.trunk(z)
            delta = self.pose_branch(self.trunk_norm(z))
            pred = delta if pred is None else pred + delta
        return torch.cat([pred[..., :7], F.relu(pred[..., 7:])], -1)


def uv_pos_embed(Hp, Wp, dim, aspect):
    diag = math.sqrt(aspect * aspect + 1.0)
    sx, sy = aspect / diag, 1.0 / diag
    xs = torch.linspace(-sx * (Wp - 1) / Wp, sx * (Wp - 1) / Wp, Wp)
    ys = torch.linspace(-sy * (Hp - 1) / Hp, sy * (Hp - 1) / Hp, Hp)
    uu, vv = torch.meshgrid(xs, ys, indexing="xy")

    def sincos(p, d):
        omega = 1.0 / (100.0 ** (torch.arange(d // 2).double() / (d / 2.0)))
        out = p.reshape(-1).double()[:, None] * omega
        return torch.cat([out.sin(), out.cos()], -1).float()

    emb = torch.cat([sincos(uu, dim // 2), sincos(vv, dim // 2)], -1)
    return emb.view(Hp, Wp, dim).permute(2, 0, 1)


class ResidualConvUnit(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv1 = nn.Conv2d(f, f, 3, padding=1)
        self.conv2 = nn.Conv2d(f, f, 3, padding=1)

    def forward(self, x):
        h = self.conv1(F.relu(x))
        return self.conv2(F.relu(h)) + x


class FeatureFusionBlock(nn.Module):
    def __init__(self, f, has_residual=True):
        super().__init__()
        if has_residual:
            self.resConfUnit1 = ResidualConvUnit(f)
        self.resConfUnit2 = ResidualConvUnit(f)
        self.out_conv = nn.Conv2d(f, f, 1)
        self.has_residual = has_residual

    def forward(self, x, res=None, size=None):
        if self.has_residual:
            x = x + self.resConfUnit1(res)
        x = self.resConfUnit2(x)
        if size is None:
            size = (x.shape[-2] * 2, x.shape[-1] * 2)
        x = F.interpolate(x, size=size, mode="bilinear", align_corners=True)
        return self.out_conv(x)


class Scratch(nn.Module):
    def __init__(self, oc, f):
        super().__init__()
        self.layer1_rn = nn.Conv2d(oc[0], f, 3, padding=1, bias=False)
        self.layer2_rn = nn.Conv2d(oc[1], f, 3, padding=1, bias=False)
        self.layer3_rn = nn.Conv2d(oc[2], f, 3, padding=1, bias=False)
        self.layer4_rn = nn.Conv2d(oc[3], f, 3, padding=1, bias=False)
        self.refinenet1 = FeatureFusionBlock(f)
        self.refinenet2 = FeatureFusionBlock(f)
        self.refinenet3 = FeatureFusionBlock(f)
        self.refinenet4 = FeatureFusionBlock(f, has_residual=False)
        self.output_conv1 = nn.Conv2d(f, f // 2, 3, padding=1)
        self.output_conv2 = nn.Sequential(
            nn.Conv2d(f // 2, 32, 3, padding=1), nn.ReLU(),
            nn.Conv2d(32, 4, 1))


class DPTHead(nn.Module):
    def __init__(self, dim_in, patch, layers, oc, f, output_dim,
                 activation):
        super().__init__()
        self.norm = nn.LayerNorm(dim_in)
        self.projects = nn.ModuleList(
            [nn.Conv2d(dim_in, o, 1) for o in oc])
        self.resize_layers = nn.ModuleList([
            nn.ConvTranspose2d(oc[0], oc[0], 4, stride=4),
            nn.ConvTranspose2d(oc[1], oc[1], 2, stride=2),
            nn.Identity(),
            nn.Conv2d(oc[3], oc[3], 3, stride=2, padding=1)])
        self.scratch = Scratch(oc, f)
        self.scratch.output_conv2[2] = nn.Conv2d(32, output_dim, 1)
        self.layers = layers
        self.patch = patch
        self.activation = activation

    def forward(self, inters, images, ns):
        B, S, _, H, W = images.shape
        Hp, Wp = H // self.patch, W // self.patch
        outs = []
        for j, li in enumerate(self.layers):
            x = inters[li][:, :, ns:].reshape(B * S, Hp * Wp, -1)
            x = self.norm(x)
            x = x.permute(0, 2, 1).reshape(B * S, -1, Hp, Wp)
            x = self.projects[j](x)
            x = x + 0.1 * uv_pos_embed(Hp, Wp, x.shape[1], W / H)
            x = self.resize_layers[j](x)
            outs.append(x)
        l1 = self.scratch.layer1_rn(outs[0])
        l2 = self.scratch.layer2_rn(outs[1])
        l3 = self.scratch.layer3_rn(outs[2])
        l4 = self.scratch.layer4_rn(outs[3])
        o = self.scratch.refinenet4(l4, size=l3.shape[2:])
        o = self.scratch.refinenet3(o, l3, size=l2.shape[2:])
        o = self.scratch.refinenet2(o, l2, size=l1.shape[2:])
        o = self.scratch.refinenet1(o, l1)
        o = self.scratch.output_conv1(o)
        o = F.interpolate(o, size=(Hp * self.patch, Wp * self.patch),
                          mode="bilinear", align_corners=True)
        o = o + 0.1 * uv_pos_embed(o.shape[-2], o.shape[-1],
                                   o.shape[1], W / H)
        o = self.scratch.output_conv2(o)
        fmap = o.permute(0, 2, 3, 1)
        val, conf = fmap[..., :-1], fmap[..., -1]
        if self.activation == "exp":
            val = val.exp()
        elif self.activation == "inv_log":
            val = val.sign() * torch.expm1(val.abs())
        conf = 1 + conf.exp()
        return (val.reshape(B, S, *val.shape[1:]),
                conf.reshape(B, S, *conf.shape[1:]))


class VGGTMirror(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.aggregator = Aggregator(cfg)
        self.camera_head = CameraHead(2 * cfg["dim"], cfg["heads"],
                                      cfg["trunk_depth"], cfg["iterations"])
        self.depth_head = DPTHead(2 * cfg["dim"], cfg["patch"],
                                  cfg["inter_layers"], cfg["dpt_oc"],
                                  cfg["dpt_f"], 2, "exp")
        self.point_head = DPTHead(2 * cfg["dim"], cfg["patch"],
                                  cfg["inter_layers"], cfg["dpt_oc"],
                                  cfg["dpt_f"], 4, "inv_log")

    def forward(self, images):
        inters, ns = self.aggregator(images)
        pose = self.camera_head(inters[-1])
        depth, dconf = self.depth_head(inters, images, ns)
        pts, pconf = self.point_head(inters, images, ns)
        return {"pose_enc": pose, "depth": depth[..., 0],
                "depth_conf": dconf, "world_points": pts,
                "world_points_conf": pconf}


# ----------------------------------------------------------- track head
# (vggt/heads/track_head.py + track_modules/* semantics, fresh impl with
# checkpoint-layout state_dict keys)

class FeatureScratch(nn.Module):
    def __init__(self, oc, f):
        super().__init__()
        self.layer1_rn = nn.Conv2d(oc[0], f, 3, padding=1, bias=False)
        self.layer2_rn = nn.Conv2d(oc[1], f, 3, padding=1, bias=False)
        self.layer3_rn = nn.Conv2d(oc[2], f, 3, padding=1, bias=False)
        self.layer4_rn = nn.Conv2d(oc[3], f, 3, padding=1, bias=False)
        self.refinenet1 = FeatureFusionBlock(f)
        self.refinenet2 = FeatureFusionBlock(f)
        self.refinenet3 = FeatureFusionBlock(f)
        self.refinenet4 = FeatureFusionBlock(f, has_residual=False)
        self.output_conv1 = nn.Conv2d(f, f, 3, padding=1)


class FeatureDPT(nn.Module):
    """DPT feature extractor: feature_only=True, down_ratio=2, no pos."""

    def __init__(self, dim_in, patch, layers, oc, f):
        super().__init__()
        self.norm = nn.LayerNorm(dim_in)
        self.projects = nn.ModuleList(
            [nn.Conv2d(dim_in, o, 1) for o in oc])
        self.resize_layers = nn.ModuleList([
            nn.ConvTranspose2d(oc[0], oc[0], 4, stride=4),
            nn.ConvTranspose2d(oc[1], oc[1], 2, stride=2),
            nn.Identity(),
            nn.Conv2d(oc[3], oc[3], 3, stride=2, padding=1)])
        self.scratch = FeatureScratch(oc, f)
        self.layers = layers
        self.patch = patch

    def forward(self, inters, images, ns):
        B, S, _, H, W = images.shape
        Hp, Wp = H // self.patch, W // self.patch
        outs = []
        for j, li in enumerate(self.layers):
            x = inters[li][:, :, ns:].reshape(B * S, Hp * Wp, -1)
            x = self.norm(x)
            x = x.permute(0, 2, 1).reshape(B * S, -1, Hp, Wp)
            x = self.projects[j](x)
            x = self.resize_layers[j](x)
            outs.append(x)
        l1 = self.scratch.layer1_rn(outs[0])
        l2 = self.scratch.layer2_rn(outs[1])
        l3 = self.scratch.layer3_rn(outs[2])
        l4 = self.scratch.layer4_rn(outs[3])
        o = self.scratch.refinenet4(l4, size=l3.shape[2:])
        o = self.scratch.refinenet3(o, l3, size=l2.shape[2:])
        o = self.scratch.refinenet2(o, l2, size=l1.shape[2:])
        o = self.scratch.refinenet1(o, l1)
        o = self.scratch.output_conv1(o)
        o = F.interpolate(o, size=(Hp * self.patch // 2,
                                   Wp * self.patch // 2),
                          mode="bilinear", align_corners=True)
        return o.reshape(B, S, *o.shape[1:])


class TMlp(nn.Module):
    def __init__(self, d_in, hidden, out):
        super().__init__()
        self.fc1 = nn.Linear(d_in, hidden)
        self.fc2 = nn.Linear(hidden, out)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TAttnBlock(nn.Module):
    def __init__(self, d, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(d)
        self.norm2 = nn.LayerNorm(d)
        self.attn = nn.MultiheadAttention(d, heads, batch_first=True)
        self.mlp = TMlp(d, int(d * mlp_ratio), d)

    def forward(self, x):
        x = self.norm1(x)
        x = x + self.attn(x, x, x)[0]
        return x + self.mlp(self.norm2(x))


class TCrossAttnBlock(nn.Module):
    def __init__(self, d, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(d)
        self.norm_context = nn.LayerNorm(d)
        self.norm2 = nn.LayerNorm(d)
        self.cross_attn = nn.MultiheadAttention(d, heads, batch_first=True)
        self.mlp = TMlp(d, int(d * mlp_ratio), d)

    def forward(self, x, ctx):
        x = self.norm1(x)
        ctx = self.norm_context(ctx)
        x = x + self.cross_attn(x, ctx, ctx)[0]
        return x + self.mlp(self.norm2(x))


class UpdateFormerMirror(nn.Module):
    def __init__(self, depth, d_in, hidden, out, heads=8, n_virtual=64):
        super().__init__()
        self.input_norm = nn.LayerNorm(d_in)
        self.input_transform = nn.Linear(d_in, hidden)
        self.output_norm = nn.LayerNorm(hidden)
        self.flow_head = nn.Linear(hidden, out)
        self.virual_tracks = nn.Parameter(
            torch.randn(1, n_virtual, 1, hidden))
        self.time_blocks = nn.ModuleList(
            [TAttnBlock(hidden, heads) for _ in range(depth)])
        self.space_virtual_blocks = nn.ModuleList(
            [TAttnBlock(hidden, heads) for _ in range(depth)])
        self.space_point2virtual_blocks = nn.ModuleList(
            [TCrossAttnBlock(hidden, heads) for _ in range(depth)])
        self.space_virtual2point_blocks = nn.ModuleList(
            [TCrossAttnBlock(hidden, heads) for _ in range(depth)])
        self.n_virtual = n_virtual

    def forward(self, x):
        x = self.input_norm(x)
        tokens = self.input_transform(x)
        init_tokens = tokens
        B, _, T, _ = tokens.shape
        virt = self.virual_tracks.repeat(B, 1, T, 1)
        tokens = torch.cat([tokens, virt], dim=1)
        _, N, _, _ = tokens.shape
        j = 0
        for i in range(len(self.time_blocks)):
            t = tokens.reshape(B * N, T, -1)
            t = self.time_blocks[i](t)
            tokens = t.reshape(B, N, T, -1)
            sp = tokens.permute(0, 2, 1, 3).reshape(B * T, N, -1)
            pts = sp[:, :N - self.n_virtual]
            vt = sp[:, N - self.n_virtual:]
            vt = self.space_virtual2point_blocks[j](vt, pts)
            vt = self.space_virtual_blocks[j](vt)
            pts = self.space_point2virtual_blocks[j](pts, vt)
            sp = torch.cat([pts, vt], dim=1)
            tokens = sp.reshape(B, T, N, -1).permute(0, 2, 1, 3)
            j += 1
        tokens = tokens[:, :N - self.n_virtual] + init_tokens
        return self.flow_head(self.output_norm(tokens))


def t_bilinear(img, xy):
    """img [M,1,H,W], xy [M,h,w,2] pixel coords (align_corners=True),
    zeros padding."""
    H, W = img.shape[-2:]
    gx = 2 * xy[..., 0] / max(W - 1, 1) - 1
    gy = 2 * xy[..., 1] / max(H - 1, 1) - 1
    grid = torch.stack([gx, gy], dim=-1)
    return F.grid_sample(img, grid, mode="bilinear", align_corners=True,
                         padding_mode="zeros")


def t_2d_embedding(xy, C):
    div = (torch.arange(0, C, 2, dtype=torch.float32) * (1000.0 / C))
    pe = []
    for v in (xy[..., 0], xy[..., 1]):
        s = torch.sin(v[..., None] * div)
        c = torch.cos(v[..., None] * div)
        pe.append(torch.stack([s, c], dim=-1).reshape(*v.shape, C))
    return torch.cat(pe, dim=-1)


def t_sincos_grid(dim, HH, WW):
    import numpy as _np
    def axis(pos, d):
        omega = 1.0 / (10000.0 ** (_np.arange(d // 2, dtype=_np.float64)
                                   / (d / 2.0)))
        out = pos.reshape(-1)[:, None] * omega[None]
        return _np.concatenate([_np.sin(out), _np.cos(out)], axis=1)
    gx, gy = _np.meshgrid(_np.arange(WW, dtype=_np.float32),
                          _np.arange(HH, dtype=_np.float32), indexing="xy")
    emb = _np.concatenate([axis(gx, dim // 2), axis(gy, dim // 2)], axis=1)
    return torch.from_numpy(emb.reshape(HH, WW, dim)).float()


class TrackerMirror(nn.Module):
    def __init__(self, latent, hidden, depth, levels, radius, iters,
                 heads=8, n_virtual=64, stride=2, max_scale=518.0):
        super().__init__()
        self.latent, self.levels, self.radius = latent, levels, radius
        self.iters, self.stride, self.max_scale = iters, stride, max_scale
        tdim = 3 * latent + 4
        self.tdim = tdim
        self.corr_mlp = TMlp(levels * (2 * radius + 1) ** 2, hidden, latent)
        self.query_ref_token = nn.Parameter(torch.randn(1, 2, tdim))
        self.updateformer = UpdateFormerMirror(
            depth, tdim, hidden, latent + 2, heads, n_virtual)
        self.fmap_norm = nn.LayerNorm(latent)
        self.ffeat_norm = nn.GroupNorm(1, latent)
        self.ffeat_updater = nn.Sequential(nn.Linear(latent, latent),
                                           nn.GELU())
        self.vis_predictor = nn.Sequential(nn.Linear(latent, 1))
        self.conf_predictor = nn.Sequential(nn.Linear(latent, 1))

    def forward(self, query_points, fmaps):
        B, S, C, HH, WW = fmaps.shape
        N = query_points.shape[1]
        fmaps = self.fmap_norm(
            fmaps.permute(0, 1, 3, 4, 2)).permute(0, 1, 4, 2, 3)
        qp = query_points / float(self.stride)
        coords = qp.reshape(B, 1, N, 2).repeat(1, S, 1, 1)
        backup = coords.clone()

        qfeat = t_bilinear(
            fmaps[:, 0].reshape(B, C, HH, WW),
            coords[:, 0].reshape(B, 1, N, 2)).reshape(B, C, N
                                                      ).permute(0, 2, 1)
        track_feats = qfeat.unsqueeze(1).repeat(1, S, 1, 1)

        pyr = [fmaps]
        cur = fmaps
        for _ in range(self.levels - 1):
            b, s, c, h, w = cur.shape
            cur = F.avg_pool2d(cur.reshape(b * s, c, h, w), 2, 2)
            cur = cur.reshape(b, s, c, *cur.shape[-2:])
            pyr.append(cur)

        pos_grid = t_sincos_grid(self.tdim, HH, WW).permute(2, 0, 1)[None]
        pos_q = t_bilinear(
            pos_grid.expand(B, -1, -1, -1).reshape(B, self.tdim, HH, WW),
            coords[:, 0].reshape(B, 1, N, 2)).reshape(B, self.tdim, N
                                                      ).permute(0, 2, 1)

        r = self.radius
        d1 = torch.arange(-r, r + 1, dtype=torch.float32)
        dy, dx = torch.meshgrid(d1, d1, indexing="ij")
        delta = torch.stack([dx, dy], dim=-1)

        preds = []
        for _ in range(self.iters):
            coords = coords.detach()
            outs = []
            for i, fm in enumerate(pyr):
                b, s, c, h, w = fm.shape
                corr = torch.einsum(
                    "bsnc,bschw->bsnhw", track_feats, fm) / math.sqrt(c)
                cl = coords / (2.0 ** i)
                pts = cl[:, :, :, None, None, :] + delta[None, None, None]
                samp = t_bilinear(
                    corr.reshape(B * S * N, 1, h, w),
                    pts.reshape(B * S * N, 2 * r + 1, 2 * r + 1, 2))
                outs.append(samp.reshape(B, S, N, -1))
            fcorrs = self.corr_mlp(torch.cat(outs, dim=-1))

            flows = coords - coords[:, 0:1]
            femb = t_2d_embedding(flows, self.latent // 2)
            femb = torch.cat([femb, flows / self.max_scale,
                              flows / self.max_scale], dim=-1)
            x = torch.cat([femb, fcorrs, track_feats], dim=-1)
            x = x + pos_q[:, None]
            ref = torch.cat(
                [self.query_ref_token[:, 0:1],
                 self.query_ref_token[:, 1:2].expand(-1, S - 1, -1)],
                dim=1)
            x = x + ref[:, :, None]
            x = x.permute(0, 2, 1, 3)                     # B N S D
            delta_out = self.updateformer(x).permute(0, 2, 1, 3)
            dc, df = delta_out[..., :2], delta_out[..., 2:]
            tf = track_feats.reshape(-1, self.latent)
            dff = df.reshape(-1, self.latent)
            tf = self.ffeat_updater(self.ffeat_norm(dff)) + tf
            track_feats = tf.reshape(B, S, N, self.latent)
            coords = coords + dc
            coords[:, 0] = backup[:, 0]
            preds.append(coords * self.stride)

        vis = torch.sigmoid(self.vis_predictor(track_feats)[..., 0])
        conf = torch.sigmoid(self.conf_predictor(track_feats)[..., 0])
        return preds, vis, conf


class TrackHeadMirror(nn.Module):
    def __init__(self, dim_in, patch, layers, oc, f, hidden, depth,
                 levels, radius, iters, heads=8, n_virtual=64):
        super().__init__()
        self.feature_extractor = FeatureDPT(dim_in, patch, layers, oc, f)
        self.tracker = TrackerMirror(f, hidden, depth, levels, radius,
                                     iters, heads, n_virtual)

    def forward(self, inters, images, ns, query_points):
        fmaps = self.feature_extractor(inters, images, ns)
        return self.tracker(query_points, fmaps)
