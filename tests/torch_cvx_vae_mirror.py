"""Random-init torch mirror of the diffusers AutoencoderKLCogVideoX for
converter validation (state_dict keys match the diffusers 0.30+ layout the
reference loads at cogvideox_interpolation/pipeline.py:135-140). Written
fresh against the documented behavior — diffusers itself is not available
in this environment.
"""
import torch
import torch.nn as nn
import torch.nn.functional as F


class CausalConv3d(nn.Module):
    def __init__(self, cin, cout, k):
        super().__init__()
        if isinstance(k, int):
            k = (k, k, k)
        self.conv = nn.Conv3d(cin, cout, k)
        self.kt = k[0]
        self.hp, self.wp = k[1] // 2, k[2] // 2

    def forward(self, x):                      # [B,C,T,H,W]
        if self.kt > 1:
            first = x[:, :, :1].repeat(1, 1, self.kt - 1, 1, 1)
            x = torch.cat([first, x], dim=2)
        x = F.pad(x, (self.wp, self.wp, self.hp, self.hp))
        return self.conv(x)


class SpatialNorm3D(nn.Module):
    def __init__(self, f_ch, z_ch, groups):
        super().__init__()
        self.norm_layer = nn.GroupNorm(min(groups, f_ch), f_ch, eps=1e-6)
        self.conv_y = CausalConv3d(z_ch, f_ch, 1)
        self.conv_b = CausalConv3d(z_ch, f_ch, 1)

    def forward(self, f, zq):
        Tf = f.shape[2]
        if Tf > 1 and Tf % 2 == 1:
            zf = F.interpolate(zq[:, :, :1], size=(1,) + f.shape[-2:])
            zr = F.interpolate(zq[:, :, 1:], size=(Tf - 1,) + f.shape[-2:])
            zq = torch.cat([zf, zr], dim=2)
        else:
            zq = F.interpolate(zq, size=(Tf,) + f.shape[-2:])
        return self.norm_layer(f) * self.conv_y(zq) + self.conv_b(zq)


class ResnetBlock3D(nn.Module):
    def __init__(self, cin, cout, groups, z_ch=None):
        super().__init__()
        if z_ch is None:
            self.norm1 = nn.GroupNorm(min(groups, cin), cin, eps=1e-6)
            self.norm2 = nn.GroupNorm(min(groups, cout), cout, eps=1e-6)
        else:
            self.norm1 = SpatialNorm3D(cin, z_ch, groups)
            self.norm2 = SpatialNorm3D(cout, z_ch, groups)
        self.conv1 = CausalConv3d(cin, cout, 3)
        self.conv2 = CausalConv3d(cout, cout, 3)
        if cin != cout:
            self.conv_shortcut = nn.Conv3d(cin, cout, 1)
        self.z = z_ch is not None

    def forward(self, x, zq=None):
        def n(norm, h):
            return norm(h, zq) if self.z else norm(h)
        h = self.conv1(F.silu(n(self.norm1, x)))
        h = self.conv2(F.silu(n(self.norm2, h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class Downsample3D(nn.Module):
    def __init__(self, ch, compress_time):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2)
        self.compress_time = compress_time

    def forward(self, x):                      # [B,C,T,H,W]
        if self.compress_time:
            B, C, T, H, W = x.shape
            f = x.permute(0, 3, 4, 1, 2).reshape(B * H * W, C, T)
            if T % 2 == 1:
                ff, fr = f[..., 0], f[..., 1:]
                if fr.shape[-1] > 0:
                    fr = F.avg_pool1d(fr, 2, 2)
                f = torch.cat([ff[..., None], fr], dim=-1)
            else:
                f = F.avg_pool1d(f, 2, 2)
            Tn = f.shape[-1]
            x = f.reshape(B, H, W, C, Tn).permute(0, 3, 4, 1, 2)
        B, C, T, H, W = x.shape
        x = F.pad(x, (0, 1, 0, 1))
        x = x.permute(0, 2, 1, 3, 4).reshape(B * T, C, H + 1, W + 1)
        x = self.conv(x)
        return x.reshape(B, T, *x.shape[1:]).permute(0, 2, 1, 3, 4)


class Upsample3D(nn.Module):
    def __init__(self, ch, compress_time):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)
        self.compress_time = compress_time

    def forward(self, x):
        if self.compress_time:
            T = x.shape[2]
            if T > 1 and T % 2 == 1:
                xf, xr = x[:, :, 0], x[:, :, 1:]
                xf = F.interpolate(xf, scale_factor=2.0)
                xr = F.interpolate(xr, scale_factor=2.0)
                x = torch.cat([xf[:, :, None], xr], dim=2)
            elif T > 1:
                x = F.interpolate(x, scale_factor=2.0)
            else:
                x = F.interpolate(x.squeeze(2), scale_factor=2.0
                                  )[:, :, None]
        else:
            B, C, T, H, W = x.shape
            x = x.permute(0, 2, 1, 3, 4).reshape(B * T, C, H, W)
            x = F.interpolate(x, scale_factor=2.0)
            x = x.reshape(B, T, *x.shape[1:]).permute(0, 2, 1, 3, 4)
        B, C, T, H, W = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(B * T, C, H, W)
        x = self.conv(x)
        return x.reshape(B, T, *x.shape[1:]).permute(0, 2, 1, 3, 4)


class Block(nn.Module):
    """Down/up block: resnets + optional sampler, diffusers naming."""
    def __init__(self, resnets, samplers=None, down=True):
        super().__init__()
        self.resnets = nn.ModuleList(resnets)
        if samplers is not None:
            name = "downsamplers" if down else "upsamplers"
            setattr(self, name, nn.ModuleList(samplers))


class Mid(nn.Module):
    def __init__(self, resnets):
        super().__init__()
        self.resnets = nn.ModuleList(resnets)


class Encoder3D(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chs = cfg["block_out"]
        g = cfg["groups"]
        self.conv_in = CausalConv3d(cfg["in_ch"], chs[0], 3)
        blocks = []
        for i, ch in enumerate(chs):
            cin = chs[i - 1] if i > 0 else chs[0]
            resnets = [ResnetBlock3D(cin if j == 0 else ch, ch, g)
                       for j in range(cfg["layers"])]
            samplers = None
            if i < len(chs) - 1:
                samplers = [Downsample3D(ch, i < cfg["t_levels"])]
            blocks.append(Block(resnets, samplers, down=True))
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = Mid([ResnetBlock3D(chs[-1], chs[-1], g),
                              ResnetBlock3D(chs[-1], chs[-1], g)])
        self.norm_out = nn.GroupNorm(g, chs[-1], eps=1e-6)
        self.conv_out = CausalConv3d(chs[-1], 2 * cfg["latent"], 3)

    def forward(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
        for r in self.mid_block.resnets:
            h = r(h)
        return self.conv_out(F.silu(self.norm_out(h)))


class Decoder3D(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chs = list(reversed(cfg["block_out"]))
        g = cfg["groups"]
        z = cfg["latent"]
        self.conv_in = CausalConv3d(z, chs[0], 3)
        self.mid_block = Mid([ResnetBlock3D(chs[0], chs[0], g, z),
                              ResnetBlock3D(chs[0], chs[0], g, z)])
        blocks = []
        for i, ch in enumerate(chs):
            cin = chs[i - 1] if i > 0 else chs[0]
            resnets = [ResnetBlock3D(cin if j == 0 else ch, ch, g, z)
                       for j in range(cfg["layers"] + 1)]
            samplers = None
            if i < len(chs) - 1:
                samplers = [Upsample3D(ch, i < cfg["t_levels"])]
            blocks.append(Block(resnets, samplers, down=False))
        self.up_blocks = nn.ModuleList(blocks)
        self.norm_out = SpatialNorm3D(chs[-1], z, g)
        self.conv_out = CausalConv3d(chs[-1], cfg["out_ch"], 3)

    def forward(self, zq):
        h = self.conv_in(zq)
        for r in self.mid_block.resnets:
            h = r(h, zq)
        for blk in self.up_blocks:
            for r in blk.resnets:
                h = r(h, zq)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.norm_out(h, zq)))


class VAEMirror(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = Encoder3D(cfg)
        self.decoder = Decoder3D(cfg)
        self.latent = cfg["latent"]

    def encode(self, video):                   # [B,T,C,H,W]
        x = video.permute(0, 2, 1, 3, 4)
        m = self.encoder(x).permute(0, 2, 1, 3, 4)
        return m.chunk(2, dim=2)

    def decode(self, latents):                 # [B,T',16,h,w]
        z = latents.permute(0, 2, 1, 3, 4)
        return self.decoder(z).permute(0, 2, 1, 3, 4)
