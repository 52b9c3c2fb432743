"""Locate the on-device pallas-vs-XLA discrepancy."""
import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _camera, _scene
from langscenex_tpu.ops.rasterize import rasterize, RasterConfig

means, scales, quats, opac, shs, lang, inst = map(jnp.asarray, _scene(20_000))
cam = _camera(720, 480)
base = dict(tile_w=128, tile_h=8, max_tiles_per_splat=16, chunk=128,
            max_splats_per_tile=4096)

outs = {}
for name, use in (("pallas", True), ("xla", False)):
    cfg = RasterConfig(use_pallas=use, **base)
    o = jax.jit(lambda: rasterize(
        means, scales, quats, opac, cam, jnp.zeros(3), shs=shs, sh_degree=3,
        language_feature=lang, instance_feature=inst, cfg=cfg))()
    outs[name] = (np.asarray(o.color), np.asarray(o.final_T))

dc = np.abs(outs["pallas"][0] - outs["xla"][0]).max(axis=0)  # [H,W]
dT = np.abs(outs["pallas"][1] - outs["xla"][1])
print("pixels with color diff > 1e-3:", (dc > 1e-3).mean(), flush=True)
print("pixels with T diff > 1e-3:", (dT > 1e-3).mean(), flush=True)
ys, xs = np.nonzero(dc > 1e-2)
if len(ys):
    ty, tx = ys // 8, xs // 128
    import collections
    print("worst tiles (ty,tx,count):",
          collections.Counter(zip(ty.tolist(), tx.tolist())).most_common(8),
          flush=True)
    print("diff rows span:", ys.min(), ys.max(), "cols:", xs.min(), xs.max(),
          flush=True)
    i = np.argmax(dc)
    yy, xx = np.unravel_index(i, dc.shape)
    print("worst pixel", yy, xx, "pallas",
          outs["pallas"][0][:, yy, xx], "xla", outs["xla"][0][:, yy, xx],
          "T", outs["pallas"][1][yy, xx], outs["xla"][1][yy, xx], flush=True)
