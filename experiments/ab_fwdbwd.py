"""fwd+bwd rasterizer timing at the bench scene (100k splats, 720x480)
— the training-gradient pass, post two-tier binning.

Run:  cd /root/repo && timeout 590 python experiments/ab_fwdbwd.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from langscenex_tpu.ops.rasterize import RasterConfig, rasterize
from __graft_entry__ import _camera, _scene

P = 100_000


def main():
    cam = _camera(720, 480)
    means, scales, quats, opac, shs, lang, inst = _scene(P)
    jargs = tuple(map(jnp.asarray, (means, scales, quats, opac, shs)))
    for tag, cfg in [
        ("base", RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16,
                              chunk=128)),
        ("cap1.2M", RasterConfig(tile_w=128, tile_h=8,
                                 max_tiles_per_splat=16, chunk=128,
                                 max_pairs=1_200_000)),
        ("presort", RasterConfig(tile_w=128, tile_h=8,
                                 max_tiles_per_splat=16, chunk=128,
                                 depth_presort=True)),
    ]:
        def loss(m, s2, q, o, sh):
            out = rasterize(m, s2, q, o, cam, jnp.zeros(3), shs=sh,
                            sh_degree=3, cfg=cfg)
            return jnp.sum(out.color)
        gr = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
        r = gr(*jargs)
        s = float(jnp.sum(r[0]))
        ds = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = gr(*jargs)
            s = float(jnp.sum(r[0]))
            ds.append(time.perf_counter() - t0)
        print(f"fwd+bwd {tag:8s}: {min(ds)*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
