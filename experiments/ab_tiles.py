"""Tile-shape A/B on the real chip: 128x8 vs 64x16 vs 32x32 (all 1024 px).

Square tiles cut tile-overlap pairs for round splats: a radius-r splat
covers ~(2r/tw+1)(2r/th+1) tiles, minimized at tw==th for fixed tw*th.
The blend kernel itself is tile-shape-agnostic (pixels are data on the
1024-lane axis), so any win here is pure pair-count reduction through
sort + pair-map + payload staging + blend chunks.

Also reports the TRUE pair demand per shape (RenderOutput.num_pairs).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _camera, _scene
from langscenex_tpu.ops.rasterize import rasterize, RasterConfig


def timed(name, make_out, args, n=20):
    try:
        def body(*a):
            def step(carry, _):
                out = make_out(a[0] + carry * 1e-30, *a[1:])
                return jnp.sum(out[0]).astype(jnp.float32), None
            return jax.lax.scan(step, jnp.zeros(()), None, length=n)[0]
        jfn = jax.jit(body)
        float(jfn(*args))
        t0 = time.perf_counter()
        float(jfn(*args))
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{name:40s} {dt:7.2f} ms   ({1e3/dt:6.1f} fps)", flush=True)
    except Exception as e:
        print(f"{name:40s} FAILED {type(e).__name__} {str(e)[:120]}",
              flush=True)


def main():
    P = 100_000
    cam = _camera(720, 480)
    means, scales, quats, opac, shs, lang, inst = map(jnp.asarray, _scene(P))
    args = (means, scales, quats, opac, shs, lang, inst)

    def make_fwd(cfg):
        def fwd(means, scales, quats, opac, shs, lang, inst):
            out = rasterize(means, scales, quats, opac, cam, jnp.zeros(3),
                            shs=shs, sh_degree=3, language_feature=lang,
                            instance_feature=inst, cfg=cfg)
            return out.color, out.final_T
        return fwd

    def make_fwdbwd(cfg):
        fwd = make_fwd(cfg)

        def fb(*a):
            def loss(ms, sc, qt, op_, sh_, lg, it):
                c, T = fwd(ms, sc, qt, op_, sh_, lg, it)
                return jnp.sum(c) + jnp.sum(T)
            g = jax.grad(loss, argnums=(0, 1, 2, 3))(*a)
            return (sum(jnp.sum(x) for x in g),)
        return fb

    shapes = [(128, 8), (64, 16), (32, 32), (16, 64)]
    for tw, th in shapes:
        cfg = RasterConfig(tile_w=tw, tile_h=th, max_tiles_per_splat=16,
                           chunk=128, max_splats_per_tile=1024)
        out = rasterize(means, scales, quats, opac, cam, jnp.zeros(3),
                        shs=shs, sh_degree=3, language_feature=lang,
                        instance_feature=inst, cfg=cfg)
        print(f"tile {tw}x{th}: true pair demand "
              f"{int(out.num_pairs):>9d}", flush=True)

    for tw, th in shapes:
        cfg = RasterConfig(tile_w=tw, tile_h=th, max_tiles_per_splat=16,
                           chunk=128, max_splats_per_tile=1024)
        timed(f"fwd {tw}x{th}", make_fwd(cfg), args)
    for tw, th in shapes:
        cfg = RasterConfig(tile_w=tw, tile_h=th, max_tiles_per_splat=16,
                           chunk=128, max_splats_per_tile=1024)
        timed(f"fwd+bwd {tw}x{th}", make_fwdbwd(cfg), args, n=10)


if __name__ == "__main__":
    main()
