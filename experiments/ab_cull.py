"""Conic tile-cull A/B on the real chip: tile shape x cull x sized cap.

The cull drops provably-invisible (splat, tile) pairs at binning time
(bit-identical output). Wall-clock follows the STATIC staging domain A,
not the true pair count — so the win materializes through max_pairs:
the trainer's adaptive cap converges to (post-cull) num_pairs, which the
cull shrinks 30-60%. Here we simulate steady state by sizing max_pairs
to 1.15x the measured demand per config.
"""
import dataclasses
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
        print(f"{name:44s} {dt:7.2f} ms   ({1e3/dt:6.1f} fps)", flush=True)
    except Exception as e:
        print(f"{name:44s} FAILED {type(e).__name__} {str(e)[:120]}",
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

    base = dict(max_tiles_per_splat=16, chunk=128, max_splats_per_tile=1024)
    variants = []
    for tw, th in [(128, 8), (32, 32)]:
        for cull in (False, True):
            variants.append((f"{tw}x{th}{' cull' if cull else '     '}",
                             RasterConfig(tile_w=tw, tile_h=th,
                                          tile_cull=cull, **base)))

    sized = []
    for name, cfg in variants:
        out = rasterize(means, scales, quats, opac, cam, jnp.zeros(3),
                        shs=shs, sh_degree=3, language_feature=lang,
                        instance_feature=inst, cfg=cfg)
        d = int(out.num_pairs)
        cap = ((int(d * 1.15) + 127) // 128) * 128
        print(f"{name}: demand {d:>9d}  -> cap {cap}", flush=True)
        sized.append((name, cfg, cap))

    for name, cfg, cap in sized:
        timed(f"fwd {name}", make_fwd(cfg), args)
        timed(f"fwd {name} cap", make_fwd(
            dataclasses.replace(cfg, max_pairs=cap)), args)
    for name, cfg, cap in sized:
        timed(f"fwd+bwd {name} cap", make_fwdbwd(
            dataclasses.replace(cfg, max_pairs=cap)), args, n=10)


if __name__ == "__main__":
    main()
