"""Sort-side A/B on top of align-free staging: depth_presort +
packed single-key sort (RasterConfig.packed_sort) vs the 2-key id-order
sort. Run: timeout 2000 python experiments/ab_staging5.py
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _camera, _scene
from langscenex_tpu.ops.rasterize import RasterConfig, rasterize

P = 100_000
CAM = _camera(720, 480)
BASE = dict(tile_w=32, tile_h=32, max_tiles_per_splat=16, chunk=128,
            max_splats_per_tile=1024, max_pairs=640_000, align_free=True)


def timed(name, fn, args, n=20, reps=3):
    def body(*a):
        def step(carry, _):
            out = fn(a[0] + carry * 1e-30, *a[1:])
            return jnp.sum(out).astype(jnp.float32), None
        return jax.lax.scan(step, jnp.zeros(()), None, length=n)[0]
    jfn = jax.jit(body)
    float(jfn(*args))
    dts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jfn(*args))
        dts.append((time.perf_counter() - t0) / n * 1e3)
    dt = min(dts)
    print(f"{name:48s} {dt:7.2f} ms   ({1e3/dt:6.1f} fps)", flush=True)
    return dt


def make_fwd(cfg):
    def f(means, scales, quats, opac, shs, lang, inst):
        out = rasterize(means, scales, quats, opac, CAM, jnp.zeros(3),
                        shs=shs, sh_degree=3, language_feature=lang,
                        instance_feature=inst, cfg=cfg)
        return out.color
    return f


def make_fwdbwd(cfg):
    def f(means, scales, quats, opac, shs, lang, inst):
        def loss(ms, sc, qt, op_):
            out = rasterize(ms, sc, qt, op_, CAM, jnp.zeros(3), shs=shs,
                            sh_degree=3, language_feature=lang,
                            instance_feature=inst, cfg=cfg)
            return jnp.sum(out.color) + jnp.sum(out.final_T)
        g = jax.grad(loss, argnums=(0, 1, 2, 3))(means, scales, quats,
                                                 opac)
        return g[0][:, 0] + g[3]
    return f


def main():
    args = tuple(map(jnp.asarray, _scene(P)))
    plain = RasterConfig(**BASE)
    presort = RasterConfig(depth_presort=True, **BASE)
    packed = RasterConfig(depth_presort=True, packed_sort=True, **BASE)

    def color(cfg):
        f = make_fwd(cfg)
        return jax.jit(f)(*args)

    c0 = color(plain)
    for name, cfg in (("presort", presort), ("presort+packed", packed)):
        gap = float(jnp.abs(color(cfg) - c0).max())
        print(f"{name} color gap vs id-order: {gap:.2e} "
              f"(depth ties may reorder)", flush=True)

    timed("fwd align-free id-order (r3 base)", make_fwd(plain), args)
    timed("fwd align-free presort", make_fwd(presort), args)
    timed("fwd align-free presort+packed", make_fwd(packed), args)
    timed("fwd+bwd align-free id-order", make_fwdbwd(plain), args)
    timed("fwd+bwd align-free presort+packed", make_fwdbwd(packed), args)


if __name__ == "__main__":
    main()
