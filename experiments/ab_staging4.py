"""Align-free staging on the REAL chip: Mosaic-lowering validation +
fwd / fwd+bwd timing vs the aligned layout (round 3; see KERNELS.md §12).

Run: timeout 3000 python experiments/ab_staging4.py
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
            max_splats_per_tile=1024, max_pairs=640_000)


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
        def loss(ms, sc, qt, op_, sh_, lg, it):
            out = rasterize(ms, sc, qt, op_, CAM, jnp.zeros(3), shs=sh_,
                            sh_degree=3, language_feature=lg,
                            instance_feature=it, cfg=cfg)
            return jnp.sum(out.color) + jnp.sum(out.final_T)
        g = jax.grad(loss, argnums=(0, 1, 2, 3))(
            means, scales, quats, opac, shs, lang, inst)
        return g[0][:, 0] + g[3]
    return f


def main():
    args = tuple(map(jnp.asarray, _scene(P)))
    aligned = RasterConfig(align_free=False, **BASE)
    free = RasterConfig(align_free=True, **BASE)
    xla = RasterConfig(align_free=False, use_pallas=False, **BASE)

    # numeric agreement FIRST (device-only bug classes, KERNELS.md §6b)
    def outs(cfg):
        def f(*a):
            o = rasterize(a[0], a[1], a[2], a[3], CAM, jnp.zeros(3),
                          shs=a[4], sh_degree=3, language_feature=a[5],
                          instance_feature=a[6], cfg=cfg)
            return o.color, o.final_T, o.out_observe
        return jax.jit(f)(*args)

    ca, ta, oa = outs(aligned)
    cf, tf_, of = outs(free)
    print(f"align-free vs aligned on device: color "
          f"{float(jnp.abs(ca-cf).max()):.2e}  T "
          f"{float(jnp.abs(ta-tf_).max()):.2e}  obs "
          f"{int(jnp.abs(oa-of).max())}", flush=True)
    cx, tx, ox = outs(xla)
    print(f"align-free vs XLA path on device: color "
          f"{float(jnp.abs(cx-cf).max()):.2e}  T "
          f"{float(jnp.abs(tx-tf_).max()):.2e}", flush=True)

    # grads agreement (opacity grad, device)
    def gop(cfg):
        def loss(op):
            o = rasterize(args[0], args[1], args[2], op, CAM, jnp.zeros(3),
                          shs=args[4], sh_degree=3, language_feature=args[5],
                          instance_feature=args[6], cfg=cfg)
            return jnp.sum(o.color ** 2)
        return jax.jit(jax.grad(loss))(args[3])

    ga = gop(aligned)
    gf = gop(free)
    rel = float(jnp.abs(ga - gf).max() / (jnp.abs(ga).max() + 1e-9))
    print(f"d/d(opacity) max rel gap: {rel:.2e}", flush=True)

    timed("fwd aligned (r2 default)", make_fwd(aligned), args)
    timed("fwd ALIGN-FREE", make_fwd(free), args)
    timed("fwd+bwd aligned", make_fwdbwd(aligned), args)
    timed("fwd+bwd ALIGN-FREE", make_fwdbwd(free), args)
    # demand-fit cap (trainer steady state)
    for mp in (557_056,):
        cfgf = dataclasses.replace(free, max_pairs=mp)
        timed(f"fwd ALIGN-FREE cap={mp}", make_fwd(cfgf), args)
        timed(f"fwd+bwd ALIGN-FREE cap={mp}", make_fwdbwd(cfgf), args)


if __name__ == "__main__":
    main()
