"""Round-3 staging attribution, part 2: split the 11.5 ms
"payload gather + pay3" stage (ab_staging.py) into gather vs transpose,
and time the K1/B sort-domain variants REGARDLESS of tier-2 overflow
(the static timed work — enumeration, sort stream, 640k-cap staging — is
identical whether overflow pairs are truncated or not; output gaps are
reported as caveats, timing is the signal here).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _camera, _scene
from langscenex_tpu.ops.rasterize import RasterConfig, rasterize, preprocess
from langscenex_tpu.ops.binning import CullSpec, build_tile_lists
from langscenex_tpu.ops.rasterize_pallas import build_aligned_pairs

P = 100_000
CAM = _camera(720, 480)
BASE = dict(tile_w=32, tile_h=32, chunk=128, max_splats_per_tile=1024)


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
    print(f"{name:52s} {dt:7.2f} ms   ({1e3/dt:6.1f} fps)", flush=True)
    return dt


def make_stage(cfg, upto):
    grid_x = (720 + cfg.tile_w - 1) // cfg.tile_w
    grid_y = (480 + cfg.tile_h - 1) // cfg.tile_h
    n_tiles = grid_x * grid_y

    def f(means, scales, quats, opac, shs, lang, inst):
        proc = preprocess(means, scales, quats, CAM, shs=shs, sh_degree=3,
                          tile_w=cfg.tile_w, tile_h=cfg.tile_h,
                          opacity=opac)
        op_cull = jnp.where(proc.visible, opac.reshape(-1), 0.0)
        qmax = 2.0 * jnp.log(jnp.maximum(255.0 * op_cull, 1e-12)) + 0.05
        cull = CullSpec(mean2d=proc.mean2d, conic=proc.conic, qmax=qmax,
                        tile_w=cfg.tile_w, tile_h=cfg.tile_h)
        lists = build_tile_lists(proc, grid_x, grid_y,
                                 cfg.max_tiles_per_splat,
                                 max_pairs=cfg.max_pairs,
                                 big_splats=cfg.big_splats, cull=cull)
        ap = build_aligned_pairs(lists, n_tiles)
        channels = jnp.concatenate([proc.rgb, lang, inst], -1)
        op = jnp.where(proc.visible, opac.reshape(-1), 0.0)
        pad = jnp.zeros((P, 24 - 6 - 9), jnp.float32)
        payload = jnp.concatenate(
            [proc.mean2d, proc.conic, op.reshape(-1, 1), channels, pad], 1)
        payload = jnp.concatenate(
            [payload, jnp.zeros((1, 24), payload.dtype)], 0)
        payload = jax.lax.optimization_barrier(payload)
        slot_splat = jnp.where(ap.ids < 0, P, ap.ids)
        pay_rm = jnp.take(payload, slot_splat, axis=0)
        if upto == "gather":
            return pay_rm
        pay_rm = jax.lax.optimization_barrier(pay_rm)
        if upto == "gather_b":
            return pay_rm
        pay3 = pay_rm.reshape(-1, 128, 24).transpose(0, 2, 1)
        return pay3

    return f


def full_fn(cfg):
    def f(means, scales, quats, opac, shs, lang, inst):
        out = rasterize(means, scales, quats, opac, CAM, jnp.zeros(3),
                        shs=shs, sh_degree=3, language_feature=lang,
                        instance_feature=inst, cfg=cfg)
        return out.color
    return f


def main():
    args = tuple(map(jnp.asarray, _scene(P)))
    cfg = RasterConfig(max_tiles_per_splat=16, max_pairs=640_000, **BASE)

    print("=== gather vs transpose split (K1=16 B=256) ===")
    timed("upto row gather (no barrier)", make_stage(cfg, "gather"), args)
    timed("upto row gather (barrier)", make_stage(cfg, "gather_b"), args)
    timed("upto pay3 (gather+barrier+transpose)",
          make_stage(cfg, "pay3"), args)

    print("=== K1/B full-forward timings (truncation caveat noted) ===")
    base = full_fn(cfg)
    base_ms = timed("K1=16 B= 256 (r2 default)", base, args)
    for k1, b in ((8, 256), (8, 1024), (4, 1024), (32, 256), (16, 1024),
                  (16, 4096)):
        c = RasterConfig(max_tiles_per_splat=k1, big_splats=b,
                         max_pairs=640_000, **BASE)
        timed(f"K1={k1:2d} B={b:5d}", full_fn(c), args)


if __name__ == "__main__":
    main()
