"""Round-3 render staging A/B (VERDICT item 1).

Part A: re-attribute the forward budget at TODAY'S defaults (32x32
tiles, conic cull, demand-sized cap 640k) via prefix timings.
Part B: the untried levers —
  - tier-1 width K1 (the SORT DOMAIN is P*K1 + B*(n_tiles-K1) keys,
    ~1.68M at K1=16 — 2.6x the 640k kept pairs; smaller K1 shrinks the
    sort stream as long as tier 2 absorbs the big splats),
  - big_splats B (tier-2 register),
  - depth_presort (single-key-ish sort payload).
Bit-identity of the color output vs the default config is asserted for
every variant (the binning changes must be exact, not approximate).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _camera, _scene
from langscenex_tpu.ops.rasterize import (RasterConfig, rasterize,
                                          preprocess)
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


def stage_fns(cfg):
    grid_x = (720 + cfg.tile_w - 1) // cfg.tile_w
    grid_y = (480 + cfg.tile_h - 1) // cfg.tile_h
    n_tiles = grid_x * grid_y

    def pre(means, scales, quats, opac, shs, lang, inst):
        proc = preprocess(means, scales, quats, CAM, shs=shs, sh_degree=3,
                          tile_w=cfg.tile_w, tile_h=cfg.tile_h,
                          opacity=opac)
        return proc.mean2d

    def upto_lists(means, scales, quats, opac, shs, lang, inst):
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
        return lists.point_list

    def upto_aligned(means, scales, quats, opac, shs, lang, inst):
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
        return ap.src

    def upto_pay3(means, scales, quats, opac, shs, lang, inst):
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
        pay_rm = jax.lax.optimization_barrier(pay_rm)
        pay3 = pay_rm.reshape(-1, 128, 24).transpose(0, 2, 1)
        return pay3

    def full(means, scales, quats, opac, shs, lang, inst):
        out = rasterize(means, scales, quats, opac, CAM, jnp.zeros(3),
                        shs=shs, sh_degree=3, language_feature=lang,
                        instance_feature=inst, cfg=cfg)
        return out.color

    return pre, upto_lists, upto_aligned, upto_pay3, full


def color_of(cfg, args):
    def f(*a):
        out = rasterize(a[0], a[1], a[2], a[3], CAM, jnp.zeros(3),
                        shs=a[4], sh_degree=3, language_feature=a[5],
                        instance_feature=a[6], cfg=cfg)
        return out.color, out.num_pairs, out.k_overflowed
    c, npairs, kovf = jax.jit(f)(*args)
    return np.asarray(c), int(npairs), bool(kovf)


def main():
    args = tuple(map(jnp.asarray, _scene(P)))
    base_cfg = RasterConfig(max_tiles_per_splat=16, max_pairs=640_000,
                            **BASE)

    print("=== part A: prefix budget at defaults (K1=16, B=256) ===")
    pre, lists_, al, pay, full = stage_fns(base_cfg)
    timed("preprocess", pre, args)
    timed("+ enumerate+sort+ranges", lists_, args)
    timed("+ aligned pair map", al, args)
    timed("+ payload gather + pay3", pay, args)
    base_ms = timed("full forward", full, args)
    base_color, npairs, _ = color_of(base_cfg, args)
    print(f"    (culled pair demand under cap: {npairs})")

    print("=== part B: sort-domain variants (bit-identity checked) ===")
    for k1, b in ((16, 256), (8, 1024), (8, 4096), (4, 4096), (32, 256)):
        cfg = RasterConfig(max_tiles_per_splat=k1, big_splats=b,
                           max_pairs=640_000, **BASE)
        c, n, kovf = color_of(cfg, args)
        gap = float(np.abs(c - base_color).max())
        tag = f"K1={k1:2d} B={b:4d} kovf={int(kovf)} gap={gap:.1e}"
        if kovf:
            print(f"{tag}: tier-2 overflow, not exact — skip timing",
                  flush=True)
            continue
        _, _, _, _, fullv = stage_fns(cfg)
        timed(tag, fullv, args)

    print("=== part B2: depth_presort at the best K1 ===")
    for k1, b in ((16, 256), (8, 1024)):
        cfg = RasterConfig(max_tiles_per_splat=k1, big_splats=b,
                           max_pairs=640_000, depth_presort=True, **BASE)
        c, n, kovf = color_of(cfg, args)
        gap = float(np.abs(c - base_color).max())
        _, _, _, _, fullv = stage_fns(cfg)
        timed(f"presort K1={k1:2d} B={b:4d} gap={gap:.1e}", fullv, args)


if __name__ == "__main__":
    main()
