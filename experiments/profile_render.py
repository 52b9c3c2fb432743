"""Stage breakdown of the 100k-splat forward render on the real chip.

Times successively larger prefixes of the pipeline with the bench.py
data-dependency chaining trick (axon tunnel: only a fetched scalar is a
trustworthy fence).
"""
import time

import jax
import jax.numpy as jnp

from __graft_entry__ import entry, _camera, _scene
from langscenex_tpu.ops.rasterize import RasterConfig
from langscenex_tpu.ops.projection import preprocess
from langscenex_tpu.ops.binning import build_tile_lists
from langscenex_tpu.ops.rasterize_pallas import (
    build_aligned_pairs, blend_pairs, ROWS)


def timed(name, make_out, args, n=20):
    def body(*a):
        def step(carry, _):
            out = make_out(a[0] + carry * 1e-30, *a[1:])
            return jnp.sum(out), None
        return jax.lax.scan(step, jnp.zeros(()), None, length=n)[0]

    jfn = jax.jit(body)
    float(jfn(*args))
    t0 = time.perf_counter()
    float(jfn(*args))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:42s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    P = 100_000
    W, H = 720, 480
    cam = _camera(W, H)
    cfg = RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16,
                       chunk=128, max_splats_per_tile=1024)
    grid_x = (W + 127) // 128
    grid_y = (H + 7) // 8
    n_tiles = grid_x * grid_y
    means, scales, quats, opac, shs, lang, inst = map(
        jnp.asarray, _scene(P))

    def pre_only(means, scales, quats):
        p = preprocess(means, scales, quats, cam, shs=shs, sh_degree=3,
                       tile_w=128, tile_h=8)
        return jnp.sum(p.mean2d) + jnp.sum(p.conic) + jnp.sum(p.rgb)

    timed("preprocess", pre_only, (means, scales, quats))

    def pre_bin(means, scales, quats):
        p = preprocess(means, scales, quats, cam, shs=shs, sh_degree=3,
                       tile_w=128, tile_h=8)
        l = build_tile_lists(p, grid_x, grid_y, 16)
        return (jnp.sum(l.point_list) + jnp.sum(l.tile_starts)
                + jnp.sum(p.rgb)).astype(jnp.float32)

    timed("preprocess+binning", pre_bin, (means, scales, quats))

    def pre_bin_align(means, scales, quats):
        p = preprocess(means, scales, quats, cam, shs=shs, sh_degree=3,
                       tile_w=128, tile_h=8)
        l = build_tile_lists(p, grid_x, grid_y, 16)
        ap = build_aligned_pairs(l, n_tiles)
        return (jnp.sum(ap.src) + jnp.sum(ap.ids)
                + jnp.sum(p.rgb)).astype(jnp.float32)

    timed("preprocess+binning+aligned_pairs", pre_bin_align,
          (means, scales, quats))

    def pre_bin_align_stage(means, scales, quats):
        p = preprocess(means, scales, quats, cam, shs=shs, sh_degree=3,
                       tile_w=128, tile_h=8)
        l = build_tile_lists(p, grid_x, grid_y, 16)
        ap = build_aligned_pairs(l, n_tiles)
        op = jnp.where(p.visible, opac.reshape(-1), 0.0)
        channels = jnp.concatenate([p.rgb, lang, inst], axis=-1)
        C = channels.shape[1]
        pad_cols = jnp.zeros((P, ROWS - 6 - C), jnp.float32)
        payload = jnp.concatenate(
            [p.mean2d, p.conic, op.reshape(-1, 1), channels, pad_cols], axis=1)
        payload = jnp.concatenate(
            [payload, jnp.zeros((1, ROWS), payload.dtype)], axis=0)
        payload = jax.lax.optimization_barrier(payload)
        slot_splat = jnp.where(ap.ids < 0, P, ap.ids)
        aligned = jnp.take(payload, slot_splat, axis=0)
        aligned = jax.lax.optimization_barrier(aligned)
        pay_t = jax.lax.transpose(aligned, (1, 0))
        return jnp.sum(pay_t)

    timed("...+payload gather+transpose", pre_bin_align_stage,
          (means, scales, quats))

    fn, args = entry()
    timed("full forward", lambda *a: sum(jnp.sum(o) for o in fn(*a)), args)

    # fwd+bwd through a scalar loss
    def fwd_bwd(*a):
        def loss(ms, sc, qt, op_, sh_, lg, it):
            out = fn(ms, sc, qt, op_, sh_, lg, it)
            return sum(jnp.sum(o) for o in out)
        g = jax.grad(loss, argnums=(0, 1, 2, 3))(*a)
        return sum(jnp.sum(x) for x in g)

    timed("full fwd+bwd", fwd_bwd, args, n=10)


if __name__ == "__main__":
    main()
