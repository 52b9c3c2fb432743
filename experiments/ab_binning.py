"""Binning regression hunt (device): the run-length expansion rewrite
(b78f532) was never device-timed; post-landing the full forward measured
85 ms vs the 29.5 ms recorded pre-landing (experiments/tpu_battery.py,
2026-08-18). Time the builder stages in isolation + the old [P,K]
enumeration inline to find the hot stage.

Run:  cd /root/repo && timeout 590 python experiments/ab_binning.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from langscenex_tpu.ops.binning import (TileLists, _decode_tiles, _demand,
                                        _expand_runs, build_tile_lists)
from langscenex_tpu.ops.projection import preprocess
from __graft_entry__ import _camera, _scene

P = 100_000
TW, TH = 128, 8
K = 16


def chain(fn, n, *args):
    def body(*a):
        def step(carry, _):
            outs = fn(a[0] + carry * 1e-30, *a[1:])
            if not isinstance(outs, tuple):
                outs = (outs,)
            dep = sum(jnp.sum(o[:1].astype(jnp.float32)) if o.ndim
                      else o.astype(jnp.float32) for o in outs)
            return dep, None
        return jax.lax.scan(step, jnp.zeros(()), None, length=n)[0]
    jfn = jax.jit(body)
    s = float(jfn(*args))
    ds = []
    for _ in range(3):
        t0 = time.perf_counter()
        s = float(jfn(*args))
        ds.append((time.perf_counter() - t0) / n)
    return min(ds)


def main():
    cam = _camera(720, 480)
    means, scales, quats, opac, shs, lang, inst = _scene(P)
    jm = jnp.asarray(means)
    jsh = jnp.asarray(shs)
    rest = tuple(map(jnp.asarray, (scales, quats, opac)))
    gx = (720 + TW - 1) // TW
    gy = (480 + TH - 1) // TH
    n_tiles = gx * gy
    A = P * K

    def prep(m, s, q, o):
        return preprocess(m, s, q, cam, shs=jsh, sh_degree=3, opacity=o,
                          tile_w=TW, tile_h=TH)

    dt = chain(lambda m: prep(m, *rest).depth, 20, jm)
    print(f"preprocess only          : {dt*1e3:7.2f} ms", flush=True)

    # full new-form builder
    def full_new(m):
        tl = build_tile_lists(prep(m, *rest), gx, gy,
                              max_tiles_per_splat=K)
        return tl.point_list, tl.tile_starts, tl.tile_counts
    dt = chain(full_new, 20, jm)
    print(f"preprocess+build (new)   : {dt*1e3:7.2f} ms", flush=True)

    # stage: expansion alone
    def expand_only(m):
        proc = prep(m, *rest)
        tt = jax.lax.stop_gradient(proc.tiles_touched)
        sid, k_in, valid = _expand_runs(tt, A)
        return sid, k_in, valid.astype(jnp.int32)
    dt = chain(expand_only, 20, jm)
    print(f"preprocess+expand        : {dt*1e3:7.2f} ms", flush=True)

    # stage: expansion + decode (no sort)
    def decode_only(m):
        proc = prep(m, *rest)
        tt = jax.lax.stop_gradient(proc.tiles_touched)
        sid, k_in, valid = _expand_runs(tt, A)
        key_tile = _decode_tiles(proc, sid, k_in, valid, gx, n_tiles)
        return (key_tile,)
    dt = chain(decode_only, 20, jm)
    print(f"preprocess+expand+decode : {dt*1e3:7.2f} ms", flush=True)

    # stage: + depth gather + 2-key sort (i.e. everything but ranges)
    def sort_too(m):
        proc = prep(m, *rest)
        tt = jax.lax.stop_gradient(proc.tiles_touched)
        sid, k_in, valid = _expand_runs(tt, A)
        key_tile = _decode_tiles(proc, sid, k_in, valid, gx, n_tiles)
        key_depth = jax.lax.stop_gradient(proc.depth)[sid]
        st, _, pl = jax.lax.sort((key_tile, key_depth, sid), num_keys=2)
        return st, pl
    dt = chain(sort_too, 20, jm)
    print(f"preprocess+..+sort       : {dt*1e3:7.2f} ms", flush=True)

    # old [P,K] enumeration inline (pre-b78f532 form)
    def full_old(m):
        proc = prep(m, *rest)
        rect_w = jnp.maximum(proc.rect_max[:, 0] - proc.rect_min[:, 0], 1)
        k = jnp.arange(K, dtype=jnp.int32)
        kx = k[None, :] % rect_w[:, None]
        ky = k[None, :] // rect_w[:, None]
        tile_x = proc.rect_min[:, 0:1] + kx
        tile_y = proc.rect_min[:, 1:2] + ky
        valid = ((k[None, :] < proc.tiles_touched[:, None])
                 & proc.visible[:, None])
        tile_id = tile_y * gx + tile_x
        key_tile = jnp.where(valid, tile_id, n_tiles
                             ).reshape(-1).astype(jnp.int32)
        key_depth = jnp.broadcast_to(proc.depth[:, None], (P, K)).reshape(-1)
        splat_id = jnp.broadcast_to(
            jnp.arange(P, dtype=jnp.int32)[:, None], (P, K)).reshape(-1)
        key_tile = jax.lax.stop_gradient(key_tile)
        key_depth = jax.lax.stop_gradient(key_depth)
        st, _, pl = jax.lax.sort((key_tile, key_depth, splat_id), num_keys=2)
        ts = jnp.searchsorted(st, jnp.arange(n_tiles, dtype=jnp.int32),
                              side='left').astype(jnp.int32)
        te = jnp.searchsorted(st, jnp.arange(n_tiles, dtype=jnp.int32),
                              side='right').astype(jnp.int32)
        return pl, ts, te - ts
    dt = chain(full_old, 20, jm)
    print(f"preprocess+build (OLD)   : {dt*1e3:7.2f} ms", flush=True)

    # scatter-free expansion variant: owner via sort-based searchsorted
    def expand_sortfree(m):
        proc = prep(m, *rest)
        tt = jax.lax.stop_gradient(proc.tiles_touched)
        offsets = jnp.cumsum(tt) - tt
        cum_incl = offsets + tt
        # owner[a] = #splats with cum_incl <= a  == searchsorted right
        # via one stable sort of (keys, tags): splat boundaries tagged 1,
        # slots tagged 0; running sum of tags at slot positions = owner.
        ar = jnp.arange(A, dtype=jnp.int32)
        keys = jnp.concatenate([cum_incl.astype(jnp.int32), ar])
        tags = jnp.concatenate([jnp.ones((P,), jnp.int32),
                                jnp.zeros((A,), jnp.int32)])
        sk, stags = jax.lax.sort((keys, tags), num_keys=1, is_stable=True)
        run = jnp.cumsum(stags)
        owner_at_slot = jnp.where(stags == 0, run, -1)
        # slots appear in ascending order among tag==0 entries; compact:
        owner = jnp.sort(jnp.where(stags == 0, run, 2 ** 30))[:A]
        k_in = ar - offsets[jnp.clip(owner, 0, P - 1)]
        return owner, k_in
    dt = chain(expand_sortfree, 20, jm)
    print(f"preprocess+expand(sortfr): {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
