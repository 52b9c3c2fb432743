"""E2E probe: is the payload row-gather byte-bound?

V1 packs the 16 channel rows as 8 bf16-pair rows (f32 bitcast), so the
random row-gather reads 14 live rows x 4B = 64B/slot instead of 96B; the
packed rows are unpacked to the kernel's [A/128, 24, 128] f32 layout
AFTER the gather (one extra streaming pass, no kernel change). Forward
only — bitcast has no VJP; if this wins end-to-end, the unpack moves into
the kernel (split DMA) as a follow-up. See KERNELS.md §6 for why only
end-to-end timings count here."""
import time

import jax
import jax.numpy as jnp

from __graft_entry__ import _camera, _scene
from langscenex_tpu.ops import rasterize_pallas as rp
from langscenex_tpu.ops.rasterize import rasterize, RasterConfig


def timed(name, make_out, args, n=30):
    def body(*a):
        def step(carry, _):
            out = make_out(a[0] + carry * 1e-30, *a[1:])
            return jnp.sum(out[0]).astype(jnp.float32), None
        return jax.lax.scan(step, jnp.zeros(()), None, length=n)[0]
    jfn = jax.jit(body)
    float(jfn(*args))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(*args))
        dt = (time.perf_counter() - t0) / n * 1e3
        best = dt if best is None else min(best, dt)
    print(f"{name:34s} {best:7.2f} ms   ({1e3/best:6.1f} fps)", flush=True)


def packed_blend(lists, mean2d, conic, opacity, channels, grid_x, grid_y,
                 cfg, mean2d_abs_hook=None):
    n_tiles = grid_x * grid_y
    P = mean2d.shape[0]
    C = channels.shape[1]
    assert C <= 16
    ap = rp.build_aligned_pairs(lists, n_tiles)

    # rows 0-5 geom f32; rows 6-13 = 16 bf16 channels packed pairwise into
    # f32 carriers; rows 14-15 pad (gather table [P+1, 16])
    chan16 = jnp.concatenate(
        [channels, jnp.zeros((P, 16 - C), channels.dtype)], axis=1)
    packed = jax.lax.bitcast_convert_type(
        chan16.astype(jnp.bfloat16).reshape(P, 8, 2), jnp.float32)
    payload = jnp.concatenate(
        [mean2d, conic, opacity.reshape(-1, 1), packed,
         jnp.zeros((P, 2), jnp.float32)], axis=1)
    payload = jnp.concatenate(
        [payload, jnp.zeros((1, 16), payload.dtype)], axis=0)
    payload = jax.lax.optimization_barrier(payload)
    slot_splat = jnp.where(ap.ids < 0, P, ap.ids)
    pay_rm = jnp.take(payload, slot_splat, axis=0)             # [A, 16]
    pay_rm = jax.lax.optimization_barrier(pay_rm)
    p3 = pay_rm.reshape(-1, 128, 16).transpose(0, 2, 1)        # [A/128,16,128]
    geom = p3[:, :6]
    chan = jax.lax.bitcast_convert_type(
        p3[:, 6:14], jnp.bfloat16)                             # [.,8,128,2]
    chan = chan.transpose(0, 1, 3, 2).reshape(-1, 16, 128).astype(jnp.float32)
    pay3 = jnp.concatenate(
        [geom, chan, jnp.zeros((geom.shape[0], 2, 128), jnp.float32)], axis=1)

    A = ap.src.shape[0]
    hook = jnp.zeros((A, 2), jnp.float32)
    img, obs = rp.blend_pairs(pay3, hook, ap.starts, ap.counts,
                              grid_x, n_tiles)
    accum = img[:, :C, :]
    T = img[:, 16, :]
    obs_flat = jax.lax.stop_gradient(obs).reshape(-1)
    obs_idx = jnp.where(ap.ids < 0, P, ap.ids)
    observe = jnp.zeros((P,), jnp.int32).at[obs_idx].add(
        obs_flat.astype(jnp.int32), mode='drop')
    return accum, T, observe


def main():
    P = 100_000
    cam = _camera(720, 480)
    means, scales, quats, opac, shs, lang, inst = map(jnp.asarray, _scene(P))
    args = (means, scales, quats, opac, shs, lang, inst)
    cfg = RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16,
                       chunk=128, max_splats_per_tile=1024)

    def fwd(means, scales, quats, opac, shs, lang, inst):
        out = rasterize(means, scales, quats, opac, cam, jnp.zeros(3),
                        shs=shs, sh_degree=3, language_feature=lang,
                        instance_feature=inst, cfg=cfg)
        return out.color, out.final_T

    timed("V0 baseline", fwd, args)

    c0, t0 = jax.jit(fwd)(*args)

    import langscenex_tpu.ops.rasterize as rz
    orig = rp.blend_tiles_pallas
    rp.blend_tiles_pallas = packed_blend
    rz.blend_tiles_pallas = packed_blend
    try:
        timed("V1 packed-bf16 channel gather", fwd, args)
        c1, t1 = jax.jit(fwd)(*args)
        dc = float(jnp.max(jnp.abs(c1 - c0)))
        dt_ = float(jnp.max(jnp.abs(t1 - t0)))
        print(f"max|dcolor|={dc:.3e}  max|dT|={dt_:.3e}", flush=True)
    finally:
        rp.blend_tiles_pallas = orig
        rz.blend_tiles_pallas = orig


if __name__ == "__main__":
    main()
