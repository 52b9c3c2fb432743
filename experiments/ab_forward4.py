"""Round-4: pair cap alone on the V0 map + fwd+bwd with early-exit bwd."""
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
        print(f"{name:36s} {dt:7.2f} ms   ({1e3/dt:6.1f} fps)", flush=True)
    except Exception as e:
        print(f"{name:36s} FAILED {type(e).__name__} {str(e)[:90]}",
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

    cfg0 = RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16,
                        chunk=128, max_splats_per_tile=1024)
    cfg_cap = RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16,
                           max_pairs=1 << 20, chunk=128,
                           max_splats_per_tile=1024)

    timed("fwd V0 rows24", make_fwd(cfg0), args)
    timed("fwd V0 rows24 + cap 1M", make_fwd(cfg_cap), args)
    timed("fwd+bwd rows24 earlyexit", make_fwdbwd(cfg0), args, n=10)
    timed("fwd+bwd rows24 + cap 1M", make_fwdbwd(cfg_cap), args, n=10)


if __name__ == "__main__":
    main()
