"""Linear-domain vs log-domain transmittance recurrence A/B (real chip).

LINEAR_T replaces the blend's log-space prefix (log1p + roll/add cumsum +
exp for T_excl) with the CUDA loop's own multiplicative form
(forward.cu:335-430): a roll/mul cumprod and a running-min carry. Two
fewer transcendentals per (pair, pixel) in the forward, three in the
backward (exp(power) is reused for dop). This harness measures both modes
end-to-end at the shipped defaults and reports the numeric gap.
"""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _camera, _scene
import langscenex_tpu.ops.rasterize_pallas as rp
from langscenex_tpu.ops.rasterize import rasterize, RasterConfig


def timed(name, make_out, args, n=20):
    def body(*a):
        def step(carry, _):
            out = make_out(a[0] + carry * 1e-30, *a[1:])
            return jnp.sum(out[0]).astype(jnp.float32), None
        return jax.lax.scan(step, jnp.zeros(()), None, length=n)[0]
    jfn = jax.jit(body)
    float(jfn(*args))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(*args))
        dts.append((time.perf_counter() - t0) / n * 1e3)
    dt = min(dts)
    print(f"{name:44s} {dt:7.2f} ms   ({1e3/dt:6.1f} fps)", flush=True)


def main():
    P = 100_000
    cam = _camera(720, 480)
    means, scales, quats, opac, shs, lang, inst = map(jnp.asarray, _scene(P))
    args = (means, scales, quats, opac, shs, lang, inst)

    cfg = RasterConfig(max_tiles_per_splat=16, chunk=128,
                       max_splats_per_tile=1024)
    out = rasterize(means, scales, quats, opac, cam, jnp.zeros(3),
                    shs=shs, sh_degree=3, language_feature=lang,
                    instance_feature=inst, cfg=cfg)
    d = int(out.num_pairs)
    cap = ((int(d * 1.15) + 127) // 128) * 128
    print(f"demand {d} -> cap {cap}", flush=True)
    ccfg = dataclasses.replace(cfg, max_pairs=cap)

    def make_fwd(c):
        def fwd(means, scales, quats, opac, shs, lang, inst):
            o = rasterize(means, scales, quats, opac, cam, jnp.zeros(3),
                          shs=shs, sh_degree=3, language_feature=lang,
                          instance_feature=inst, cfg=c)
            return o.color, o.final_T
        return fwd

    def make_fwdbwd(c):
        fwd = make_fwd(c)

        def fb(*a):
            def loss(ms, sc, qt, op_, sh_, lg, it):
                col, T = fwd(ms, sc, qt, op_, sh_, lg, it)
                return jnp.sum(col) + jnp.sum(T)
            g = jax.grad(loss, argnums=(0, 1, 2, 3))(*a)
            return (sum(jnp.sum(x) for x in g),)
        return fb

    results = {}
    for mode in (False, True):
        rp.LINEAR_T = mode
        name = "linear" if mode else "log   "
        timed(f"fwd     {name} cap", make_fwd(ccfg), args)
        timed(f"fwd+bwd {name} cap", make_fwdbwd(ccfg), args, n=10)
        o = jax.jit(lambda *a: rasterize(
            a[0], a[1], a[2], a[3], cam, jnp.zeros(3), shs=a[4],
            sh_degree=3, language_feature=a[5], instance_feature=a[6],
            cfg=ccfg))(*args)
        results[mode] = (np.asarray(o.color), np.asarray(o.final_T))

    cdiff = np.abs(results[True][0] - results[False][0]).max()
    tdiff = np.abs(results[True][1] - results[False][1]).max()
    print(f"linear vs log: color max abs {cdiff:.2e}, "
          f"final_T max abs {tdiff:.2e}", flush=True)


if __name__ == "__main__":
    main()
