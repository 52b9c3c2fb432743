"""Post-two-tier-binning device battery (2026-08-18): forward and
fwd+bwd A/B across the staging knobs on the FIXED build — the earlier
sweep (tpu_battery.py) ran on the regressed gather-form binning, so its
presort/rank/cap conclusions are void. Also times the backward at the
exact recorded config (max_pairs=1M) to chase the 86.5 vs 52.1 ms gap.

Run:  cd /root/repo && timeout 590 python experiments/tpu_battery2.py [sec]
      sec in {fwd, bwd} — run one section per process to dodge the 600 s cap.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from langscenex_tpu.ops.rasterize import RasterConfig, rasterize
from __graft_entry__ import _camera, _scene

P = 100_000
BASE = dict(tile_w=128, tile_h=8, max_tiles_per_splat=16, chunk=128)


def main():
    sec = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    cam = _camera(720, 480)
    means, scales, quats, opac, shs, lang, inst = _scene(P)
    jargs = tuple(map(jnp.asarray,
                      (means, scales, quats, opac, shs, lang, inst)))

    if sec == "fwd":
        n = 20
        for tag, cfg in [
            ("base", RasterConfig(**BASE)),
            ("cap1.2M", RasterConfig(**BASE, max_pairs=1_200_000)),
            ("presort", RasterConfig(**BASE, depth_presort=True)),
            ("rank", RasterConfig(**BASE, depth_presort=True,
                                  payload_depth_rank=True)),
            ("rank+cap", RasterConfig(**BASE, depth_presort=True,
                                      payload_depth_rank=True,
                                      max_pairs=1_200_000)),
        ]:
            def f1(m, s2, q, o, sh, lg, it):
                out = rasterize(m, s2, q, o, cam, jnp.zeros(3), shs=sh,
                                sh_degree=3, language_feature=lg,
                                instance_feature=it, cfg=cfg)
                return out.color, out.language, out.instance, out.final_T

            def bd(*ar):
                def step(carry, _):
                    out = f1(ar[0] + carry * 1e-30, *ar[1:])
                    return jnp.sum(out[0]), None
                return jax.lax.scan(step, jnp.zeros(()), None, length=n)[0]
            g = jax.jit(bd)
            s = float(g(*jargs))
            ds = []
            for _ in range(3):
                t0 = time.perf_counter()
                s = float(g(*jargs))
                ds.append((time.perf_counter() - t0) / n)
            print(f"fwd {tag:9s}: {1.0/min(ds):6.2f} fps "
                  f"({min(ds)*1e3:.2f} ms)", flush=True)
    else:
        for tag, cfg in [
            ("cap1M", RasterConfig(**BASE, max_pairs=1_000_000)),
            ("rank+cap1M", RasterConfig(**BASE, depth_presort=True,
                                        payload_depth_rank=True,
                                        max_pairs=1_000_000)),
            ("noSH-cap1M", None),     # shs grad excluded, colors precomp
        ]:
            if tag == "noSH-cap1M":
                cfg = RasterConfig(**BASE, max_pairs=1_000_000)
                cols = jnp.ones((P, 3), jnp.float32) * 0.5

                def loss(m, s2, q, o):
                    out = rasterize(m, s2, q, o, cam, jnp.zeros(3),
                                    colors_precomp=cols, cfg=cfg)
                    return jnp.sum(out.color)
                gr = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
                args = jargs[:4]
            else:
                def loss(m, s2, q, o, sh):
                    out = rasterize(m, s2, q, o, cam, jnp.zeros(3), shs=sh,
                                    sh_degree=3, cfg=cfg)
                    return jnp.sum(out.color)
                gr = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
                args = jargs[:5]
            r = gr(*args)
            s = float(jnp.sum(r[0]))
            ds = []
            for _ in range(3):
                t0 = time.perf_counter()
                r = gr(*args)
                s = float(jnp.sum(r[0]))
                ds.append(time.perf_counter() - t0)
            print(f"fwd+bwd {tag:11s}: {min(ds)*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
