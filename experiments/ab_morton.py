"""Does spatial (Morton) ordering of splat storage speed up the
pair-payload gather? The sorted pair list references splat rows in
(tile, depth) order; random storage order makes the [A,24] row gather
fully random-access, while Morton-ordered storage makes each tile's
segment reference near-contiguous rows."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, '/root/repo')
from __graft_entry__ import entry, _scene, _camera
from langscenex_tpu.ops.rasterize import rasterize, RasterConfig


def morton3(x, y, z, bits=10):
    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 32)) & np.uint64(0x1f00000000ffff)
        v = (v | (v << 16)) & np.uint64(0x1f0000ff0000ff)
        v = (v | (v << 8)) & np.uint64(0x100f00f00f00f00f)
        v = (v | (v << 4)) & np.uint64(0x10c30c30c30c30c3)
        v = (v | (v << 2)) & np.uint64(0x1249249249249249)
        return v
    return spread(x) | (spread(y) << np.uint64(1)) | (spread(z) << np.uint64(2))


def run(order):
    cam = _camera(720, 480)
    cfg = RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16,
                       chunk=128, max_splats_per_tile=1024)
    means, scales, quats, opac, shs, lang, inst = _scene(100_000)
    if order == "morton":
        q = ((means - means.min(0)) / (np.ptp(means, 0) + 1e-9) * 1023).astype(np.int64)
        idx = np.argsort(morton3(q[:, 0], q[:, 1], q[:, 2]))
        means, scales, quats, opac, shs, lang, inst = (
            a[idx] for a in (means, scales, quats, opac, shs, lang, inst))

    def fn(means, scales, quats, opac, shs, lang, inst):
        out = rasterize(means, scales, quats, opac, cam, jnp.zeros(3),
                        shs=shs, sh_degree=3, language_feature=lang,
                        instance_feature=inst, cfg=cfg)
        return out.color, out.language, out.instance, out.final_T

    args = tuple(map(jnp.asarray, (means, scales, quats, opac, shs, lang, inst)))
    n = 20

    def body(*a):
        def step(carry, _):
            out = fn(a[0] + carry * 1e-30, *a[1:])
            return jnp.sum(out[0]), None
        return jax.lax.scan(step, jnp.zeros(()), None, length=n)[0]

    jfn = jax.jit(body)
    float(jfn(*args))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(*args))
        dts.append((time.perf_counter() - t0) / n)
    print(f"{order:8s} {1.0/min(dts):6.2f} fps  ({min(dts)*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    run("random")
    run("morton")
