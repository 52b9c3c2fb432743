"""On-device sanity: Pallas blend vs XLA reference path at bench scale."""
import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _camera, _scene
from langscenex_tpu.ops.rasterize import rasterize, RasterConfig

means, scales, quats, opac, shs, lang, inst = map(jnp.asarray, _scene(20_000))
cam = _camera(720, 480)
base = dict(tile_w=128, tile_h=8, max_tiles_per_splat=16, chunk=128,
            max_splats_per_tile=4096)

outs = {}
for name, use in (("pallas", True), ("xla", False)):
    cfg = RasterConfig(use_pallas=use, **base)
    o = jax.jit(lambda: rasterize(
        means, scales, quats, opac, cam, jnp.zeros(3), shs=shs, sh_degree=3,
        language_feature=lang, instance_feature=inst, cfg=cfg))()
    outs[name] = (np.asarray(o.color), np.asarray(o.final_T),
                  np.asarray(o.language))
for i, what in enumerate(("color", "final_T", "language")):
    d = np.max(np.abs(outs["pallas"][i] - outs["xla"][i]))
    print(f"{what}: max |pallas - xla| = {d:.3e}", flush=True)
    assert d < 5e-3, what
# grad check through opacity on device (smaller scene: the XLA scan's
# grad residuals are [n_chunks, n_tiles, chunk, npx] — 38G at 4096/tile)
means2, scales2, quats2, opac2, shs2, lang2, inst2 = map(
    jnp.asarray, _scene(5_000, seed=1))
gbase = dict(base, max_splats_per_tile=1024)
for name, use in (("pallas", True), ("xla", False)):
    cfg = RasterConfig(use_pallas=use, **gbase)
    g = jax.jit(jax.grad(lambda op: jnp.sum(rasterize(
        means2, scales2, quats2, op, cam, jnp.zeros(3), shs=shs2,
        sh_degree=3, language_feature=lang2, instance_feature=inst2,
        cfg=cfg).color)))(opac2)
    outs[name + "_g"] = np.asarray(g)
dg = np.max(np.abs(outs["pallas_g"] - outs["xla_g"]))
rel = dg / max(np.max(np.abs(outs["xla_g"])), 1e-9)
print(f"d(color)/d(opacity): max abs diff {dg:.3e} (rel {rel:.2e})", flush=True)
assert rel < 1e-2
print("TPU CHECK PASS", flush=True)
