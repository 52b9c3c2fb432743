"""Post-recovery TPU battery, run as ONE process (no kills — a killed
client wedges the relay). Order: cheap sanity -> bench -> A/B -> train
sanity. Writes progress to stdout (tee'd to /tmp/tpu_battery.log)."""
import json, os, subprocess, sys, time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
T0 = time.time()
def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)

import jax, jax.numpy as jnp
import numpy as np
log("devices:", jax.devices())

# --- 1. SSIM precision on device (the round's key bug) ---------------
from langscenex_tpu.ops.losses import ssim
rng = np.random.default_rng(0)
a = jnp.asarray(rng.uniform(0,1,(3,480,720)).astype(np.float32))
b = jnp.asarray(rng.uniform(0,1,(3,480,720)).astype(np.float32))
f = jax.jit(ssim)
saa, sab = float(f(a,a)), float(f(a,b))
log(f"ssim(a,a)={saa:.5f} ssim(a,b)={sab:.5f}")
assert abs(saa-1.0) < 1e-3 and -1.0 <= sab <= 1.0, "SSIM STILL BROKEN ON TPU"

# --- 2. bench.py equivalent inline (new binning) ----------------------
from __graft_entry__ import entry
fn, args = entry()
n = 20
def body(*ar):
    def step(carry, _):
        out = fn(ar[0] + carry * 1e-30, *ar[1:])
        return jnp.sum(out[0]), None
    return jax.lax.scan(step, jnp.zeros(()), None, length=n)[0]
jfn = jax.jit(body)
s = float(jfn(*args)); dts = []
for _ in range(3):
    t0 = time.perf_counter(); s = float(jfn(*args))
    dts.append((time.perf_counter()-t0)/n)
fps = 1.0/min(dts)
log(f"bench fps (default cfg): {fps:.2f}")

# --- 3. forward A/B: depth_presort ------------------------------------
import dataclasses
from langscenex_tpu.ops.rasterize import rasterize, RasterConfig
from __graft_entry__ import _camera, _scene
P = 100_000
cam = _camera(720, 480)
means, scales, quats, opac, shs, lang, inst = _scene(P)
jargs = tuple(map(jnp.asarray, (means, scales, quats, opac, shs, lang, inst)))
for tag, cfg in [
    ("base",       RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16, chunk=128)),
    ("presort",    RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16, chunk=128, depth_presort=True)),
    ("presort+rank",RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16, chunk=128, depth_presort=True, payload_depth_rank=True)),
    ("presort+cap",RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16, chunk=128, depth_presort=True, max_pairs=1_200_000)),
    ("rank+cap",   RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16, chunk=128, depth_presort=True, payload_depth_rank=True, max_pairs=1_200_000)),
    ("cap",        RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16, chunk=128, max_pairs=1_200_000)),
]:
    def mk(cfg):
        def f1(m, s2, q, o, sh, lg, it):
            out = rasterize(m, s2, q, o, cam, jnp.zeros(3), shs=sh, sh_degree=3,
                            language_feature=lg, instance_feature=it, cfg=cfg)
            return out.color, out.language, out.instance, out.final_T
        def bd(*ar):
            def step(carry, _):
                out = f1(ar[0] + carry * 1e-30, *ar[1:])
                return jnp.sum(out[0]), None
            return jax.lax.scan(step, jnp.zeros(()), None, length=n)[0]
        return jax.jit(bd)
    g = mk(cfg)
    s = float(g(*jargs)); ds=[]
    for _ in range(3):
        t0=time.perf_counter(); s=float(g(*jargs)); ds.append((time.perf_counter()-t0)/n)
    log(f"fwd A/B {tag:12s}: {1.0/min(ds):6.2f} fps  ({min(ds)*1e3:.2f} ms)")

# --- 4. fwd+bwd A/B ----------------------------------------------------
for tag, cfg in [
    ("base",    RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16, chunk=128)),
    ("presort", RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16, chunk=128, depth_presort=True)),
    ("rank",    RasterConfig(tile_w=128, tile_h=8, max_tiles_per_splat=16, chunk=128, depth_presort=True, payload_depth_rank=True)),
]:
    def loss(m, s2, q, o, sh):
        out = rasterize(m, s2, q, o, cam, jnp.zeros(3), shs=sh, sh_degree=3, cfg=cfg)
        return jnp.sum(out.color)
    gr = jax.jit(jax.grad(loss, argnums=(0,1,2,3)))
    r = gr(*jargs[:5]); jax.block_until_ready(r); s=float(jnp.sum(r[0]))
    ds=[]
    for _ in range(3):
        t0=time.perf_counter()
        r = gr(*jargs[:5]); s=float(jnp.sum(r[0]))
        ds.append(time.perf_counter()-t0)
    log(f"fwd+bwd {tag:8s}: {min(ds)*1e3:.1f} ms")

log("BATTERY DONE")
