"""Round-2e device battery, ONE process (client churn risks the relay).

Order: attention nt A/B -> render A/Bs (depth-rank coherence, cap
tightness, tile shape) -> rasterizer fwd+bwd. SKIP_ATTN=1 skips the
attention section (already measured).

Run:  timeout 3000 python experiments/tpu_battery3.py | tee /tmp/battery3.log
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

T0 = time.time()
SKIP_ATTN = bool(os.environ.get("SKIP_ATTN"))


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


def chain(fn, n, *args):
    def body(*a):
        def step(carry, _):
            out = fn(a[0] + carry.astype(a[0].dtype) * 0, *a[1:])
            outs = out if isinstance(out, tuple) else (out,)
            dep = sum(jnp.sum(o[..., 0, :] if o.ndim > 1 else o)
                      for o in outs)
            return dep.astype(jnp.float32), None
        return jax.lax.scan(step, jnp.zeros((), jnp.float32),
                            None, length=n)[0]
    jfn = jax.jit(body)
    float(jfn(*args))
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        float(jfn(*args))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


log("devices:", jax.devices())

import langscenex_tpu.ops.flash_attention as fa


def attention_section():
    B, H, T, D = 1, 48, 17776, 64
    PEAK = 197e12
    FLOPS_FWD = 4.0 * B * H * T * T * D
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.bfloat16)

    cases = [
        ("nomax (r2 best)", lambda q, k, v: fa.flash_attention(
            q, k, v, bounded_logits=True)),
        ("nt 1024x1024", lambda q, k, v: fa.flash_attention_nt(
            q, k, v, block_q=1024, block_k=1024)),
        ("nt 2048x1024", lambda q, k, v: fa.flash_attention_nt(
            q, k, v, block_q=2048, block_k=1024)),
        ("nt 1024x2048", lambda q, k, v: fa.flash_attention_nt(
            q, k, v, block_q=1024, block_k=2048)),
    ]
    for name, fn in cases:
        try:
            dt = chain(fn, 8, q, k, v)
            log(f"attn fwd {name:14s} {dt*1e3:7.2f} ms  "
                f"MFU {FLOPS_FWD/dt/PEAK*100:5.1f}%")
        except Exception as e:
            log(f"attn fwd {name:14s} FAILED {type(e).__name__}: "
                f"{str(e)[:160]}")

    a = fa.flash_attention(q, k, v, bounded_logits=True)
    b = fa.flash_attention_nt(q, k, v)
    log(f"nt vs nomax max abs diff: "
        f"{float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))):.2e}")
    del a, b

    FLOPS_BWD = 2.5 * FLOPS_FWD

    def loss(q, k, v):
        return jnp.sum(fa.flash_attention(
            q, k, v, bounded_logits=True).astype(jnp.float32) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))
    try:
        dt = chain(lambda q, k, v: g(q, k, v), 4, q, k, v)
        log(f"attn fwd+bwd (nt fwd) {dt*1e3:7.2f} ms  "
            f"MFU {(FLOPS_FWD+FLOPS_BWD)/dt/PEAK*100:5.1f}%")
    except Exception as e:
        log(f"attn fwd+bwd (nt fwd) FAILED {type(e).__name__}: "
            f"{str(e)[:160]}")


if not SKIP_ATTN:
    attention_section()
else:
    log("attention section skipped (SKIP_ATTN)")

# ---------------- 2. render A/Bs --------------------------------------
from __graft_entry__ import _camera, _scene
from langscenex_tpu.ops.rasterize import rasterize, RasterConfig

P = 100_000
cam = _camera(720, 480)
args = tuple(map(jnp.asarray, _scene(P)))
BASE = dict(max_tiles_per_splat=16, chunk=128, max_splats_per_tile=1024)


def render_case(name, cfg, n=20, grad=False):
    def fwd(m, s, q2, o, sh, lg, it):
        out = rasterize(m, s, q2, o, cam, jnp.zeros(3), shs=sh,
                        sh_degree=3, language_feature=lg,
                        instance_feature=it, cfg=cfg)
        return (out.color,)

    if grad:
        def f(m, s, q2, o, sh, lg, it):
            def L(m, s, q2, o, sh):
                out = rasterize(m, s, q2, o, cam, jnp.zeros(3), shs=sh,
                                sh_degree=3, language_feature=lg,
                                instance_feature=it, cfg=cfg)
                return (jnp.sum(out.color) + jnp.sum(out.language)
                        + jnp.sum(out.instance))
            return jax.grad(L, argnums=(0, 1, 2, 3, 4))(m, s, q2, o, sh)
        fn = f
    else:
        fn = fwd
    try:
        dt = chain(fn, n, *args)
        log(f"render {name:34s} {dt*1e3:7.2f} ms ({1e3/dt:6.1f}"
            f"{' fps' if not grad else ' it/s fwd+bwd'})")
        return dt
    except Exception as e:
        log(f"render {name:34s} FAILED {type(e).__name__}: {str(e)[:160]}")
        return None


# demand at this scene (measured, KERNELS.md s9): 484k @ 32x32 cull
for name, cfg in [
    ("32x32 cap640k (bench default)", RasterConfig(
        tile_w=32, tile_h=32, max_pairs=640_000, **BASE)),
    ("32x32 cap560k (1.15x demand)", RasterConfig(
        tile_w=32, tile_h=32, max_pairs=560_000, **BASE)),
    ("32x32 cap640k depth-rank", RasterConfig(
        tile_w=32, tile_h=32, max_pairs=640_000, depth_presort=True,
        payload_depth_rank=True, **BASE)),
    ("32x32 cap560k depth-rank", RasterConfig(
        tile_w=32, tile_h=32, max_pairs=560_000, depth_presort=True,
        payload_depth_rank=True, **BASE)),
    ("64x16 cap640k", RasterConfig(
        tile_w=64, tile_h=16, max_pairs=640_000, **BASE)),
    ("32x32 cap640k presort", RasterConfig(
        tile_w=32, tile_h=32, max_pairs=640_000, depth_presort=True,
        **BASE)),
]:
    render_case(name, cfg)

# gradient pass on the two leaders
for name, cfg in [
    ("32x32 cap640k (bench default)", RasterConfig(
        tile_w=32, tile_h=32, max_pairs=640_000, **BASE)),
    ("32x32 cap640k depth-rank", RasterConfig(
        tile_w=32, tile_h=32, max_pairs=640_000, depth_presort=True,
        payload_depth_rank=True, **BASE)),
]:
    render_case("grad " + name, cfg, n=8, grad=True)

log("battery3 done")
