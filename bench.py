"""Benchmark: the three north-star metrics on one chip, ONE JSON line.

Primary record: 3DGS full-channel render FPS (100k splats, 720x480,
RGB+language+instance+geo channels). `extra_metrics` carries the other
two BASELINE.json metrics so the driver's machine-readable record covers
the full target surface (VERDICT r2 item 3):
  - dit_denoise_s_per_step_b2: the 5.57B TriMap DiT forward at the
    reference shape (13x30x45 latent tokens + 226 text), CFG batch B=2.
  - field_psnr_synthetic: a compressed field-construction run on a
    small learnable synthetic scene — real optimizer + kernels,
    held-out-view PSNR.

Baselines: the reference publishes no numbers (BASELINE.md).
  - Render: 100 FPS nominal for the reference CUDA rasterizer on A100 at
    the same scene scale. Derivation (no egress, so argued from the
    published literature rather than measured): Kerbl et al. 2023
    ("3D Gaussian Splatting for Real-Time Radiance Field Rendering",
    SIGGRAPH, Table 1) report ~134 fps average at 1080p on an RTX A6000
    for RGB-only 3DGS over Mip-NeRF360 scenes (1-6M splats). The
    diff-langsurf variant blends 16 channels instead of 3 (more blend
    math/bytes, identical binning), but this bench runs 720x480 (~1/6
    the pixels) with 100k splats (10-60x fewer) — those factors more
    than offset the channel count, so 100 fps is a conservative-to-fair
    A100 anchor; the true figure plausibly exceeds 150. The remaining
    gap analysis (XLA sort throughput + random-row gather issue rate vs
    GPU radix sort + gather hardware) is docs/KERNELS.md §12b.
  - DiT: 6.0 s/step, DERIVED (not community hearsay). FLOPs per CFG
    step at the reference shape (13x30x45 latent tokens + 226 text =
    17,776 tokens; CogVideoX-5b: L=42, d=3072, P=5.57e9):
      dense  = 2*P*T            = 2 * 5.57e9 * 17776   = 198 TFLOP
      attn   = 4*T^2*d*L        = 4*17776^2*3072*42    = 163 TFLOP
      B=2 (CFG) total           = 2*(198+163)          = 722 TFLOP/step
    A100 bf16 dense peak = 312 TFLOP/s. Achievable whole-model MFU for
    a torch/diffusers DiT with SDPA-flash at this length is ~35-50%
    (flash-attn2 reports ~50-70% on the attention alone on A100;
    dense GEMMs ~60-70%; launch/elementwise overhead pulls the whole
    step down) => 4.6-6.6 s/step band. Anchor = 6.0 (38.5% MFU,
    mid-band, and where public CogVideoX-5b "~5 min / 50 steps on
    A100" reports cluster). The reference's ACTUAL config is far
    slower still — sequential CPU offload (video_inference.py:28)
    pages 11 GB of weights over PCIe every step — so this anchor is
    optimistic for the reference by construction.
  - Field PSNR: 30 dB target on the compressed self-supervised scene
    (full 12k-iteration schedule measured 40.83 dB on device, PARITY.md;
    the compressed run is a regression detector, not a quality claim).
    The record additionally carries prev_value/delta_db vs the newest
    BENCH_r*.json so a quality regression cannot hide behind the
    ratio-to-floor (a 44.8->31 dB drop would still read 1.03x).

Timing fetches a scalar reduction every iteration: block_until_ready has
been observed to return before remote execution completes on the
tunneled axon backend, so only a data dependency gives trustworthy
timings.
"""
import json
import os
import time
import traceback

A100_NOMINAL_FPS = 100.0
A100_NOMINAL_DIT_S_PER_STEP = 6.0   # derived: 722 TFLOP/step / (312 TFLOP/s * 0.385 MFU)
FIELD_PSNR_TARGET = 30.0


def _prev_field_psnr():
    """Newest BENCH_r*.json field-PSNR value, for the regression delta."""
    import glob
    import re
    best = None
    for p in sorted(glob.glob(os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "BENCH_r*.json"))):
        try:
            with open(p) as f:
                rec = json.load(f)
            parsed = rec.get("parsed", rec)
            for m in parsed.get("extra_metrics", []):
                if re.match(r"field_psnr_synthetic", m.get("metric", "")) \
                        and m.get("value") is not None:
                    best = (p, float(m["value"]))
        except Exception:
            continue
    return best


def _tpu_reachable(timeout_s: float = 120.0) -> bool:
    """Probe the axon tunnel in a SUBPROCESS with a hard timeout.

    The relay has been observed to wedge (jax.devices() then hangs
    forever in make_c_api_client); probing in-process would hang this
    bench with it. A killed PROBE subprocess is safe — it never opens a
    data-plane transfer, only the connect."""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "assert d[0].platform != 'cpu'; print('ok')"],
            timeout=timeout_s, capture_output=True, text=True)
        return r.returncode == 0 and "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def bench_render(variant: str = "exact") -> float:
    """Render FPS via __graft_entry__.entry(), scan-chained.

    variant "exact" is the headline (k_overflowed=False, bit-exact lists
    on the adversarial bench cloud); "fast" is the labeled truncating
    config (entry() docstring / KERNELS.md §14)."""
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import entry

    fn, args = entry(variant)

    # Chain iterations through a scalar data dependency so the device
    # executes them sequentially with ONE final fetch: per-iteration
    # host fetches add ~25ms tunnel RTT each, and unfetched dispatches
    # have been observed to report phantom sub-ms times. Inputs are jit
    # ARGUMENTS, not closed-over constants — constants are embedded in
    # the remote-compile request (slow upload; HTTP 413 at larger sizes).
    n = 20

    def body(*a):
        def step(carry, _):
            out = fn(a[0] + carry * 1e-30, *a[1:])
            return jnp.sum(out[0]), None
        return jax.lax.scan(step, jnp.zeros(()), None, length=n)[0]

    jfn = jax.jit(body)
    float(jfn(*args))            # compile + warm
    dts = []
    for _ in range(3):           # min over reps: tunnel fetch jitter is
        t0 = time.perf_counter()  # one-sided noise on top of device time
        float(jfn(*args))
        dts.append((time.perf_counter() - t0) / n)
    return 1.0 / min(dts)


def bench_dit(platform: str) -> float:
    """5.57B DiT denoise forward, B=2 (CFG batch), s/step.

    Zero bf16 params via eval_shape (timing-equivalent — the MXU does
    not skip zeros — and avoids a 5.57B single-core host init). Skipped
    on the CPU fallback: a 5.57B 18k-token forward takes tens of minutes
    per step there and measures nothing about the target hardware."""
    if platform != "tpu":
        raise RuntimeError("cpu fallback: DiT step not representative")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from langscenex_tpu.models.cogvideox.transformer import (
        CogVideoXTransformer, TransformerConfig)

    cfg = TransformerConfig()
    model = CogVideoXTransformer(cfg)
    B, F, C, Hl, Wl, TXT = 2, 13, 16, 60, 90, 226
    lat_s = jax.ShapeDtypeStruct((1, F, 2 * C, Hl, Wl), jnp.bfloat16)
    txt_s = jax.ShapeDtypeStruct((1, TXT, cfg.text_embed_dim), jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda l, x: model.init(jax.random.PRNGKey(0), l, x,
                                jnp.zeros((1,), jnp.int32)), lat_s, txt_s)
    dev = jax.devices()[0]
    params = jax.tree_util.tree_map(
        lambda s: jax.device_put(jnp.zeros(s.shape, jnp.bfloat16), dev),
        shapes)

    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(B, F, 2 * C, Hl, Wl)), jnp.bfloat16)
    txt = jnp.asarray(rng.normal(size=(B, TXT, cfg.text_embed_dim)),
                      jnp.bfloat16)
    t = jnp.full((B,), 500, jnp.int32)
    n = 2

    def body(p, l, x, tt):
        def step(carry, _):
            out = model.apply(p, l + carry.astype(jnp.bfloat16) * 0, x, tt)
            return jnp.sum(out[:, 0, 0, 0, 0]).astype(jnp.float32), None
        return jax.lax.scan(step, jnp.zeros((), jnp.float32),
                            None, length=n)[0]

    jfn = jax.jit(body)
    float(jfn(params, lat, txt, t))
    t0 = time.perf_counter()
    float(jfn(params, lat, txt, t))
    return (time.perf_counter() - t0) / n


def bench_field(platform: str) -> float:
    """Compressed field construction on a learnable synthetic scene:
    GT images are renders of a ground-truth splat set, the trainable
    field starts from a perturbed cloud, geometry phase only. Returns
    held-out-view PSNR after the (platform-scaled) schedule."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from langscenex_tpu.ops.rasterize import RasterConfig
    from langscenex_tpu.ops.transforms import focal2fov, fov2focal
    from langscenex_tpu.scene.cameras import Camera, rgb_to_gray
    from langscenex_tpu.scene.gaussians import create_from_points
    from langscenex_tpu.train.field import (GaussianFieldTrainer,
                                            phase_flags, render_view)
    from langscenex_tpu.utils.config import OptimizationConfig
    from __graft_entry__ import _camera

    W, H = (360, 240) if platform == "tpu" else (240, 160)
    iters = 150 if platform == "tpu" else 100   # PSNR saturates well
    #                 above the 30 dB target by ~100 iters on this scene
    P = 6000
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-1.5, 1.5, P), rng.uniform(-1, 1, P),
                    rng.uniform(3, 8, P)], -1).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (P, 3)).astype(np.float32)

    # GT splats: the standard point-cloud init (soft composites,
    # trivially fittable by a field started from a perturbed cloud)
    gt = create_from_points(pts, cols, max_sh_degree=0, capacity=P)
    fovx = 1.0
    fovy = focal2fov(fov2focal(fovx, W), H)
    rcfg = RasterConfig(tile_w=32, tile_h=32, max_tiles_per_splat=16,
                        chunk=128, max_splats_per_tile=1024)
    proxy = _camera(W, H, fovx)
    bg = jnp.zeros((3,), jnp.float32)

    cams = []
    for i in range(5):
        ang = (i - 2) * 0.08
        Rz = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                       [-np.sin(ang), 0, np.cos(ang)]])
        C = Rz @ np.array([0, 0, -4.0])
        Rw2c = Rz.T
        T = (-Rw2c @ C).astype(np.float32)
        c = Camera(uid=i, colmap_id=i, R=Rw2c.T.astype(np.float32), T=T,
                   fovx=fovx, fovy=fovy, width=W, height=H,
                   image_name=f"{i:04d}")
        out = render_view(gt, None, jnp.asarray(c.w2c, jnp.float32),
                          proxy, bg, 0, False, False, None, rcfg)
        c.image = np.asarray(jnp.clip(out.color, 0, 1))
        c.image_gray = rgb_to_gray(c.image)
        c.nearest_id = [(i + 1) % 5]
        cams.append(c)
    test_idx = 2
    train_idxs = [0, 1, 3, 4]

    # trainable field: perturbed GT cloud + noisy colors
    pts2 = pts + rng.normal(0, 0.02, pts.shape).astype(np.float32)
    cols2 = np.clip(cols + rng.normal(0, 0.2, cols.shape), 0, 1
                    ).astype(np.float32)
    splats = create_from_points(pts2, cols2, max_sh_degree=0,
                                capacity=1 << 13)
    tr = GaussianFieldTrainer(cams, splats, OptimizationConfig(),
                              scene_extent=3.0, sh_degree_max=0,
                              rcfg=rcfg)
    flags = phase_flags(1, tr.cfg)          # geometry phase
    step = tr._get_step(flags)
    key = jax.random.PRNGKey(0)
    state = tr.state
    for i in range(iters):
        batch = tr._camera_batch(train_idxs[i % len(train_idxs)], flags)
        state, _ = step(state, batch, key, sh_degree=0)
    tr.state = state

    out = tr._eval_render(test_idx, False, False)
    img = np.asarray(jnp.clip(out.color, 0, 1))
    mse = float(np.mean((img - cams[test_idx].image) ** 2))
    return -10.0 * np.log10(max(mse, 1e-10))


def main():
    platform = "tpu"
    if not _tpu_reachable():
        # honest degradation: report CPU numbers, clearly labeled, rather
        # than hanging forever on a wedged relay
        platform = "cpu"
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    extra = []

    def run(name, fn, unit, better, baseline):
        try:
            v = fn()
            rec = {"metric": name, "value": round(float(v), 3),
                   "unit": unit,
                   "vs_baseline": round(v / baseline if better == "high"
                                        else baseline / v, 3)}
        except Exception as e:  # fail-soft: one metric must not kill all
            rec = {"metric": name, "value": None, "unit": unit,
                   "vs_baseline": None,
                   "error": f"{type(e).__name__}: {e}"}
            traceback.print_exc()
        return rec

    fps_rec = run("3dgs_render_fps_100k_720x480", bench_render, "fps",
                  "high", A100_NOMINAL_FPS)
    fps_rec["exactness"] = ("exact (k_overflowed=False, rank-key + pallas "
                            "compaction + bitonic sort engine)")
    fast_rec = run("3dgs_render_fps_truncating_cfg",
                   lambda: bench_render("fast"), "fps", "high",
                   A100_NOMINAL_FPS)
    fast_rec["exactness"] = ("truncates big-splat tail on this "
                            "adversarial scene (28.7 dB vs exact)")
    extra.append(fast_rec)
    if os.environ.get("LSX_BENCH_RENDER_ONLY") != "1":
        extra.append(run("dit_denoise_s_per_step_b2",
                         lambda: bench_dit(platform), "s/step", "low",
                         A100_NOMINAL_DIT_S_PER_STEP))
        psnr_rec = run(f"field_psnr_synthetic_{platform}",
                       lambda: bench_field(platform), "dB", "high",
                       FIELD_PSNR_TARGET)
        prev = _prev_field_psnr()
        if prev is not None and psnr_rec.get("value") is not None:
            psnr_rec["prev_value"] = prev[1]
            psnr_rec["prev_source"] = os.path.basename(prev[0])
            psnr_rec["delta_db"] = round(psnr_rec["value"] - prev[1], 3)
        extra.append(psnr_rec)

    rec = dict(fps_rec)
    rec["extra_metrics"] = extra
    if platform != "tpu":
        rec["platform_fallback"] = "cpu (TPU tunnel unreachable)"
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
