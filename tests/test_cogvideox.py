import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langscenex_tpu.models.cogvideox.transformer import (
    CogVideoXTransformer, TransformerConfig, rope_3d, apply_rope,
    sinusoidal_timestep)
from langscenex_tpu.models.cogvideox.scheduler import (
    DDIMScheduler, DPMSolverScheduler, SchedulerConfig, _alphas_cumprod)
from langscenex_tpu.models.cogvideox.pipeline import (
    PipelineConfig, prepare_interpolation_latents, denoise_loop,
    InterpolationPipeline)

TINY = TransformerConfig(num_layers=2, num_heads=4, head_dim=16,
                         in_channels=8, out_channels=4, patch_size=2,
                         text_embed_dim=16, time_embed_dim=32,
                         attn_dtype=jnp.float32)


class TestTransformer:
    def _model_and_params(self, key=0):
        model = CogVideoXTransformer(TINY)
        lat = jnp.zeros((1, 3, 8, 8, 12))      # [B,F,C,H,W]
        txt = jnp.zeros((1, 5, 16))
        t = jnp.zeros((1,), jnp.int32)
        params = model.init(jax.random.PRNGKey(key), lat, txt, t)
        return model, params

    def test_shapes(self):
        model, params = self._model_and_params()
        rng = np.random.default_rng(0)
        lat = jnp.asarray(rng.normal(size=(2, 3, 8, 8, 12)).astype(np.float32))
        txt = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
        t = jnp.array([10, 500], jnp.int32)
        out = model.apply(params, lat, txt, t)
        assert out.shape == (2, 3, 4, 8, 12)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_fused_qkv_matches_separate(self):
        """fuse_qkv=True with per-head-interleaved weights must equal the
        separate to_q/to_k/to_v model to float tolerance (same math, one
        matmul)."""
        import dataclasses
        cfg_sep = dataclasses.replace(TINY, fuse_qkv=False)
        cfg_fused = dataclasses.replace(TINY, fuse_qkv=True)
        m_sep = CogVideoXTransformer(cfg_sep)
        m_fused = CogVideoXTransformer(cfg_fused)
        rng = np.random.default_rng(7)
        lat = jnp.asarray(rng.normal(size=(1, 3, 8, 8, 12)).astype(np.float32))
        txt = jnp.asarray(rng.normal(size=(1, 5, 16)).astype(np.float32))
        t = jnp.array([250], jnp.int32)
        params = m_sep.init(jax.random.PRNGKey(3), lat, txt, t)

        def interleave(attn):
            nh, hd = cfg_sep.num_heads, cfg_sep.head_dim
            ws = [np.asarray(attn[p]["kernel"]) for p in
                  ("to_q", "to_k", "to_v")]
            bs = [np.asarray(attn[p]["bias"]) for p in
                  ("to_q", "to_k", "to_v")]
            h_in = ws[0].shape[0]
            k3 = np.stack([w.reshape(h_in, nh, hd) for w in ws],
                          axis=2).reshape(h_in, nh * 3 * hd)
            b3 = np.stack([b.reshape(nh, hd) for b in bs],
                          axis=1).reshape(nh * 3 * hd)
            out = {k: v for k, v in attn.items()
                   if k not in ("to_q", "to_k", "to_v")}
            out["to_qkv"] = {"kernel": jnp.asarray(k3),
                             "bias": jnp.asarray(b3)}
            return out

        p2 = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy ok
        import flax
        p2 = flax.core.unfreeze(p2) if hasattr(flax.core, "unfreeze") else p2
        for i in range(cfg_sep.num_layers):
            blk = dict(p2["params"][f"block_{i}"])
            blk["attn"] = interleave(dict(blk["attn"]))
            p2["params"][f"block_{i}"] = blk

        o1 = m_sep.apply(params, lat, txt, t)
        o2 = m_fused.apply(p2, lat, txt, t)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=2e-5, atol=2e-5)

    def test_timestep_conditioning_changes_output(self):
        model, params = self._model_and_params()
        rng = np.random.default_rng(1)
        lat = jnp.asarray(rng.normal(size=(1, 3, 8, 8, 12)).astype(np.float32))
        txt = jnp.asarray(rng.normal(size=(1, 5, 16)).astype(np.float32))
        o1 = model.apply(params, lat, txt, jnp.array([10], jnp.int32))
        o2 = model.apply(params, lat, txt, jnp.array([900], jnp.int32))
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_jittable(self):
        model, params = self._model_and_params()
        f = jax.jit(lambda p, l, x, t: model.apply(p, l, x, t))
        lat = jnp.zeros((1, 3, 8, 8, 12))
        out = f(params, lat, jnp.zeros((1, 5, 16)), jnp.zeros((1,), jnp.int32))
        assert out.shape == (1, 3, 4, 8, 12)

    def test_rope_properties(self):
        cos, sin = rope_3d(TINY, 3, 4, 6)
        assert cos.shape == (72, TINY.head_dim // 2)
        # rotation preserves vector norm
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(1, 2, 72, TINY.head_dim)).astype(np.float32))
        rx = apply_rope(x, cos, sin)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(rx), axis=-1),
                                   np.linalg.norm(np.asarray(x), axis=-1),
                                   rtol=1e-5)
        # position 0 is identity
        np.testing.assert_allclose(np.asarray(rx[:, :, 0]),
                                   np.asarray(x[:, :, 0]), atol=1e-6)

    def test_rope_fused_matches_interleaved(self):
        """apply_rope_fused over the joint [text; video] sequence must
        equal the reference interleaved rotation on video rows and the
        identity on text rows."""
        from langscenex_tpu.models.cogvideox.transformer import (
            rope_full_tables, apply_rope_fused)
        cos, sin = rope_3d(TINY, 3, 4, 6)
        Tt = 5
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(
            size=(2, 2, Tt + 72, TINY.head_dim)).astype(np.float32))
        cf, sf = rope_full_tables(cos, sin, text_len=Tt)
        fused = apply_rope_fused(x, cf, sf)
        ref_video = apply_rope(x[:, :, Tt:], cos, sin)
        np.testing.assert_allclose(np.asarray(fused[:, :, :Tt]),
                                   np.asarray(x[:, :, :Tt]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(fused[:, :, Tt:]),
                                   np.asarray(ref_video), rtol=1e-6,
                                   atol=1e-6)

    def test_sinusoidal(self):
        e = sinusoidal_timestep(jnp.array([0.0, 100.0]), 64)
        assert e.shape == (2, 64)
        np.testing.assert_allclose(np.asarray(e[0, :32]), 1.0, atol=1e-6)  # cos(0)
        np.testing.assert_allclose(np.asarray(e[0, 32:]), 0.0, atol=1e-6)  # sin(0)


class TestScheduler:
    def test_zero_snr_terminal(self):
        ac = _alphas_cumprod(SchedulerConfig())
        assert ac[-1] < 1e-8            # zero SNR at terminal step
        assert ac[0] > 0.99

    def test_trailing_timesteps(self):
        s = DDIMScheduler()
        ts = np.asarray(s.timesteps(50))
        assert ts[0] == 999 and len(ts) == 50
        assert np.all(np.diff(ts) < 0)

    def test_ddim_roundtrip_denoises(self):
        """With a perfect v-prediction oracle, DDIM recovers x0."""
        s = DDIMScheduler()
        rng = np.random.default_rng(3)
        x0 = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
        noise = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
        ts = s.timesteps(50)
        sample = s.add_noise(x0, noise, ts[0])

        def oracle_v(sample_t, t):
            # derive eps consistent with the fixed x0 at this sample
            a = s.alphas_cumprod[t]
            eps = (sample_t - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
            return jnp.sqrt(a) * eps - jnp.sqrt(1 - a) * x0

        for i in range(50):
            t = ts[i]
            t_prev = ts[i + 1] if i + 1 < 50 else jnp.asarray(-1)
            sample = s.step(oracle_v(sample, t), t, t_prev, sample)
        np.testing.assert_allclose(np.asarray(sample), np.asarray(x0),
                                   atol=1e-3)

    def test_velocity_identity(self):
        s = DDIMScheduler()
        rng = np.random.default_rng(4)
        x0 = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
        eps = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
        t = jnp.array([100, 700])
        xt = s.add_noise(x0, eps, t)
        v = s.get_velocity(x0, eps, t)
        # x0 = sqrt(a) x_t - sqrt(1-a) v
        a = np.asarray(s.alphas_cumprod)[np.asarray(t)][:, None]
        rec = np.sqrt(a) * np.asarray(xt) - np.sqrt(1 - a) * np.asarray(v)
        np.testing.assert_allclose(rec, np.asarray(x0), atol=1e-5)

    def test_dpm_runs(self):
        s = DPMSolverScheduler()
        rng = np.random.default_rng(5)
        sample = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
        state = s.init_state(sample.shape)
        ts = s.timesteps(10)
        for i in range(10):
            t = ts[i]
            t_prev = ts[i + 1] if i + 1 < 10 else jnp.asarray(-1)
            t_next = ts[i + 2] if i + 2 < 10 else jnp.asarray(-1)
            mo = jnp.zeros_like(sample)
            sample, state = s.step_dpm(state, mo, t, t_prev, t_next, sample)
        assert np.all(np.isfinite(np.asarray(sample)))


class TestPipeline:
    def test_prepare_latents(self):
        cfg = PipelineConfig(num_frames=9, height=32, width=48,
                             latent_channels=4)
        first = jnp.ones((1, 1, 4, 4, 6))
        last = 2 * jnp.ones((1, 1, 4, 4, 6))
        noise, img = prepare_interpolation_latents(
            jax.random.PRNGKey(0), first, last, cfg)
        assert img.shape == (1, 3, 4, 4, 6)
        np.testing.assert_array_equal(np.asarray(img[:, 0]), 1.0)
        np.testing.assert_array_equal(np.asarray(img[:, 1]), 0.0)
        np.testing.assert_array_equal(np.asarray(img[:, -1]), 2.0)
        assert noise.shape == img.shape

    def test_full_pipeline_tiny(self):
        """End-to-end with a tiny DiT and identity VAE stubs."""
        cfg = PipelineConfig(num_frames=9, height=16, width=24,
                             num_inference_steps=4, latent_channels=4,
                             vae_scale_factor_spatial=2,
                             vae_scale_factor_temporal=4,
                             vae_scaling_factor=1.0)
        tcfg = TransformerConfig(num_layers=1, num_heads=2, head_dim=16,
                                 in_channels=8, out_channels=4, patch_size=2,
                                 text_embed_dim=8, time_embed_dim=16,
                                 attn_dtype=jnp.float32)
        model = CogVideoXTransformer(tcfg)
        lat0 = jnp.zeros((2, 3, 8, 8, 12))
        txt0 = jnp.zeros((2, 3, 8))
        params = model.init(jax.random.PRNGKey(0), lat0, txt0,
                            jnp.zeros((2,), jnp.int32))

        def denoiser(x, text, t):
            return model.apply(params, x, text, t)

        vae_encode = lambda imgs: jnp.mean(
            imgs.reshape(imgs.shape[0], imgs.shape[1], 3, 8, 2, 12, 2),
            axis=(-3, -1))[:, :, :3].repeat(2, axis=2)[:, :, :4]
        vae_decode = lambda lat: lat

        pipe = InterpolationPipeline(denoiser, vae_encode, vae_decode,
                                     DDIMScheduler(), cfg)
        rng = np.random.default_rng(6)
        first = jnp.asarray(rng.uniform(-1, 1, (1, 3, 16, 24)).astype(np.float32))
        last = jnp.asarray(rng.uniform(-1, 1, (1, 3, 16, 24)).astype(np.float32))
        out = pipe(jax.random.PRNGKey(1), first, last,
                   jnp.zeros((1, 3, 8)), jnp.zeros((1, 3, 8)))
        assert out.shape == (1, 3, 4, 8, 12)
        assert np.all(np.isfinite(np.asarray(out)))


    def test_denoise_loop_bf16_denoiser(self):
        """Full-scale path regression: a bf16-emitting denoiser must not
        break the lax.cond against the f32 broadcast cache (the dtype
        mismatch only ever manifested at reference scale on device)."""
        from langscenex_tpu.models.cogvideox.pipeline import denoise_loop
        cfg = PipelineConfig(num_frames=9, height=16, width=24,
                             num_inference_steps=4, latent_channels=4,
                             vae_scale_factor_spatial=2,
                             vae_scale_factor_temporal=4,
                             vae_scaling_factor=1.0)
        rng = np.random.default_rng(3)
        noise = jnp.asarray(rng.normal(size=(1, 3, 4, 8, 12)),
                            jnp.float32)
        img_lat = jnp.asarray(rng.normal(size=(1, 3, 4, 8, 12)),
                              jnp.float32)
        denoiser = lambda x, text, t: (
            x[:, :, :4] * jnp.bfloat16(0.5)).astype(jnp.bfloat16)
        out = jax.jit(lambda n, i: denoise_loop(
            denoiser, n, i, jnp.zeros((1, 3, 8)), jnp.zeros((1, 3, 8)),
            DDIMScheduler(), cfg))(noise, img_lat)
        assert out.dtype == noise.dtype
        assert np.all(np.isfinite(np.asarray(out)))


    def test_chunked_loop_matches_single_program(self):
        """loop_chunk splits the schedule across jitted segments (the
        full-scale tunnel-deadline path); must be bit-identical to the
        single-scan loop, including a non-divisible chunk (padded
        identity steps) and an active broadcast cache across chunk
        boundaries."""
        tcfg = TransformerConfig(num_layers=1, num_heads=2, head_dim=16,
                                 in_channels=8, out_channels=4, patch_size=2,
                                 text_embed_dim=8, time_embed_dim=16,
                                 attn_dtype=jnp.float32)
        model = CogVideoXTransformer(tcfg)
        lat0 = jnp.zeros((2, 3, 8, 8, 12))
        txt0 = jnp.zeros((2, 3, 8))
        params = model.init(jax.random.PRNGKey(0), lat0, txt0,
                            jnp.zeros((2,), jnp.int32))
        denoiser = lambda p, x, text, t: model.apply(p, x, text, t)
        vae_encode = lambda imgs: jnp.mean(
            imgs.reshape(imgs.shape[0], imgs.shape[1], 3, 8, 2, 12, 2),
            axis=(-3, -1))[:, :, :3].repeat(2, axis=2)[:, :, :4]
        vae_decode = lambda lat: lat
        rng = np.random.default_rng(9)
        first = jnp.asarray(rng.uniform(-1, 1, (1, 3, 16, 24)), jnp.float32)
        last = jnp.asarray(rng.uniform(-1, 1, (1, 3, 16, 24)), jnp.float32)
        tc = jnp.asarray(rng.normal(size=(1, 3, 8)), jnp.float32)
        tu = jnp.zeros((1, 3, 8))

        outs = {}
        for chunk in (0, 3):   # 7 steps / chunk 3 -> 3 segments, 2 padded
            cfg = PipelineConfig(num_frames=9, height=16, width=24,
                                 num_inference_steps=7, latent_channels=4,
                                 vae_scale_factor_spatial=2,
                                 vae_scale_factor_temporal=4,
                                 vae_scaling_factor=1.0,
                                 broadcast_interval=2, loop_chunk=chunk)
            pipe = InterpolationPipeline(denoiser, vae_encode, vae_decode,
                                         DDIMScheduler(), cfg,
                                         denoiser_params=params)
            outs[chunk] = np.asarray(pipe(jax.random.PRNGKey(5), first,
                                          last, tc, tu))
        np.testing.assert_array_equal(outs[0], outs[3])


class TestOutputBroadcast:
    """Training-free output broadcast (PipelineConfig.broadcast_interval)."""

    def _setup(self, n_steps, **kw):
        cfg = PipelineConfig(num_frames=9, height=16, width=24,
                             num_inference_steps=n_steps,
                             latent_channels=4,
                             vae_scale_factor_spatial=2,
                             vae_scale_factor_temporal=4,
                             vae_scaling_factor=1.0, **kw)
        rng = np.random.default_rng(0)
        noise = jnp.asarray(rng.normal(
            size=(1, 3, 4, 8, 12)).astype(np.float32))
        img_lat = jnp.asarray(rng.normal(
            size=(1, 3, 4, 8, 12)).astype(np.float32))
        tc = jnp.asarray(rng.normal(size=(1, 3, 8)).astype(np.float32))
        tu = jnp.zeros((1, 3, 8))
        return cfg, noise, img_lat, tc, tu

    def test_interval_one_is_identity(self):
        tcfg = TransformerConfig(num_layers=1, num_heads=2, head_dim=16,
                                 in_channels=8, out_channels=4, patch_size=2,
                                 text_embed_dim=8, time_embed_dim=16,
                                 attn_dtype=jnp.float32)
        model = CogVideoXTransformer(tcfg)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 8, 8, 12)),
                            jnp.zeros((2, 3, 8)), jnp.zeros((2,), jnp.int32))
        den = lambda x, text, t: model.apply(params, x, text, t)
        cfg0, noise, img, tc, tu = self._setup(6)
        cfg1, *_ = self._setup(6, broadcast_interval=1)
        base = denoise_loop(den, noise, img, tc, tu, DDIMScheduler(), cfg0)
        same = denoise_loop(den, noise, img, tc, tu, DDIMScheduler(), cfg1)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(same))

    def test_constant_model_broadcast_exact(self):
        # if the model output is constant in (x, t), reusing it is exact:
        # any interval must give bitwise the baseline trajectory
        const = jnp.asarray(np.random.default_rng(1).normal(
            size=(2, 3, 4, 8, 12)).astype(np.float32))
        den = lambda x, text, t: const
        cfg0, noise, img, tc, tu = self._setup(8)
        cfg2, *_ = self._setup(8, broadcast_interval=2,
                               broadcast_window=(0.25, 1.0))
        base = denoise_loop(den, noise, img, tc, tu, DDIMScheduler(), cfg0)
        fast = denoise_loop(den, noise, img, tc, tu, DDIMScheduler(), cfg2)
        np.testing.assert_allclose(np.asarray(base), np.asarray(fast),
                                   atol=1e-6)

    def test_eval_count_reduced(self):
        # count actual DiT evaluations through an ordered host callback:
        # lax.cond must skip the callback on broadcast steps
        import jax.experimental

        count = [0]

        def bump(_):
            count[0] += 1
            return np.zeros((), np.float32)

        def den(x, text, t):
            tap = jax.experimental.io_callback(
                bump, jax.ShapeDtypeStruct((), jnp.float32), t, ordered=True)
            return jnp.zeros((2, 3, 4, 8, 12)) + tap

        cfg, noise, img, tc, tu = self._setup(
            10, broadcast_interval=2, broadcast_window=(0.2, 0.9))
        out = denoise_loop(den, noise, img, tc, tu, DDIMScheduler(), cfg)
        jax.block_until_ready(out)
        # steps 0,1 head + 2,4,6,8 window-evals + 9 tail = 7 of 10
        assert count[0] == 7
        assert np.all(np.isfinite(np.asarray(out)))


class TestLayerNormZeroStreams:
    """Pin the adaLN chunk ordering (ADVICE r2). Diffusers'
    CogVideoXLayerNormZero emits [shift, scale, gate, t_shift, t_scale,
    t_gate] — VIDEO modulation first, TEXT second — while the joint
    residual stream is laid out [text; video]. A swapped slice passes
    every shape/jit test; these tests pin the semantics by forcing the
    adaLN linear to constants and checking which rows receive which
    chunk (cf. diffusers cogvideox_transformer_3d norm1/norm2 usage)."""

    def _force_linear(self, params, path, hidden, chunks):
        lin = params["params"]
        for k in path:
            lin = lin[k]
        lin["kernel"] = jnp.zeros_like(lin["kernel"])
        lin["bias"] = jnp.concatenate(
            [jnp.full((hidden,), v, jnp.float32) for v in chunks])
        return params

    def test_chunk_ordering(self):
        from langscenex_tpu.models.cogvideox.transformer import LayerNormZero
        hidden, Tt = 8, 3
        m = LayerNormZero(hidden, Tt)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 7, hidden)), jnp.float32)
        temb = jnp.asarray(rng.normal(size=(2, 16)), jnp.float32)
        params = jax.tree_util.tree_map(
            lambda a: a, m.init(jax.random.PRNGKey(0), x, temb))
        # shift=10, scale=0, gate=2, t_shift=20, t_scale=0, t_gate=3
        params = self._force_linear(params, ("linear",), hidden,
                                    (10.0, 0.0, 2.0, 20.0, 0.0, 3.0))
        out, g, tg = m.apply(params, x, temb)
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        ln = (x - mu) / jnp.sqrt(var + 1e-5)
        # text prefix rows take t_shift/t_scale; video suffix shift/scale
        np.testing.assert_allclose(np.asarray(out[:, :Tt]),
                                   np.asarray(ln[:, :Tt]) + 20.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[:, Tt:]),
                                   np.asarray(ln[:, Tt:]) + 10.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g), 2.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(tg), 3.0, atol=1e-6)

    def test_block_gate_routing(self):
        from langscenex_tpu.models.cogvideox.transformer import Block
        cfg, Tt = TINY, 5
        hidden = cfg.num_heads * cfg.head_dim
        block = Block(cfg, Tt)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, Tt + 12, hidden)), jnp.float32)
        temb = jnp.asarray(rng.normal(size=(1, cfg.time_embed_dim)),
                           jnp.float32)
        params = block.init(jax.random.PRNGKey(0), x, temb, None)
        # video gate = 1, text gate = 0: text rows must pass through the
        # block COMPLETELY unchanged (both residual adds gated off)
        for norm in ("norm1", "norm2"):
            params = self._force_linear(
                params, (norm, "linear"), hidden,
                (0.0, 0.0, 1.0, 0.0, 0.0, 0.0))
        out = block.apply(params, x, temb, None)
        np.testing.assert_array_equal(np.asarray(out[:, :Tt]),
                                      np.asarray(x[:, :Tt]))
        assert not np.allclose(np.asarray(out[:, Tt:]),
                               np.asarray(x[:, Tt:]))
