"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip():
    import sys
    sys.path.insert(0, '/root/repo')
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_dit_tensor_parallel():
    """DiT forward under a (data=2, model=4) mesh with the logical
    sharding rules: GSPMD must compile, run, and match the single-device
    result (TP is a numerics-preserving layout change)."""
    import jax.numpy as jnp
    from langscenex_tpu.parallel.mesh import make_mesh, dit_sharded_apply
    from langscenex_tpu.models.cogvideox.transformer import (
        CogVideoXTransformer, TransformerConfig)

    cfg = TransformerConfig(num_layers=2, num_heads=4, head_dim=16,
                            in_channels=8, out_channels=4, patch_size=2,
                            text_embed_dim=16, time_embed_dim=32,
                            attn_dtype=jnp.float32)
    model = CogVideoXTransformer(cfg)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(2, 3, 8, 8, 12)).astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
    t = jnp.array([10, 500], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), lat, txt, t)
    ref = model.apply(params, lat, txt, t)

    mesh = make_mesh(n_data=2, n_model=4)
    apply_fn = dit_sharded_apply(model, mesh)
    out = jax.jit(apply_fn)(params, lat, txt, t)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_mesh_helpers():
    from langscenex_tpu.parallel.mesh import (make_mesh, shard_batch_tree,
                                              replicate_tree)
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    x = jnp.zeros((8, 16))
    sharded = shard_batch_tree({"a": x}, mesh)
    assert sharded["a"].sharding.spec[0] == "data"
    rep = replicate_tree({"b": x}, mesh)
    assert rep["b"].sharding.is_fully_replicated


def test_denoise_loop_tensor_parallel():
    """Full CFG denoise loop with the DiT sharded (data=2, model=4):
    the CFG pair rides 'data', heads/MLP ride 'model'. Must equal the
    unsharded loop."""
    import jax.numpy as jnp
    from langscenex_tpu.parallel.mesh import make_mesh, dit_sharded_apply
    from langscenex_tpu.models.cogvideox.transformer import (
        CogVideoXTransformer, TransformerConfig)
    from langscenex_tpu.models.cogvideox.pipeline import (
        PipelineConfig, denoise_loop)
    from langscenex_tpu.models.cogvideox.scheduler import DDIMScheduler

    tcfg = TransformerConfig(num_layers=1, num_heads=4, head_dim=16,
                             in_channels=8, out_channels=4, patch_size=2,
                             text_embed_dim=16, time_embed_dim=32,
                             attn_dtype=jnp.float32)
    model = CogVideoXTransformer(tcfg)
    rng = np.random.default_rng(0)
    B, F, C, H, W = 1, 2, 4, 4, 4
    noise = jnp.asarray(rng.normal(size=(B, F, C, H, W)).astype(np.float32))
    img_lat = jnp.asarray(rng.normal(size=(B, F, C, H, W))
                          .astype(np.float32))
    tc = jnp.asarray(rng.normal(size=(B, 3, 16)).astype(np.float32))
    tu = jnp.zeros_like(tc)
    lat0 = jnp.concatenate([jnp.concatenate([noise, noise], 0),
                            jnp.concatenate([img_lat, img_lat], 0)], axis=2)
    params = model.init(jax.random.PRNGKey(0), lat0,
                        jnp.concatenate([tu, tc], 0),
                        jnp.zeros((2 * B,), jnp.int32))
    pcfg = PipelineConfig(num_inference_steps=3, guidance_scale=6.0)
    sched = DDIMScheduler()

    dense = lambda lat, txt, t: model.apply(params, lat, txt, t)
    ref = denoise_loop(dense, noise, img_lat, tc, tu, sched, pcfg)

    mesh = make_mesh(n_data=2, n_model=4)
    sharded = dit_sharded_apply(model, mesh)
    tp = jax.jit(lambda lat, txt, t: sharded(params, lat, txt, t))
    out = denoise_loop(tp, noise, img_lat, tc, tu, sched, pcfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)

    # output-broadcast (lax.cond skipping the sharded DiT inside scan)
    # must compile and run under GSPMD and match its own unsharded run
    import dataclasses
    pcfg_b = dataclasses.replace(pcfg, num_inference_steps=4,
                                 broadcast_interval=2,
                                 broadcast_window=(0.25, 1.0))
    ref_b = denoise_loop(dense, noise, img_lat, tc, tu, sched, pcfg_b)
    out_b = denoise_loop(tp, noise, img_lat, tc, tu, sched, pcfg_b)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref_b),
                               atol=5e-4, rtol=5e-4)
