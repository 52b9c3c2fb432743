"""LoRA fine-tune path: identity at init, loss decrease, merged export."""
import numpy as np
import jax
import jax.numpy as jnp

from langscenex_tpu.models.cogvideox.transformer import (
    CogVideoXTransformer, TransformerConfig)
from langscenex_tpu.train.dit import DiTTrainConfig
from langscenex_tpu.train.lora import (LoRAConfig, init_lora, merge_lora,
                                       export_merged, n_params,
                                       make_lora_train_step)

TINY = TransformerConfig(num_layers=2, num_heads=4, head_dim=16,
                         in_channels=8, out_channels=4, patch_size=2,
                         text_embed_dim=16, time_embed_dim=32,
                         attn_dtype=jnp.float32)


def _setup(B=2):
    rng = np.random.default_rng(0)
    batch = {
        "x0": jnp.asarray(rng.normal(size=(B, 3, 4, 8, 12))
                          .astype(np.float32)),
        "cond": jnp.asarray(rng.normal(size=(B, 3, 4, 8, 12))
                            .astype(np.float32)),
        "text": jnp.asarray(rng.normal(size=(B, 5, 16)).astype(np.float32)),
    }
    model = CogVideoXTransformer(TINY)
    lat = jnp.concatenate([batch["x0"], batch["cond"]], axis=2)
    params = model.init(jax.random.PRNGKey(0), lat, batch["text"],
                        jnp.zeros((B,), jnp.int32))["params"]
    return model, params, batch, lat


class TestLoRA:
    def test_targets_and_size(self):
        _, params, _, _ = _setup()
        cfg = LoRAConfig(rank=4)
        lora = init_lora(params, cfg, jax.random.PRNGKey(1))
        # 2 blocks x (2 attn [fused to_qkv + to_out] + 2 ff) kernels
        assert len(lora) == 8
        assert all(("attn/to_" in p) or ("ff/fc" in p) for p in lora)
        # ~6% on the tiny config; <1% at the real 5.57B scale
        assert n_params(lora) < 0.10 * n_params(params)

    def test_identity_at_init(self):
        model, params, batch, lat = _setup()
        cfg = LoRAConfig(rank=4)
        lora = init_lora(params, cfg, jax.random.PRNGKey(1))
        t = jnp.array([7, 31], jnp.int32)
        ref = model.apply({"params": params}, lat, batch["text"], t)
        merged = merge_lora(params, lora, cfg)
        out = model.apply({"params": merged}, lat, batch["text"], t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref))

    def test_training_moves_only_adapters(self):
        model, params, batch, _ = _setup()
        tcfg = DiTTrainConfig(lr=5e-3, warmup_steps=2, total_steps=40,
                              weight_decay=0.0)
        init_state, step = make_lora_train_step(model, params, tcfg,
                                                LoRAConfig(rank=4))
        jstep = jax.jit(step)
        state = init_state(jax.random.PRNGKey(2))
        rng = jax.random.PRNGKey(3)
        losses = []
        for _ in range(30):
            state, m = jstep(state, batch, rng)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.9, losses[::6]
        # adapters actually moved
        assert float(jnp.abs(list(state["lora"].values())[0]["b"]).max()) > 0

    def test_lora_apply_matches_merged(self):
        """Merge-free interceptor forward == merged-weights forward
        (y = x@(W+sAB) vs x@W + s(x@A)@B; f32 tiny model, tight tol).
        The merge-free path is what the train step uses — the merged
        tree would copy the whole 11.1 GB base at full scale."""
        from langscenex_tpu.train.lora import lora_apply
        model, params, batch, lat = _setup()
        cfg = LoRAConfig(rank=4)
        lora = init_lora(params, cfg, jax.random.PRNGKey(4))
        lora = jax.tree_util.tree_map(
            lambda x: x + 0.02 * jnp.ones_like(x), lora)
        t = jnp.array([100, 500], jnp.int32)
        merged = model.apply({"params": merge_lora(params, lora, cfg)},
                             lat, batch["text"], t)
        free = lora_apply(model, params, lora, cfg, lat, batch["text"], t)
        np.testing.assert_allclose(np.asarray(free), np.asarray(merged),
                                   rtol=1e-4, atol=1e-4)
        # and it actually differs from base (adapters engaged)
        base = model.apply({"params": params}, lat, batch["text"], t)
        assert float(jnp.abs(free - base).max()) > 1e-4

    def test_export_merged_matches_adapted(self):
        model, params, batch, lat = _setup()
        cfg = LoRAConfig(rank=4)
        lora = init_lora(params, cfg, jax.random.PRNGKey(4))
        # give b nonzero values so the adapters do something
        lora = jax.tree_util.tree_map(
            lambda x: x + 0.01 * jnp.ones_like(x), lora)
        t = jnp.array([100, 500], jnp.int32)
        adapted = model.apply({"params": merge_lora(params, lora, cfg)},
                              lat, batch["text"], t)
        exported = export_merged(params, lora, cfg)
        baked = model.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, exported)},
            lat, batch["text"], t)
        np.testing.assert_allclose(np.asarray(baked), np.asarray(adapted),
                                   atol=1e-6)
        assert float(jnp.abs(adapted -
                             model.apply({"params": params}, lat,
                                         batch["text"], t)).max()) > 1e-4
