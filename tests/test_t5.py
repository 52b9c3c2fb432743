"""Native T5 encoder vs torch transformers T5EncoderModel.

The only foreign-checkpoint converter that can be verified end-to-end in
this environment: build a randomly-initialized torch T5 from a config,
convert its state_dict, and demand numerical agreement.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langscenex_tpu.models.t5_encoder import (T5Config, T5Encoder,
                                              relative_position_bucket)
from langscenex_tpu.utils.convert import convert_t5_encoder


def _small_cfg():
    return T5Config(vocab_size=512, d_model=64, d_kv=16, d_ff=128,
                    num_layers=3, num_heads=4)


class TestT5:
    def test_shapes_and_finite(self):
        cfg = _small_cfg()
        m = T5Encoder(cfg)
        ids = jnp.asarray(np.random.default_rng(0).integers(
            0, cfg.vocab_size, (2, 20)), jnp.int32)
        mask = jnp.ones((2, 20), jnp.int32).at[1, 12:].set(0)
        params = m.init(jax.random.PRNGKey(0), ids, mask)
        out = m.apply(params, ids, mask)
        assert out.shape == (2, 20, 64)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_bucket_symmetry(self):
        rel = jnp.arange(-200, 201)
        b = np.asarray(relative_position_bucket(rel, 32, 128))
        assert b.min() >= 0 and b.max() <= 31
        assert b[200] == 0                       # rel = 0
        # strictly more buckets used than exact offsets alone
        assert len(np.unique(b)) > 16

    def test_matches_torch_t5(self):
        torch = pytest.importorskip("torch")
        from transformers import T5Config as HFT5Config, T5EncoderModel
        hf_cfg = HFT5Config(
            vocab_size=512, d_model=64, d_kv=16, d_ff=128, num_layers=3,
            num_heads=4, feed_forward_proj="gated-gelu",
            relative_attention_num_buckets=32,
            relative_attention_max_distance=128, dropout_rate=0.0,
            layer_norm_epsilon=1e-6)
        torch.manual_seed(0)
        hf = T5EncoderModel(hf_cfg).eval()
        sd = {k: v.numpy() for k, v in hf.state_dict().items()}

        rng = np.random.default_rng(1)
        ids = rng.integers(0, 512, (2, 30))
        mask = np.ones((2, 30), np.int64)
        mask[0, 21:] = 0
        with torch.no_grad():
            ref = hf(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(mask)
                     ).last_hidden_state.numpy()

        m = T5Encoder(_small_cfg())
        params = convert_t5_encoder(sd)
        out = np.asarray(m.apply(
            jax.tree_util.tree_map(jnp.asarray, params),
            jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)))
        # padded key positions are masked out of every softmax; compare
        # the full [B,T,D] including outputs at padded query positions
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-3)

    def test_conversion_tree_matches_init(self):
        torch = pytest.importorskip("torch")
        from transformers import T5Config as HFT5Config, T5EncoderModel
        hf_cfg = HFT5Config(
            vocab_size=512, d_model=64, d_kv=16, d_ff=128, num_layers=3,
            num_heads=4, feed_forward_proj="gated-gelu", dropout_rate=0.0)
        hf = T5EncoderModel(hf_cfg)
        sd = {k: v.numpy() for k, v in hf.state_dict().items()}
        converted = convert_t5_encoder(sd)
        m = T5Encoder(_small_cfg())
        ids = jnp.zeros((1, 4), jnp.int32)
        ref = m.init(jax.random.PRNGKey(0), ids, jnp.ones((1, 4), jnp.int32))
        ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref)
        got_shapes = jax.tree_util.tree_map(
            lambda x: np.asarray(x).shape, converted)
        assert ref_shapes == got_shapes


def test_text_encoder_end_to_end(tmp_path):
    """Full wrapper path: torch checkpoint dir + fast tokenizer on disk ->
    native encoder -> embeddings match torch on the same token ids."""
    torch = pytest.importorskip("torch")
    import json
    from transformers import T5Config as HFT5Config, T5EncoderModel
    from tokenizers import Tokenizer, models, pre_tokenizers
    from langscenex_tpu.models.t5 import TextEncoder

    hf_cfg = HFT5Config(
        vocab_size=512, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_heads=4, feed_forward_proj="gated-gelu", dropout_rate=0.0)
    torch.manual_seed(1)
    hf = T5EncoderModel(hf_cfg).eval()
    hf.save_pretrained(tmp_path)

    vocab = {"<pad>": 0, "</s>": 1, "<unk>": 2, "a": 3, "photo": 4,
             "of": 5, "cats": 6}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(str(tmp_path / "tokenizer.json"))
    (tmp_path / "tokenizer_config.json").write_text(json.dumps(
        {"tokenizer_class": "PreTrainedTokenizerFast", "pad_token": "<pad>",
         "eos_token": "</s>", "unk_token": "<unk>",
         "model_max_length": 512}))

    enc = TextEncoder(str(tmp_path))
    out = enc.encode(["a photo of cats"])
    assert out.shape == (1, TextEncoder.MAX_LEN, 64)
    assert np.all(np.isfinite(out))

    ids = np.full((1, TextEncoder.MAX_LEN), 0, np.int64)
    ids[0, :4] = [3, 4, 5, 6]
    mask = np.zeros((1, TextEncoder.MAX_LEN), np.int64)
    mask[0, :4] = 1
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    np.testing.assert_allclose(out[0, :4], ref[0, :4], atol=2e-4, rtol=2e-3)
