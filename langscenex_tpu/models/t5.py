"""T5 text encoder wrapper for prompt embedding.

Parity target: the T5EncoderModel/T5Tokenizer pair the pipeline loads
(cogvideox_interpolation/pipeline.py:17,660-671: max 226 tokens, padded,
embeddings fed to the DiT text stream). Uses transformers' FlaxT5 when
checkpoint weights are available; otherwise a deterministic hash-embedding
stub keeps the pipeline runnable end-to-end for tests and benches.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


class TextEncoder:
    MAX_LEN = 226     # pipeline.py max_sequence_length

    def __init__(self, model_name_or_path: Optional[str] = None,
                 embed_dim: int = 4096):
        self.embed_dim = embed_dim
        self._model = None
        self._tok = None
        if model_name_or_path:
            from transformers import AutoTokenizer, FlaxT5EncoderModel
            self._tok = AutoTokenizer.from_pretrained(model_name_or_path)
            self._model = FlaxT5EncoderModel.from_pretrained(
                model_name_or_path)

    def encode(self, prompts: list[str]) -> np.ndarray:
        """[B] strings -> [B, MAX_LEN, embed_dim] float32."""
        if self._model is not None:
            batch = self._tok(prompts, padding="max_length",
                              max_length=self.MAX_LEN, truncation=True,
                              return_tensors="np")
            out = self._model(input_ids=batch["input_ids"],
                              attention_mask=batch["attention_mask"])
            return np.asarray(out.last_hidden_state, np.float32)
        # stub: deterministic per-token hash embeddings (keeps CFG
        # cond/uncond distinct and runs without any checkpoint)
        out = np.zeros((len(prompts), self.MAX_LEN, self.embed_dim),
                       np.float32)
        for b, p in enumerate(prompts):
            toks = p.lower().split()[:self.MAX_LEN]
            for i, t in enumerate(toks):
                rng = np.random.default_rng(abs(hash(t)) % (2 ** 32))
                out[b, i] = rng.normal(0, 0.02, self.embed_dim)
        return out
