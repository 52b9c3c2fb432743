"""Language-autoencoder trainer + per-pixel 3-d feature map generation.

Parity target: Preprocessor.generate_lang_features_with_openseg
(field_construction/preprocessor.py:146-227): 400 epochs, batch 512, Adam
1e-4, train loss = L2 + 0.001*cos, eval (after epoch 300) loss = L2 + cos,
best checkpoint selected on eval loss; then every per-frame pooled feature
matrix is encoded to 3-d and scattered into per-pixel ``*_f.npy`` maps
keyed by the ``*_s.npy`` segment ids (ids enumerated from -1 upward,
skipping absent ids — preprocessor.py:214-227).

The cos term follows the reference's loss_utils.cos_loss exactly: cosine
similarity along axis 0 (the batch axis).
"""
from __future__ import annotations

import glob
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.autoencoder import Autoencoder


def _cos_loss_axis0(x, y):
    num = jnp.sum(x * y, axis=0)
    den = (jnp.sqrt(jnp.maximum(jnp.sum(x * x, 0), 1e-16))
           * jnp.sqrt(jnp.maximum(jnp.sum(y * y, 0), 1e-16)))
    return 1.0 - jnp.mean(num / den)


def _l2(x, y):
    return jnp.mean((x - y) ** 2)


class AETrainer:
    def __init__(self, seed: int = 42, lr: float = 1e-4,
                 input_dim: int = 768):
        from ..models.autoencoder import DECODER_DIMS
        dec = tuple(DECODER_DIMS[:-1]) + (input_dim,)
        self.model = Autoencoder(decoder_dims=dec)
        self.key = jax.random.PRNGKey(seed)
        self.tx = optax.adam(lr)
        variables = self.model.init(self.key, jnp.zeros((2, input_dim)),
                                    train=True)
        self.params = variables['params']
        self.batch_stats = variables['batch_stats']
        self.opt_state = self.tx.init(self.params)

        @jax.jit
        def train_step(params, batch_stats, opt_state, batch):
            def loss_fn(p):
                out, updates = self.model.apply(
                    {'params': p, 'batch_stats': batch_stats}, batch,
                    train=True, mutable=['batch_stats'])
                loss = _l2(out, batch) + 0.001 * _cos_loss_axis0(out, batch)
                return loss, updates['batch_stats']
            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            upd, new_opt = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, upd), new_bs, new_opt, loss

        @jax.jit
        def eval_step(params, batch_stats, batch):
            out = self.model.apply(
                {'params': params, 'batch_stats': batch_stats}, batch,
                train=False)
            return (_l2(out, batch) + _cos_loss_axis0(out, batch))

        self._train_step = train_step
        self._eval_step = eval_step

    def fit(self, features: np.ndarray, num_epochs: int = 400,
            batch_size: int = 512, eval_from_epoch: int = 300,
            log_every: int = 0):
        """features: [N, 768] concatenated pooled features of all frames."""
        n = features.shape[0]
        feats = jnp.asarray(features, jnp.float32)
        best = (np.inf, None, None, -1)
        rng = np.random.default_rng(0)
        steps = max(1, n // batch_size) if n >= batch_size else 1
        for epoch in range(num_epochs):
            perm = rng.permutation(n)
            for s in range(steps):
                idx = perm[s * batch_size:(s + 1) * batch_size]
                if len(idx) == 0:
                    continue
                batch = feats[jnp.asarray(idx)]
                self.params, self.batch_stats, self.opt_state, loss = \
                    self._train_step(self.params, self.batch_stats,
                                     self.opt_state, batch)
            if epoch > eval_from_epoch:
                ev = 0.0
                for s in range(0, n, batch_size):
                    b = feats[s:s + batch_size]
                    ev += float(self._eval_step(self.params,
                                                self.batch_stats, b)) * b.shape[0]
                ev /= n
                if ev < best[0]:
                    best = (ev, jax.tree_util.tree_map(lambda x: x, self.params),
                            jax.tree_util.tree_map(lambda x: x, self.batch_stats),
                            epoch)
            if log_every and epoch % log_every == 0:
                print(f"[ae epoch {epoch}] loss={float(loss):.6f}")
        if best[1] is not None:
            self.params, self.batch_stats = best[1], best[2]
        return best[0] if best[1] is not None else float(loss)

    def encode(self, features: np.ndarray) -> np.ndarray:
        out = self.model.apply(
            {'params': self.params, 'batch_stats': self.batch_stats},
            jnp.asarray(features, jnp.float32), train=False,
            method=Autoencoder.encode)
        return np.asarray(out)

    def decode(self, z: np.ndarray) -> np.ndarray:
        out = self.model.apply(
            {'params': self.params, 'batch_stats': self.batch_stats},
            jnp.asarray(z, jnp.float32), method=Autoencoder.decode)
        return np.asarray(out)


def scatter_seg_features(lang_feat: np.ndarray, seg: np.ndarray) -> np.ndarray:
    """[n_rows, 3] encoded features + [H,W] seg ids -> [3,H,W] per-pixel map.
    Rows correspond to seg ids present, enumerated from -1 upward
    (preprocessor.py:214-227)."""
    H, W = seg.shape
    out = np.zeros((3, H, W), np.float32)
    curr = 0
    for color_id in range(-1, int(seg.max()) + 1):
        m = seg == color_id
        if not m.any():
            continue
        out[:, m] = lang_feat[curr][:, None]
        curr += 1
    return out


def generate_dim3_features(lang_features_dir: str, seg_dir: str,
                           out_dir: str, trainer: Optional[AETrainer] = None,
                           num_epochs: int = 400) -> AETrainer:
    """Full stage-3 tail: train AE on all frames' pooled features, then
    write per-pixel ``*_f.npy`` maps next to the ``*_s.npy`` segs."""
    names = sorted(glob.glob(os.path.join(lang_features_dir, "*.npy")))
    feats = [np.load(n) for n in names]
    all_feats = np.concatenate(feats, axis=0)
    if trainer is None:
        trainer = AETrainer(input_dim=all_feats.shape[1])
    trainer.fit(all_feats, num_epochs=num_epochs)
    os.makedirs(out_dir, exist_ok=True)
    for idx, (name, f) in enumerate(zip(names, feats)):
        seg = np.load(os.path.join(seg_dir, f"{idx + 1:04d}_s.npy"))
        if seg.ndim == 3:
            seg = seg[0]
        enc = trainer.encode(f)
        np.save(os.path.join(out_dir, f"{idx + 1:04d}_f.npy"),
                scatter_seg_features(enc, seg))
    return trainer
