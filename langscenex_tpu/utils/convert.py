"""Weight conversion: torch state_dicts -> flax param trees.

The reference runs four foreign checkpoints (CogVideoX fine-tune, SAM1/
SAM2, VGGT-1B, OpenSeg; SURVEY.md §hard-parts #4). No network egress is
available in this environment, so conversion is exercised against
synthetic state_dicts in tests; the mappers are the contract for loading
real checkpoints later.

Conventions handled:
  torch Linear weight [out, in]  -> flax Dense kernel [in, out]
  torch Conv2d weight [O,I,kh,kw] -> flax Conv kernel [kh,kw,I,O]
  torch Conv3d weight [O,I,kt,kh,kw] -> [kt,kh,kw,I,O]
  torch LayerNorm weight/bias -> scale/bias
  torch BatchNorm running stats -> flax batch_stats collection
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def t2f_linear(w: np.ndarray, b=None) -> Dict[str, np.ndarray]:
    out = {"kernel": np.asarray(w).T}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def t2f_conv(w: np.ndarray, b=None) -> Dict[str, np.ndarray]:
    w = np.asarray(w)
    if w.ndim == 4:
        k = w.transpose(2, 3, 1, 0)
    elif w.ndim == 5:
        k = w.transpose(2, 3, 4, 1, 0)
    else:
        raise ValueError(f"conv weight rank {w.ndim}")
    out = {"kernel": k}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def t2f_layernorm(w: np.ndarray, b: np.ndarray) -> Dict[str, np.ndarray]:
    return {"scale": np.asarray(w), "bias": np.asarray(b)}


def t2f_batchnorm(sd: Dict[str, np.ndarray], prefix: str
                  ) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats) entries."""
    params = {"scale": np.asarray(sd[prefix + ".weight"]),
              "bias": np.asarray(sd[prefix + ".bias"])}
    stats = {"mean": np.asarray(sd[prefix + ".running_mean"]),
             "var": np.asarray(sd[prefix + ".running_var"])}
    return params, stats


def convert_autoencoder(sd: Dict[str, np.ndarray]) -> Dict:
    """Per-scene language AE (field_construction/auto_encoder.py layout:
    encoder = ModuleList[Linear, (BN, ReLU, Linear)*6],
    decoder = ModuleList[Linear, (ReLU, Linear)*6]) -> models/autoencoder
    flax params + batch_stats."""
    params = {"encoder": {}, "decoder": {}}
    stats = {"encoder": {}}
    # encoder module indices: Linear at 0, then (BN, ReLU, Linear) triples
    enc_linear_idx = [0] + [3 * i for i in range(1, 7)]
    enc_bn_idx = [3 * i - 2 for i in range(1, 7)]
    for j, mi in enumerate(enc_linear_idx):
        params["encoder"][f"Dense_{j}"] = t2f_linear(
            sd[f"encoder.{mi}.weight"], sd[f"encoder.{mi}.bias"])
    for j, mi in enumerate(enc_bn_idx):
        p, s = t2f_batchnorm(sd, f"encoder.{mi}")
        params["encoder"][f"BatchNorm_{j}"] = p
        stats["encoder"][f"BatchNorm_{j}"] = s
    dec_linear_idx = [0] + [2 * i for i in range(1, 7)]
    for j, mi in enumerate(dec_linear_idx):
        params["decoder"][f"Dense_{j}"] = t2f_linear(
            sd[f"decoder.{mi}.weight"], sd[f"decoder.{mi}.bias"])
    return {"params": params, "batch_stats": stats}


def convert_lpips_vgg(sd: Dict[str, np.ndarray]) -> Dict:
    """taming LPIPS checkpoint (net.slice*/lin* layout,
    cogvideox_interpolation/lpips.py) -> models/lpips flax params."""
    params = {"vgg": {}, }
    conv_i = 0
    # torchvision VGG16 features module indices of conv layers
    tv_conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for i, ti in enumerate(tv_conv_idx):
        wkey = f"net.features.{ti}.weight"
        if wkey not in sd:
            continue
        params["vgg"][f"conv_{conv_i}"] = t2f_conv(
            sd[wkey], sd.get(f"net.features.{ti}.bias"))
        conv_i += 1
    for i in range(5):
        k = f"lin{i}.model.1.weight"
        if k in sd:
            params[f"lin_{i}"] = t2f_conv(sd[k])
    return {"params": params}


def walk_assign(tree: Dict, path: str, value) -> None:
    """Assign value at a '/'-separated path, creating nested dicts."""
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value
