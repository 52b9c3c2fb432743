"""Training losses for field construction.

Parity targets: field_construction/utils/loss_utils.py — l1/l2/cos (:20-29),
SSIM (:44-75), image-gradient weight (:105-117), patchwise LNCC (:120-155),
kNN-KL 3D regularizer loss_cls_3d (:158-186), semantic grouping (:189-214),
instance contrastive grouping (:217-260), ranking loss (:262-273).

Reference sampling uses unseeded randperm; here sampling takes explicit
PRNG keys (parity is statistical, SURVEY.md §hard-parts #5).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def l1_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(x - y))


def l2_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def cos_loss(x: jnp.ndarray, y: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """1 - mean cosine similarity along ``axis`` (loss_utils.cos_loss)."""
    num = jnp.sum(x * y, axis=axis)
    den = jnp.linalg.norm(x, axis=axis) * jnp.linalg.norm(y, axis=axis)
    return 1.0 - jnp.mean(num / jnp.maximum(den, 1e-8))


# ---------------------------------------------------------------- SSIM

def _gaussian_window(window_size: int, sigma: float) -> jnp.ndarray:
    xs = jnp.arange(window_size, dtype=jnp.float32) - window_size // 2
    g = jnp.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    return g / jnp.sum(g)


def _sep_filter2d(img: jnp.ndarray, w1d: jnp.ndarray) -> jnp.ndarray:
    """Depthwise separable 2D filter with zero SAME padding on [C,H,W].

    precision=HIGHEST is load-bearing: TPU convs default to bf16 input
    precision, and SSIM's variance form E[x^2]-E[x]^2 catastrophically
    cancels at bf16 (observed SSIM values of 6.4 / -1.28 in real TPU
    training runs — garbage loss AND garbage gradients). The torch
    reference convolves in f32 (loss_utils.py conv2d); HIGHEST matches it.
    """
    k = w1d.shape[0]
    pad = k // 2
    C = img.shape[0]
    x = img[:, None]  # [C,1,H,W]
    wy = jnp.broadcast_to(w1d.reshape(1, 1, k, 1), (C, 1, k, 1))
    wx = jnp.broadcast_to(w1d.reshape(1, 1, 1, k), (C, 1, 1, k))
    dn = jax.lax.conv_dimension_numbers(x.shape, wy.shape, ('NCHW', 'OIHW', 'NCHW'))
    x = jax.lax.conv_general_dilated(x.transpose(1, 0, 2, 3), wy,
                                     (1, 1), [(pad, pad), (0, 0)],
                                     dimension_numbers=dn, feature_group_count=C,
                                     precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(x, wx, (1, 1), [(0, 0), (pad, pad)],
                                     dimension_numbers=dn, feature_group_count=C,
                                     precision=jax.lax.Precision.HIGHEST)
    return x.transpose(1, 0, 2, 3)[:, 0]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over [C,H,W] images (loss_utils.ssim:44-75): 11x11 Gaussian
    window (sigma 1.5), zero SAME padding, C1=0.01^2, C2=0.03^2."""
    w = _gaussian_window(window_size, sigma)
    f = partial(_sep_filter2d, w1d=w)
    mu1, mu2 = f(img1), f(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = f(img1 * img1) - mu1_sq
    s2 = f(img2 * img2) - mu2_sq
    s12 = f(img1 * img2) - mu12
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    smap = ((2 * mu12 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return jnp.mean(smap)


# ------------------------------------------------- image gradient weight

def image_grad_weight(img: jnp.ndarray) -> jnp.ndarray:
    """[C,H,W] -> [H,W] edge-awareness weight in [0,1], border=1
    (loss_utils.get_img_grad_weight:105-117)."""
    gx = jnp.mean(jnp.abs(img[:, 1:-1, 2:] - img[:, 1:-1, :-2]), axis=0)
    gy = jnp.mean(jnp.abs(img[:, :-2, 1:-1] - img[:, 2:, 1:-1]), axis=0)
    g = jnp.maximum(gx, gy)
    g = (g - g.min()) / (g.max() - g.min() + 1e-12)
    return jnp.pad(g, 1, mode='constant', constant_values=1.0)


# ----------------------------------------------------------------- LNCC

def lncc(ref: jnp.ndarray, nea: jnp.ndarray):
    """Patchwise normalized cross-correlation loss (loss_utils.lncc:120-155).

    Args: ref, nea [B, patch*patch] grayscale patches.
    Returns (ncc [B,1], mask [B,1] bool) with ncc = clip(1-cc, 0, 2) and
    mask = ncc < 0.9.
    """
    tps = ref.shape[-1]
    ref_sum = jnp.sum(ref, -1)
    nea_sum = jnp.sum(nea, -1)
    ref2_sum = jnp.sum(ref * ref, -1)
    nea2_sum = jnp.sum(nea * nea, -1)
    ref_nea_sum = jnp.sum(ref * nea, -1)
    ref_avg = ref_sum / tps
    nea_avg = nea_sum / tps
    cross = ref_nea_sum - nea_avg * ref_sum
    ref_var = ref2_sum - ref_avg * ref_sum
    nea_var = nea2_sum - nea_avg * nea_sum
    cc = cross * cross / (ref_var * nea_var + 1e-8)
    ncc = jnp.clip(1.0 - cc, 0.0, 2.0)[:, None]
    return ncc, ncc < 0.9


# ----------------------------------------------------- 3D kNN-KL smoothing

def loss_cls_3d(key: jax.Array, features: jnp.ndarray, predictions: jnp.ndarray,
                k: int = 5, lambda_val: float = 2.0,
                sample_size: int = 800) -> jnp.ndarray:
    """kNN KL regularizer on per-splat semantic predictions
    (loss_utils.loss_cls_3d:158-186). ``features`` [N,3] positions,
    ``predictions`` [N,C]. The reference's 200k max_points cap is handled by
    the caller (static shapes)."""
    pmin, pmax = predictions.min(), predictions.max()
    preds = jnp.where(pmax > pmin, (predictions - pmin) / (pmax - pmin + 1e-12),
                      predictions)
    n = features.shape[0]
    idx = jax.random.permutation(key, n)[:sample_size]
    sf = features[idx]
    sp = preds[idx]
    # pairwise squared distances via the matmul identity (MXU-friendly).
    # HIGHEST: at bf16 matmul precision the identity cancels for near
    # neighbors (d2 ~ 0 minus O(2^-8) matmul error) and kNN selection
    # gets noisy — same trap as the SSIM variance (see _sep_filter2d).
    d2 = (jnp.sum(sf ** 2, -1)[:, None] + jnp.sum(features ** 2, -1)[None, :]
          - 2.0 * jnp.matmul(sf, features.T,
                             precision=jax.lax.Precision.HIGHEST))
    _, nbr = jax.lax.top_k(-d2, k)
    nbr_preds = preds[nbr]                              # [S,k,C]
    kl = sp[:, None] * (jnp.log(sp[:, None] + 1e-10) - jnp.log(nbr_preds + 1e-10))
    return lambda_val * jnp.mean(jnp.abs(kl))


# ------------------------------------------------------ grouping losses

def _pairwise_l2(x: jnp.ndarray) -> jnp.ndarray:
    """[N,C] -> [N,N] L2 distances via the matmul identity: avoids the
    [N,N,C] broadcast intermediate (1.2GB at the reference's N=10k sample;
    the matmul form is MXU work + one [N,N] array)."""
    sq = jnp.sum(x * x, -1)
    # HIGHEST: same-cluster pairs have d2 ~ 0; a bf16 x@x.T error of
    # O(2^-8)*|x|^2 would dominate their distance (and its gradient).
    d2 = sq[:, None] + sq[None, :] - 2.0 * jnp.matmul(
        x, x.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.sqrt(jnp.maximum(d2, 1e-12))

def loss_semantic_group(key: jax.Array, gt_seg: jnp.ndarray,
                        language_feature: jnp.ndarray,
                        num: int = 10000) -> jnp.ndarray:
    """Pull together language features of pixels with the same seg id
    (loss_utils.get_loss_semantic_group:189-214). gt_seg [N] int,
    language_feature [N,C]; pixels with seg == -1 are excluded from pairs by
    the caller's masking convention (same as reference usage)."""
    n = gt_seg.shape[0]
    num = min(num, n)
    idx = jax.random.permutation(key, n)[:num]
    seg = gt_seg[idx]
    feat = language_feature[idx]
    same = seg[:, None] == seg[None, :]
    iu = jnp.triu(jnp.ones((num, num), bool), k=0)
    diag = jnp.eye(num, dtype=bool)
    pair_mask = same & iu & ~diag
    d = _pairwise_l2(feat)
    total = jnp.sum(jnp.where(pair_mask, d, 0.0))
    return 2.0 * total / jnp.sum(iu)


def loss_instance_group(key: jax.Array, sam_seg: jnp.ndarray,
                        instance_feature: jnp.ndarray,
                        language_feature: jnp.ndarray,
                        num: int = 1000, margin: float = 1.0) -> jnp.ndarray:
    """Contrastive instance grouping with language-similarity-weighted
    negatives (loss_utils.get_loss_instance_group:217-260)."""
    n = sam_seg.shape[0]
    num = min(num, n)
    idx = jax.random.permutation(key, n)[:num]
    seg = sam_seg[idx]
    inst = instance_feature[idx]
    lang = language_feature[idx]
    same = seg[:, None] == seg[None, :]
    iu = jnp.triu(jnp.ones((num, num), bool), k=0)
    diag = jnp.eye(num, dtype=bool)
    pos_mask = same & iu & ~diag
    neg_mask = ~same & iu

    d = _pairwise_l2(inst)
    pos = jnp.sum(jnp.where(pos_mask, d, 0.0))

    lnorm = lang / (jnp.linalg.norm(lang, axis=-1, keepdims=True) + 1e-8)
    cos_sim = lnorm @ lnorm.T
    neg = jnp.sum(jnp.where(neg_mask,
                            jax.nn.relu(margin - d) * (1.0 + cos_sim), 0.0))
    return 2.0 * (pos + neg) / jnp.sum(iu)


def ranking_loss(error: jnp.ndarray, penalize_ratio: float = 1.0,
                 kind: str = "mean") -> jnp.ndarray:
    """Mean/sum of the top penalize_ratio fraction of errors
    (loss_utils.ranking_loss:262-273). penalize_ratio is static."""
    flat = jnp.sort(error.reshape(-1))[::-1]
    k = int(penalize_ratio * flat.shape[0])
    if k == 0:
        return jnp.array(0.0, error.dtype)
    sel = flat[:k]
    return jnp.mean(sel) if kind == "mean" else jnp.sum(sel)
