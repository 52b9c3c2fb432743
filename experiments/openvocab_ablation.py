"""Open-vocab mIoU gap attribution (VERDICT r2 item 7).

The 12k schedule's synthetic open-vocab protocol scored field mIoU
~0.5 vs a GT-feature oracle at 1.0, unexplained. This decomposes the
gap on the SAVED eval artifacts of a schedule run (field_full_schedule's
{root}/output/eval tree — no AE is in this loop: the synthetic scene's
features are the 3-d palette codes directly, so the 768->3 bottleneck
is ruled out by construction):

  1. decision-threshold sweep (predict_masks default 0.5),
  2. norm-gate sweep (relevancy_maps min_norm),
  3. interior-vs-boundary split: erode each GT mask k px and re-score —
     alpha blending mixes codes at blob boundaries, so if the loss is
     boundary-localized the field is fine and the metric is measuring
     soft-edge mixing, not bad features.

Run after a schedule run:
  python experiments/openvocab_ablation.py /tmp/ffs
"""
import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from langscenex_tpu.eval.open_vocab import (eval_open_vocab,
                                            relevancy_maps,
                                            predict_masks, iou_per_query)


def erode(mask: np.ndarray, k: int) -> np.ndarray:
    """k-pixel binary erosion via shifted ANDs (no scipy dependency)."""
    out = mask.copy()
    for _ in range(k):
        m = out.copy()
        m[1:] &= out[:-1]
        m[:-1] &= out[1:]
        m[:, 1:] &= out[:, :-1]
        m[:, :-1] &= out[:, 1:]
        out = m
    return out


def miou_interior(lang_maps, gt_maps, palette, k, threshold=0.5):
    """mIoU scored only on pixels ≥k px inside their GT mask (boundary
    band excluded from BOTH prediction and gt)."""
    ious = []
    Q = palette.shape[0]
    for lang, gt in zip(lang_maps, gt_maps):
        rel = relevancy_maps(lang, palette)
        pred = predict_masks(rel, threshold)
        keep = np.zeros(gt.shape, bool)
        for q in np.unique(gt[gt >= 0]):
            keep |= erode(gt == q, k)
        pred = np.where(keep, pred, -1)
        gtk = np.where(keep, gt, -1)
        iou = iou_per_query(pred, gtk, Q)
        ious.extend(iou[np.isfinite(iou)].tolist())
    return float(np.mean(ious)) if ious else float("nan")


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ffs"
    out = os.path.join(root, "output")
    palette = np.load(os.path.join(root, "colors.npy"))

    lang_maps, gt_maps, oracle_maps = [], [], []
    for f in sorted(glob.glob(os.path.join(
            out, "eval/renders_lang_npy/*.npy"))):
        name = os.path.basename(f)[:-4]
        lang = np.load(f)
        seg = np.load(os.path.join(root, "lang_features_dim3",
                                   name + "_s.npy"))
        gt_feat = np.load(os.path.join(root, "lang_features_dim3",
                                       name + "_f.npy"))[0]
        Hh, Ww = lang.shape[:2]
        yi = (np.arange(Hh) * seg.shape[0] / Hh).astype(int)
        xi = (np.arange(Ww) * seg.shape[1] / Ww).astype(int)
        lang_maps.append(lang.transpose(2, 0, 1))
        gt_maps.append(seg[yi][:, xi].astype(np.int32))
        oracle_maps.append(gt_feat[:, yi][:, :, xi])
    assert lang_maps, f"no eval artifacts under {out}/eval"
    print(f"{len(lang_maps)} eval views", flush=True)

    print("--- threshold sweep (field | oracle mIoU) ---", flush=True)
    rows = {}
    for th in (0.0, 0.2, 0.35, 0.5, 0.65, 0.8, 0.9):
        f = eval_open_vocab(lang_maps, gt_maps, palette, threshold=th)
        o = eval_open_vocab(oracle_maps, gt_maps, palette, threshold=th)
        rows[th] = (f["miou"], o["miou"])
        print(f"th={th:.2f}  field {f['miou']:.3f} (acc {f['acc']:.3f})"
              f"  oracle {o['miou']:.3f}", flush=True)

    print("--- interior-only mIoU (erode k px; th=0.5) ---", flush=True)
    interior = {}
    for k in (0, 2, 4, 8):
        mi = miou_interior(lang_maps, gt_maps, palette, k)
        mo = miou_interior(oracle_maps, gt_maps, palette, k)
        interior[k] = (mi, mo)
        print(f"k={k}  field {mi:.3f}  oracle {mo:.3f}", flush=True)

    best_th = max(rows, key=lambda t: rows[t][0])
    print(json.dumps({
        "metric": "openvocab_ablation",
        "best_threshold": best_th,
        "field_miou_best_th": round(rows[best_th][0], 4),
        "field_miou_default": round(rows[0.5][0], 4),
        "field_miou_interior4": round(interior[4][0], 4),
        "oracle_miou_interior4": round(interior[4][1], 4)}), flush=True)


if __name__ == "__main__":
    main()
