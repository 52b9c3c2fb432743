#!/usr/bin/env python
"""Four-stage end-to-end pipeline driver (quick_start.sh parity).

Parity target: quick_start.sh:14-61 —
  1. auto-seg on the (first, last) keyframes -> seg keyframes + colors.npy
     (auto-mask-align.py), then get_normal -> normal keyframes
  2. TriMap generation: 3x video_inference (rgb / seg / normal videos)
  3+4. field pipeline: preprocess (frames / poses / language features) +
     field construction, then mode=render / mode=eval.

Each stage is skippable (the reference's pipeline.skip_* flags) and talks
through the same directory contract, so stages interchange with artifacts
produced by the reference implementation. ``--tiny`` swaps every model for
a tiny random-init configuration so the ENTIRE chain is drivable as a
smoke test without checkpoints (tests/test_quick_start_chain.py).
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import shutil
import sys
import time

import numpy as np

log = logging.getLogger("quick_start")


def _tiny_vggt():
    import jax
    from langscenex_tpu.models.vggt import VGGT, VGGTConfig
    cfg = VGGTConfig(img_size=28, patch_size=14, embed_dim=32, depth=2,
                     num_heads=2, num_register_tokens=2,
                     vit_embed_dim=32, vit_depth=2, vit_num_heads=2,
                     camera_trunk_depth=1, camera_iterations=2,
                     intermediate_layers=(0, 0, 1, 1),
                     dpt_features=16, dpt_out_channels=(16, 16, 16, 16),
                     enable_point_head=False)
    import jax.numpy as jnp
    model = VGGT(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 1, 3, 28, 28)))
    return params, cfg


def _random_sam_stack():
    """Full-size SAM1 ViT-H + SAM2 Hiera-L with RANDOM weights and
    thresholds disabled — the --full-random configuration: reference-
    scale compute (encoder sizes, point grids, crop layers, propagation
    passes) without network egress for the checkpoints. Masks are
    meaningless; wall-clock and pipeline mechanics are real."""
    import jax
    import jax.numpy as jnp

    from langscenex_tpu.models.sam1 import (SAM1, SAM1AMGConfig, SAM1Config,
                                            SAM1AutomaticMaskGenerator)
    from langscenex_tpu.models.sam2.model import (SAM2, SAM2Config,
                                                  SAM2VideoPredictor,
                                                  init_sam2_params)

    m1 = SAM1(SAM1Config())
    S = m1.cfg.img_size

    def init_all(mdl, img):
        feats = mdl.encode_image(img)
        coords = jnp.zeros((1, 1, 2))
        labels = jnp.ones((1, 1), jnp.int32)
        return mdl.decode_points(feats, coords, labels, True)

    p1 = SAM1.init(m1, jax.random.PRNGKey(0), jnp.zeros((1, 3, S, S)),
                   method=init_all)
    amg = SAM1AutomaticMaskGenerator(
        m1, p1, SAM1AMGConfig(pred_iou_thresh=-1e9,
                              stability_score_thresh=-1e9,
                              min_mask_region_area=0))
    m2 = SAM2(SAM2Config())
    pred = SAM2VideoPredictor(m2, init_sam2_params(m2))
    return amg, pred


def run_autoseg(first_image: str, last_image: str, seg_dir: str,
                tiny: bool, sam1_ckpt=None, sam2_ckpt=None,
                level: str = "default", full_random: bool = False) -> None:
    """Stage-1a: SAM proposals + SAM2 alignment over the two keyframes ->
    flat-color seg keyframes + colors.npy (auto-mask-align.py:404-640)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from langscenex_tpu.autoseg.mask_align import (MaskAligner,
                                                   MaskAlignConfig,
                                                   save_outputs)
    from langscenex_tpu.models.sam2.amg import (AMGConfig,
                                                AutomaticMaskGenerator)
    from langscenex_tpu.models.sam2.model import SAM2, SAM2VideoPredictor

    raw = []
    for p in (first_image, last_image):
        raw.append(np.asarray(Image.open(p).convert("RGB")))
    H, W = raw[0].shape[:2]

    if tiny:
        from langscenex_tpu.models.sam2.model import (SAM2Config,
                                                      init_sam2_params)
        from langscenex_tpu.models.sam2.hiera import HieraConfig
        from langscenex_tpu.models.sam2.decoder import DecoderConfig
        from langscenex_tpu.models.sam2.memory import MemoryConfig
        cfg = SAM2Config(
            hiera=HieraConfig(embed_dim=8, num_heads=1, stages=(1, 1, 1, 1),
                              global_att_blocks=(3,), window_spec=(4, 4, 2, 2),
                              pos_embed_bkg_size=(2, 2), neck_dim=32),
            decoder=DecoderConfig(dim=32, num_heads=2, mlp_dim=64, depth=1,
                                  num_multimask=3),
            memory=MemoryConfig(dim=32, mem_dim=16, num_heads=1, depth=1,
                                ffn_dim=64, num_maskmem=3, max_obj_ptrs=4),
            image_size=64)
        model = SAM2(cfg)
        params = init_sam2_params(model)
        amg = AutomaticMaskGenerator(
            model, params,
            AMGConfig(points_per_side=2, points_per_batch=4,
                      pred_iou_thresh=-1e9, stability_score_thresh=-1e9,
                      min_mask_area=0))
        pred = SAM2VideoPredictor(model, params)
        acfg = MaskAlignConfig(detect_stride=1, max_objects=4,
                               new_obj_min_area=4, postnms_score=-1e9)
    elif full_random:
        amg, pred = _random_sam_stack()
        acfg = MaskAlignConfig(level=level, new_obj_min_area=4,
                               postnms_score=-1e9)
    else:
        if not (sam1_ckpt and sam2_ckpt):
            raise RuntimeError(
                "auto-seg needs --sam1_checkpoint/--sam2_checkpoint "
                "(converted via utils/convert), --tiny, or --full-random")
        from langscenex_tpu.autoseg.mask_align import build_from_checkpoints
        amg, pred = build_from_checkpoints(sam1_ckpt, sam2_ckpt)
        acfg = MaskAlignConfig(level=level)

    # the SAM stack runs at the model's square image_size (the reference's
    # SAM transforms do the same internally); ids map back per-pixel
    S = (amg.image_size if hasattr(amg, "image_size")
         else amg.model.cfg.img_size)
    frames = np.stack([
        np.asarray(Image.fromarray(r).resize((S, S)), np.float32)
        .transpose(2, 0, 1) / 255.0 for r in raw])
    aligner = MaskAligner(amg, pred, acfg)
    seg_maps, colors = aligner.run(frames)
    seg_maps = np.stack([
        np.asarray(Image.fromarray(s.astype(np.int32), mode="I")
                   .resize((W, H), Image.NEAREST))
        for s in seg_maps]).astype(np.int32)
    save_outputs(seg_maps, colors, seg_dir)
    # video keyframes for the seg TriMap: the flat-color key pngs
    for i in (1, 2):
        src = os.path.join(seg_dir, f"key_{i:04d}.png")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(seg_dir, f"{i:04d}.png"))


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--first_image")
    p.add_argument("--last_image")
    p.add_argument("--prompt", default="")
    p.add_argument("--checkpoint", default=None, help="TriMap DiT ckpt")
    p.add_argument("--sam1_checkpoint", default=None)
    p.add_argument("--sam2_checkpoint", default=None)
    p.add_argument("--vggt_checkpoint", default=None)
    p.add_argument("--level", default="default")
    p.add_argument("--skip_keyframes", action="store_true",
                   help="skip auto-seg + normal keyframe stages")
    p.add_argument("--skip_trimap", action="store_true")
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--render", action="store_true")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--iterations", type=int, default=None)
    p.add_argument("--ae_epochs", type=int, default=400)
    p.add_argument("--pose_optim_iter", type=int, default=None,
                   help="eval pose-fit iters (gaussian.eval.pose_optim_iter)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random models end-to-end (smoke test)")
    p.add_argument("--full-random", action="store_true", dest="full_random",
                   help="FULL-SIZE models with random/zero weights: the "
                        "reference-scale compute configuration for "
                        "no-egress wall-clock records (outputs are "
                        "meaningless; every stage does real-scale work)")
    args = p.parse_args(argv)

    from langscenex_tpu.pipeline import (FieldConstructionPipeline,
                                         PipelinePaths)

    dp = args.data_path
    os.makedirs(dp, exist_ok=True)
    rgb_key = os.path.join(dp, "rgb")
    seg_key = os.path.join(dp, "seg")
    vggt_params = vggt_cfg = None
    if args.tiny:
        vggt_params, vggt_cfg = _tiny_vggt()
    elif args.full_random:
        # full-size VGGT-1B, random init (no-egress wall-clock config)
        import jax
        import jax.numpy as jnp
        from langscenex_tpu.models.vggt import VGGT, VGGTConfig
        vggt_cfg = VGGTConfig()
        vggt_params = VGGT(vggt_cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, 3, 28, 28)))

    stage_t = {}
    t_all = time.perf_counter()

    # ---- stage 1: keyframes (seg via auto-seg, normal via get_normal) --
    if not args.skip_keyframes:
        t0 = time.perf_counter()
        os.makedirs(rgb_key, exist_ok=True)
        shutil.copy(args.first_image, os.path.join(rgb_key, "0001.png"))
        shutil.copy(args.last_image, os.path.join(rgb_key, "0002.png"))
        log.info("auto-seg keyframes -> %s", seg_key)
        run_autoseg(args.first_image, args.last_image, seg_key,
                    args.tiny, args.sam1_checkpoint, args.sam2_checkpoint,
                    args.level, full_random=args.full_random)
        log.info("normal keyframes -> %s/normal", dp)
        from langscenex_tpu.get_normal import generate_normals
        generate_normals(dp, params=vggt_params, cfg=vggt_cfg)
        stage_t["1_keyframes"] = round(time.perf_counter() - t0, 1)

    # ---- stage 2: TriMap videos (rgb / seg / normal) -------------------
    if args.full_random and not args.skip_trimap:
        # inter-stage HBM management (the reference gets this from
        # sequential CPU offload): drop the 4 GB VGGT tree before the
        # 11 GB DiT stage — the first full-scale run OOM'd at the VAE
        # keyframe encode with it resident. Random weights re-init
        # device-side afterwards (same key -> same tree), avoiding a
        # multi-GB host->device upload over the tunnel.
        vggt_params = None
        import gc
        gc.collect()
    if not args.skip_trimap:
        t0 = time.perf_counter()
        from langscenex_tpu.video_inference import main as vi_main
        for kind, d in (("rgb", rgb_key), ("seg", seg_key),
                        ("normal", os.path.join(dp, "normal"))):
            out = os.path.join(dp, f"trimap_{kind}")
            log.info("TriMap %s video -> %s", kind, out)
            vi_main(["--first_image", os.path.join(d, "0001.png"),
                     "--last_image", os.path.join(d, "0002.png"),
                     "--prompt", args.prompt,
                     "--output_path", out]
                    + (["--checkpoint", args.checkpoint]
                       if args.checkpoint else [])
                    + (["--tiny"] if args.tiny else [])
                    + (["--zero-weights"] if args.full_random else []))
        stage_t["2_trimap_x3"] = round(time.perf_counter() - t0, 1)

    # ---- stages 3+4: preprocess + field construction -------------------
    if os.path.exists(os.path.join(seg_key, "colors.npy")):
        shutil.copy(os.path.join(seg_key, "colors.npy"),
                    os.path.join(dp, "colors.npy"))
    paths = PipelinePaths(
        data_path=dp,
        rgb_video_path=os.path.join(dp, "trimap_rgb"),
        seg_video_path=os.path.join(dp, "trimap_seg"),
        normal_video_path=os.path.join(dp, "trimap_normal"),
        skip_video_process=args.skip_trimap,
        skip_pose_estimate=os.path.isdir(os.path.join(dp, "camera")))
    pipe = FieldConstructionPipeline(paths, ae_epochs=args.ae_epochs)
    if args.pose_optim_iter is not None:
        pipe.cfg.render.pose_optim_iter = args.pose_optim_iter
    if args.full_random:
        if vggt_params is None:                  # re-init post-trimap
            import jax
            import jax.numpy as jnp
            from langscenex_tpu.models.vggt import VGGT
            vggt_params = VGGT(vggt_cfg).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 1, 3, 28, 28)))
        pipe.vggt_params, pipe.vggt_cfg = vggt_params, vggt_cfg
        from langscenex_tpu.models.clip_dense import (CLIPVisionConfig,
                                                      CLIPVisionDense,
                                                      ClipDenseExtractor)
        import jax
        import jax.numpy as jnp
        ccfg = CLIPVisionConfig()             # full ViT-L/14 shape
        cp = CLIPVisionDense(ccfg).init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, ccfg.image_size, ccfg.image_size, 3)))["params"]
        pipe.lang_extractor = ClipDenseExtractor(cp, ccfg)
    if args.tiny:
        pipe.vggt_params, pipe.vggt_cfg = vggt_params, vggt_cfg
        pipe.pose_target_wh = (96, 64)
        from langscenex_tpu.models.clip_dense import (CLIPVisionConfig,
                                                      CLIPVisionDense,
                                                      ClipDenseExtractor)
        import jax
        import jax.numpy as jnp
        ccfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                                num_layers=2, num_heads=4, patch_size=14,
                                image_size=28, projection_dim=16)
        cp = CLIPVisionDense(ccfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 3)))["params"]
        pipe.lang_extractor = ClipDenseExtractor(cp, ccfg, max_side=28)
    if not args.skip_train:
        t0 = time.perf_counter()
        pipe.preprocess()
        stage_t["3_preprocess"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        pipe.construct_field(iterations=args.iterations)
        stage_t["4_field"] = round(time.perf_counter() - t0, 1)
    if args.render:
        t0 = time.perf_counter()
        pipe.render_result(load_iteration=args.iterations)
        stage_t["5a_render"] = round(time.perf_counter() - t0, 1)
    if args.eval:
        t0 = time.perf_counter()
        results = pipe.eval(load_iteration=args.iterations)
        for r in results:
            log.info("eval %s", r)
        stage_t["5b_eval"] = round(time.perf_counter() - t0, 1)
    stage_t["total"] = round(time.perf_counter() - t_all, 1)
    log.info("stage wall-clock: %s", json.dumps(stage_t))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
