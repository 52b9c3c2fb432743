"""FieldConstructionPipeline: the stage-3/4 orchestration driver.

Parity targets: field_construction/pipeline.py:8-31
(FieldConstructionPipeline.{construct_field, render_result, eval}),
Preprocessor.preprocess (preprocessor.py:296-316), VideoPreprocessor
(video_preprocessor/__init__.py:14-48: ffmpeg frame extraction + seg-video
-> nearest-palette-color id maps), and the view-selection subsample
(preprocessor.py select_valid_data:257-294).

All stages communicate through the reference's exact filesystem contract
(SURVEY.md §1): data_path/{input, normal, camera, lang_features,
lang_features_dim3}/, colors.npy, points3D.ply — so artifacts
interchange with the reference pipeline byte-for-byte where formats allow.
"""
from __future__ import annotations

import dataclasses
import logging
import os
import shutil
import subprocess
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)


@dataclasses.dataclass
class PipelinePaths:
    data_path: str
    rgb_video_path: str = ""
    seg_video_path: str = ""
    normal_video_path: str = ""
    model_path: str = ""
    skip_video_process: bool = False
    skip_pose_estimate: bool = False
    skip_lang_feature_extraction: bool = False
    # language-feature extractor checkpoints (either may be empty):
    openseg_path: str = ""    # TF SavedModel dir (preprocessor.py:22-34)
    clip_ckpt: str = ""       # torch CLIPVisionModelWithProjection ckpt
    # LSeg alternate branch (preprocessor.py:112-138, 229-255): when
    # feature_extractor_type == "lseg", per-frame 512-d features are
    # VQ-compressed to lang_features_dim4/*_f.npy instead of the
    # OpenSeg->AE dim3 path. sem_ae_ckpt = the diffusers-VQModel
    # safetensors/ckpt the reference loads at preprocessor.py:129.
    feature_extractor_type: str = "openseg"
    lseg_ckpt: str = ""
    sem_ae_ckpt: str = ""


class VideoPreprocessor:
    """Frame extraction + seg-video to id-map conversion."""

    def __init__(self, paths: PipelinePaths, img_format: str = "png"):
        self.paths = paths
        self.img_format = img_format

    def video_process(self) -> None:
        self.extract_frames(self.paths.rgb_video_path, "input")
        if self.paths.normal_video_path:
            self.extract_frames(self.paths.normal_video_path, "normal")
        if self.paths.seg_video_path:
            self.extract_masks("lang_features_dim3")

    def extract_frames(self, video_path: str, dir_name: str) -> None:
        """ffmpeg frame dump (video_preprocessor/__init__.py:26-31);
        falls back to copying an existing frame directory when ffmpeg is
        unavailable or the input is already a directory."""
        out_dir = os.path.join(self.paths.data_path, dir_name)
        os.makedirs(out_dir, exist_ok=True)
        if os.path.isdir(video_path):
            for i, fn in enumerate(sorted(os.listdir(video_path))):
                shutil.copy(os.path.join(video_path, fn),
                            os.path.join(out_dir, f"{i + 1:04d}.{self.img_format}"))
            return
        if shutil.which("ffmpeg") is None:
            raise RuntimeError(
                "ffmpeg not available and input is not a frame directory")
        subprocess.run(
            ["ffmpeg", "-y", "-i", video_path,
             os.path.join(out_dir, f"%04d.{self.img_format}")],
            check=True, capture_output=True)

    def extract_masks(self, save_dir_name: str) -> None:
        """seg keyframe video/frames -> per-frame nearest-palette-color id
        maps *_s.npy (video_preprocessor/__init__.py:33-48)."""
        colors = np.load(os.path.join(self.paths.data_path, "colors.npy"))
        colors = colors.astype(np.float32) / 255.0
        frames = self._load_video_or_dir(self.paths.seg_video_path)
        save_path = os.path.join(self.paths.data_path, save_dir_name)
        os.makedirs(save_path, exist_ok=True)
        for idx, frame in enumerate(frames):
            f = frame.astype(np.float32) / 255.0      # [H,W,3]
            d = ((f[:, :, None, :] - colors[None, None]) ** 2).sum(-1)
            mask = np.argmin(d, axis=-1) - 1           # -1 = background
            np.save(os.path.join(save_path, f"{idx + 1:04d}_s.npy"), mask)

    def _load_video_or_dir(self, path: str):
        from PIL import Image
        if os.path.isdir(path):
            for fn in sorted(os.listdir(path)):
                yield np.asarray(Image.open(os.path.join(path, fn)))[..., :3]
        else:
            tmp = os.path.join(self.paths.data_path, "_segframes")
            self.extract_frames(path, "_segframes")
            for fn in sorted(os.listdir(tmp)):
                yield np.asarray(Image.open(os.path.join(tmp, fn)))[..., :3]
            shutil.rmtree(tmp, ignore_errors=True)


def select_valid_data(data_path: str, chunk_num: int, keep_per_chunk: int,
                      dirs=("input", "normal")) -> None:
    """Uniform chunked frame subsample; renumbers frames and the _f/_s
    pairs (preprocessor.py:257-294). Moves raw dirs to *_raw."""
    input_dir = os.path.join(data_path, "input")
    names = sorted(os.listdir(input_dir))
    n = len(names)
    chunk = max(n // chunk_num, 1)
    keep_idx = []
    for c in range(0, n, chunk):
        keep_idx.extend(range(c, min(c + keep_per_chunk, n)))
    keep_idx = sorted(set(keep_idx))

    for d in list(dirs) + ["lang_features_dim3"]:
        src = os.path.join(data_path, d)
        if not os.path.isdir(src):
            continue
        raw = os.path.join(data_path, d + "_raw")
        if os.path.isdir(raw):
            shutil.rmtree(raw)
        os.rename(src, raw)
        os.makedirs(src)
        files = sorted(os.listdir(raw))
        by_stem = {}
        for fn in files:
            stem = fn.split("_")[0].split(".")[0]
            by_stem.setdefault(stem, []).append(fn)
        stems = sorted(by_stem)
        for new_i, old_i in enumerate(keep_idx):
            if old_i >= len(stems):
                break
            for fn in by_stem[stems[old_i]]:
                suffix = fn[len(stems[old_i]):]
                shutil.copy(os.path.join(raw, fn),
                            os.path.join(src, f"{new_i + 1:04d}{suffix}"))


class FieldConstructionPipeline:
    """Top-level driver (pipeline.py:8-31): preprocess -> train / render /
    eval on the filesystem contract."""

    def __init__(self, paths: PipelinePaths, gaussian_cfg=None,
                 pose_estimator: str = "vggt", ae_epochs: int = 400):
        from .utils.config import GaussianConfig
        self.paths = paths
        self.cfg = gaussian_cfg or GaussianConfig()
        self.pose_estimator = pose_estimator
        self.ae_epochs = ae_epochs
        # injectable model handles (tests / quick_start --tiny set these;
        # production paths load converted checkpoints)
        self.vggt_params = None
        self.vggt_cfg = None
        self.pose_target_wh = (720, 480)
        self.lang_extractor = None

    # -------------------------------------------------------- preprocess
    def preprocess(self, lang_features: bool = True) -> None:
        p = self.paths
        if not p.skip_video_process:
            VideoPreprocessor(p).video_process()
        if not p.skip_pose_estimate:
            self.estimate_poses()
        if not p.skip_lang_feature_extraction and lang_features:
            self.extract_language_features()

    def estimate_poses(self) -> None:
        """Pose init through the estimator factory (pose_estimator/
        __init__.py:296-303). Default "vggt" (:227-294) writes
        camera/%04d.npz {pose(c2w), intrinsics} + points3D.ply;
        "mast3r"/"cut3r" produce the dense-init COLMAP export tree;
        "colmap" shells out to the colmap binary."""
        from .pose_estimation import (estimate_poses_colmap,
                                      estimate_poses_dense_init,
                                      estimate_poses_vggt, get_pose_estimator)
        est = get_pose_estimator(self.pose_estimator)
        if est is estimate_poses_vggt:
            est(self.paths.data_path, params=self.vggt_params,
                cfg=self.vggt_cfg, target_wh=self.pose_target_wh)
        elif est is estimate_poses_dense_init:
            est(self.paths.data_path, params=self.vggt_params,
                cfg=self.vggt_cfg)
        elif est is estimate_poses_colmap:
            est(self.paths.data_path)
        else:  # future estimators: generic call
            est(self.paths.data_path)

    def extract_language_features(self, extractor=None) -> None:
        """Language feature lifting + per-scene AE compression
        (preprocessor.py:22-227). Feature source priority: precomputed
        lang_features/ rows -> explicit ``extractor`` -> OpenSeg TF
        SavedModel (paths.openseg_path) -> native CLIP dense extractor
        (paths.clip_ckpt; models/clip_dense). The AE training + per-pixel
        scatter then runs on the pooled rows."""
        from .train.ae import generate_dim3_features
        if self.paths.feature_extractor_type == "lseg":
            self._extract_lseg_features()
            return
        lf = os.path.join(self.paths.data_path, "lang_features")
        seg = os.path.join(self.paths.data_path, "lang_features_dim3")
        if not os.path.isdir(lf) or not os.listdir(lf):
            extractor = (extractor or self.lang_extractor
                         or self._make_lang_extractor())
            if extractor is None:
                log.warning(
                    "lang_features/ missing and no extractor configured "
                    "(set openseg_path or clip_ckpt); skipping AE stage")
                return
            from .models.openseg import extract_scene_features
            extract_scene_features(self.paths.data_path, extractor=extractor)
        generate_dim3_features(lf, seg, seg, num_epochs=self.ae_epochs)

    def _extract_lseg_features(self) -> None:
        """The reference's LSeg branch (preprocessor.py:229-255): LSeg
        512-d dense features -> VQ encoder -> lang_features_dim4/. The
        upstream path is import-broken (cogvideox_interpolation.lseg is
        absent from the reference tree) and its dim4 artifacts are
        unconsumed by the cameras; this port mirrors the surface."""
        import jax
        from .models.lseg import (LSegFeatureExtractor,
                                  generate_lang_features_with_lseg)
        from .models.vq_model import VQModel
        p = self.paths
        if not (p.lseg_ckpt and os.path.exists(p.lseg_ckpt)):
            log.warning("feature_extractor_type=lseg but lseg_ckpt "
                        "missing; skipping LSeg stage")
            return
        lseg = LSegFeatureExtractor.from_torch_checkpoint(p.lseg_ckpt)
        vq = VQModel()
        import jax.numpy as jnp
        if p.sem_ae_ckpt and os.path.exists(p.sem_ae_ckpt):
            from .convert_cli import load_state_dict
            from .utils.convert import convert_vq_model
            vq_params = jax.tree_util.tree_map(
                jnp.asarray, convert_vq_model(load_state_dict(p.sem_ae_ckpt)))
        else:
            log.warning("sem_ae_ckpt missing; using random-init VQ "
                        "compressor (shape-correct, not semantic)")
            vq_params = vq.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 32, 32, 512)))
        n = generate_lang_features_with_lseg(p.data_path, lseg, vq,
                                             vq_params)
        log.info("LSeg branch wrote %d lang_features_dim4 maps", n)

    def _make_lang_extractor(self):
        p = self.paths
        if p.openseg_path and os.path.isdir(p.openseg_path):
            from .models.openseg import OpenSegExtractor
            return OpenSegExtractor(p.openseg_path)
        if p.clip_ckpt and os.path.exists(p.clip_ckpt):
            from .models.clip_dense import ClipDenseExtractor
            return ClipDenseExtractor.from_torch_checkpoint(p.clip_ckpt)
        return None

    # ------------------------------------------------------------- train
    def construct_field(self, iterations: Optional[int] = None):
        from .ops.rasterize import RasterConfig
        from .scene.dataset_readers import load_scene
        from .scene.gaussians import create_from_points
        from .train.field import GaussianFieldTrainer
        info = load_scene(self.paths.data_path, kind="cut3r")
        splats = create_from_points(info.points, info.colors,
                                    self.cfg.dataset.sh_degree)
        # pp-optimizer confidence (gaussian_field.py:128-136: load
        # sparse/0/confidence_dsp.npy; on failure fall back to plain Adam)
        confidence = None
        if self.cfg.opt.pp_optimizer:
            import dataclasses as _dc

            import jax.numpy as _jnp

            from .train.per_point_adam import confidence_lr as _clr
            cpath = os.path.join(self.paths.data_path, "sparse/0",
                                 "confidence_dsp.npy")
            try:
                conf = np.load(cpath).reshape(-1)
                if conf.shape[0] != splats.capacity:
                    pad = np.zeros(splats.capacity, np.float32)
                    pad[:min(len(conf), splats.capacity)] = \
                        conf[:splats.capacity]
                    conf = pad
                confidence = _clr(_jnp.asarray(conf), scale=(2.0, 100.0))
            except Exception:
                log.warning("can not load confidence; disabling "
                            "pp_optimizer")
                self.cfg.opt = _dc.replace(self.cfg.opt,
                                           pp_optimizer=False) \
                    if _dc.is_dataclass(self.cfg.opt) else self.cfg.opt
                try:
                    self.cfg.opt.pp_optimizer = False
                except Exception:
                    pass
        lang_dir = os.path.join(self.paths.data_path,
                                self.cfg.dataset.language_features_name)
        trainer = GaussianFieldTrainer(
            info.cameras, splats, self.cfg.opt,
            scene_extent=info.nerf_norm_radius,
            sh_degree_max=self.cfg.dataset.sh_degree,
            white_background=self.cfg.dataset.white_background,
            lang_dir=lang_dir if os.path.isdir(lang_dir) else None,
            confidence_lr=confidence)
        out_dir = self.paths.model_path or os.path.join(
            self.paths.data_path, "output")
        start_it = 0
        if self.cfg.start_checkpoint:
            # resume the full TrainState (gaussian_field.py:146-149)
            from .train.checkpoint import restore_checkpoint
            trainer.state, start_it = restore_checkpoint(
                self.cfg.start_checkpoint, trainer.state)
            log.info("resumed from %s at iteration %d",
                     self.cfg.start_checkpoint, start_it)
        final_it = iterations or self.cfg.opt.iterations
        trainer.save_pose_org(
            out_dir, tuple(self.cfg.save_iterations) + (final_it,))
        state, metrics = trainer.train(
            iterations=iterations, save_dir=out_dir,
            first_iteration=start_it + 1,
            test_iterations=self.cfg.test_iterations,
            collage_interval=200,
            save_iterations=self.cfg.save_iterations,
            checkpoint_iterations=self.cfg.checkpoint_iterations)
        # save splat PLY + optimized poses (gaussian_field.py:516-549)
        from .scene.ply_io import save_ply
        out = self.paths.model_path or os.path.join(self.paths.data_path,
                                                    "output")
        it = iterations or self.cfg.opt.iterations
        save_ply(state.splats,
                 os.path.join(out, f"point_cloud/iteration_{it}",
                              "point_cloud.ply"))
        os.makedirs(os.path.join(out, f"pose/iter_{it}"), exist_ok=True)
        np.save(os.path.join(out, f"pose/iter_{it}/pose_optimized.npy"),
                trainer.poses_as_matrices())
        # render_camera/*.npz from the optimized poses
        # (gaussian_field.py:553-559 -> pose_utils.post_pose_process)
        cam_dir = os.path.join(self.paths.data_path, "camera")
        if os.path.isdir(cam_dir) and os.listdir(cam_dir):
            from .utils.camera_paths import post_pose_process
            eg = os.path.join(cam_dir, sorted(os.listdir(cam_dir))[0])
            post_pose_process(
                np.asarray(state.poses), eg,
                os.path.join(self.paths.data_path, "render_camera"))
        return state, metrics

    # ------------------------------------------------------------ render
    def render_result(self, load_iteration: Optional[int] = None):
        from .ops.rasterize import RasterConfig
        from .scene.dataset_readers import load_scene
        from .scene.ply_io import load_ply
        from .train.render_mode import render_result
        out = self.paths.model_path or os.path.join(self.paths.data_path,
                                                    "output")
        it = load_iteration or self.cfg.render.load_iteration
        splats = load_ply(os.path.join(
            out, f"point_cloud/iteration_{it}", "point_cloud.ply"),
            self.cfg.dataset.sh_degree)
        info = load_scene(self.paths.data_path, kind="cut3r", shuffle=False)
        render_result(splats, info.cameras,
                      os.path.join(out, f"renders/iteration_{it}"),
                      sh_degree=self.cfg.dataset.sh_degree,
                      voxel_size=self.cfg.render.voxel_size)

    # -------------------------------------------------------------- eval
    def eval(self, load_iteration: Optional[int] = None):
        from .scene.dataset_readers import load_scene
        from .scene.ply_io import load_ply
        out = self.paths.model_path or os.path.join(self.paths.data_path,
                                                    "output")
        it = load_iteration or self.cfg.render.load_iteration
        splats = load_ply(os.path.join(
            out, f"point_cloud/iteration_{it}", "point_cloud.ply"),
            self.cfg.dataset.sh_degree)
        info = load_scene(self.paths.data_path, kind="cut3r", shuffle=False)
        from .train.render_mode import eval_result
        results = eval_result(
            splats, info.cameras, out,
            pose_optim_iters=self.cfg.render.pose_optim_iter)
        for r in results:
            log.info("eval %s psnr=%.2f", r["camera"], r["psnr"])
        return results
