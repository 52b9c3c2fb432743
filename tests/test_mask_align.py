"""Auto-mask-align driver: reference NMS semantics + keyframe loop with
incremental (cached) propagation on a tiny random SAM2."""
import numpy as np
import jax.numpy as jnp

from langscenex_tpu.ops.connected import mask_nms_reference
from langscenex_tpu.autoseg.mask_align import (MaskAligner, MaskAlignConfig,
                                               nms_proposals,
                                               no_mask_area_ratio,
                                               search_new_objects,
                                               generate_distinct_colors,
                                               save_outputs)


class TestReferenceNMS:
    def test_duplicate_suppressed(self):
        m = np.zeros((3, 16, 16), bool)
        m[0, :8] = True
        m[1, :8] = True          # duplicate of 0, lower score
        m[2, 8:] = True
        keep = np.asarray(mask_nms_reference(
            jnp.asarray(m), jnp.array([0.9, 0.8, 0.85]),
            iou_thr=0.7, score_thr=0.1, inner_thr=0.2))
        assert keep.tolist() == [True, False, True]

    def test_score_threshold(self):
        m = np.zeros((2, 8, 8), bool)
        m[0, :4] = True
        m[1, 4:] = True
        keep = np.asarray(mask_nms_reference(
            jnp.asarray(m), jnp.array([0.9, 0.05]),
            iou_thr=0.7, score_thr=0.1, inner_thr=0.2))
        assert keep.tolist() == [True, False]

    def test_inner_containment(self):
        """A small mask almost fully contained in a larger higher-scored
        mask trips the inner-IoU criterion (I/a_small >= 0.85,
        I/a_big < 0.5)."""
        m = np.zeros((2, 16, 16), bool)
        m[0, :12] = True                  # big, area 192
        m[1, 2:6, 2:6] = True             # small inside, area 16
        keep = np.asarray(mask_nms_reference(
            jnp.asarray(m), jnp.array([0.9, 0.8]),
            iou_thr=0.7, score_thr=0.1, inner_thr=0.5))
        # inner value = 1 - (16/192)*(16/16) ~ 0.92 > 1-0.5 -> suppressed
        assert keep.tolist() == [True, False]

    def test_fallback_keeps_top3(self):
        """If a criterion would suppress everything, the top-3 scored
        masks survive it (reference :115-123)."""
        m = np.zeros((4, 8, 8), bool)
        for i in range(4):
            m[i, 2 * i:2 * i + 2] = True
        keep = np.asarray(mask_nms_reference(
            jnp.asarray(m), jnp.array([0.05, 0.04, 0.03, 0.02]),
            iou_thr=0.7, score_thr=0.1, inner_thr=0.2))
        assert keep.sum() == 3
        assert keep.tolist()[:3] == [True, True, True]

    def test_nms_proposals_scoring(self):
        entries = [
            {"segmentation": np.ones((8, 8), bool),
             "predicted_iou": 0.9, "stability_score": 0.9},
            {"segmentation": np.ones((8, 8), bool),
             "predicted_iou": 0.95, "stability_score": 0.2},
        ]
        out = nms_proposals(entries, 0.8, 0.7, 0.5)
        assert len(out) == 1
        assert out[0]["predicted_iou"] == 0.9


class TestHelpers:
    def test_no_mask_ratio(self):
        m = np.zeros((10, 10), bool)
        m[:5] = True
        assert abs(no_mask_area_ratio([m]) - 0.5) < 1e-6
        assert no_mask_area_ratio([]) == 1.0

    def test_search_new_objects_claims_gap(self):
        prev = [np.zeros((20, 20), bool)]
        prev[0][:10] = True
        p1 = np.zeros((20, 20), bool)
        p1[12:18, :] = True                     # uncovered, big
        p2 = p1.copy()                          # duplicate claims nothing
        props = [{"segmentation": p1}, {"segmentation": p2}]
        out = search_new_objects(prev, props, ratio=0.5, min_area=50)
        assert len(out) == 1

    def test_colors_distinct(self):
        c = generate_distinct_colors(16)
        assert c.shape == (16, 3)
        assert len({tuple(x) for x in c}) == 16

    def test_save_outputs(self, tmp_path):
        seg = np.full((2, 8, 8), -1, np.int32)
        seg[0, :4] = 0
        seg[1, 4:] = 1
        save_outputs(seg, generate_distinct_colors(2), str(tmp_path))
        import os
        assert os.path.exists(tmp_path / "colors.npy")
        assert os.path.exists(tmp_path / "0001_s.npy")
        assert os.path.exists(tmp_path / "key_0001.png")
        got = np.load(tmp_path / "0002_s.npy")
        np.testing.assert_array_equal(got, seg[1])


class TestAlignerEndToEnd:
    def test_run_on_tiny_sam2(self, tmp_path):
        import jax
        from langscenex_tpu.models.sam2.model import (SAM2,
                                                      SAM2VideoPredictor)
        from langscenex_tpu.models.sam2.amg import (AutomaticMaskGenerator,
                                                    AMGConfig)
        from test_sam2 import TINY, _init_sam2

        model = SAM2(TINY)
        params = _init_sam2(model)
        frames = np.random.default_rng(0).uniform(
            0, 1, (3, 3, 64, 64)).astype(np.float32)
        amg = AutomaticMaskGenerator(
            model, params,
            AMGConfig(points_per_side=2, points_per_batch=4,
                      pred_iou_thresh=-1e9, stability_score_thresh=-1e9,
                      min_mask_area=0))
        pred = SAM2VideoPredictor(model, params)
        aligner = MaskAligner(amg, pred, MaskAlignConfig(
            detect_stride=1, max_objects=4, new_obj_min_area=4,
            postnms_score=-1e9))
        seg_maps, colors = aligner.run(frames)
        assert seg_maps.shape == (3, 64, 64)
        assert colors.ndim == 2 and colors.shape[1] == 3
        save_outputs(seg_maps, colors, str(tmp_path))
        assert (tmp_path / "0003_s.npy").exists()


class TestColorsRoundTrip:
    def test_save_outputs_extract_masks_roundtrip(self, tmp_path):
        """colors.npy carries the background row (post_colors contract,
        auto-mask-align.py:609-611): painting keyframes with the palette
        and re-extracting ids via the video preprocessor's nearest-color
        map must reproduce the original seg ids."""
        import os
        from PIL import Image
        from langscenex_tpu.pipeline import PipelinePaths, VideoPreprocessor

        rng = np.random.default_rng(0)
        seg = rng.integers(-1, 3, (2, 16, 20)).astype(np.int32)
        colors = generate_distinct_colors(3)
        out = tmp_path / "seg"
        save_outputs(seg, colors, str(out), keyframes=(0, 1))

        pal = np.load(out / "colors.npy")
        assert pal.shape[0] == 4 and (pal[0] == 0).all()

        # paint frames from seg via the palette, then extract
        data = tmp_path / "data"
        frames = data / "frames"
        os.makedirs(frames)
        np.save(data / "colors.npy", pal)
        for t in range(2):
            img = np.zeros((16, 20, 3), np.uint8)
            for oid in range(3):
                img[seg[t] == oid] = pal[oid + 1]
            Image.fromarray(img).save(frames / f"{t + 1:04d}.png")
        paths = PipelinePaths(data_path=str(data),
                              seg_video_path=str(frames))
        VideoPreprocessor(paths).extract_masks("lang_features_dim3")
        for t in range(2):
            got = np.load(data / "lang_features_dim3" / f"{t + 1:04d}_s.npy")
            np.testing.assert_array_equal(got, seg[t])
