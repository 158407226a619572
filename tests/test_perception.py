"""Perception pipeline tests: depth back-projection consistency with the
renderer, voxel downsampling, outlier removal, and state extraction from
synthetic rendered frames."""

import numpy as np
import jax.numpy as jnp

from adaptigraph_tpu.engine.state import SHAPE_PLANE, make_shapes
from adaptigraph_tpu.planning.perception import (
    PerceptionModule, depth_mask_segmenter, depth_to_points,
    remove_statistical_outliers, voxel_downsample)
from adaptigraph_tpu.sim.cameras import CameraRig, view_matrix
from adaptigraph_tpu.sim.render import render_frame
from adaptigraph_tpu.sim.env import _fwd_from_angle


def _render_cloud(points, size=128):
    """Render a particle cloud from camera view 1 and return the frame +
    camera params (scaled intrinsics)."""
    rig = CameraRig(size, size)
    pos, ang = rig.single_view(1)
    fwd = _fwd_from_angle(ang)
    shapes = make_shapes([SHAPE_PLANE], [[0, 0, 0]], [[0, 0, 0]], [[0, 0, 0, 1]],
                         m_max=2)
    intr = rig.intrinsics()  # CameraRig(size) intrinsics are already size-correct
    img = render_frame(jnp.array(points), jnp.full((len(points), 3), 0.8),
                       jnp.ones(len(points), bool), shapes,
                       jnp.array(pos, jnp.float32), jnp.array(fwd), jnp.array(intr),
                       width=size, height=size, point_radius=0.1)
    extr = view_matrix(pos, ang)
    return np.asarray(img), intr, extr


class TestBackprojection:
    def test_roundtrip_through_renderer(self):
        """Render particles above the table -> segment -> back-project: the
        recovered cloud must sit near the original particles."""
        pts = np.array([[0.0, 1.0, 0.0], [0.5, 1.1, 0.3], [-0.4, 0.9, -0.2]],
                       np.float32)
        img, intr, extr = _render_cloud(pts)
        depth = img[..., 4]
        mask = depth_mask_segmenter(img[..., :3], depth, 0.5, intr, extr)
        assert mask.sum() > 0
        cloud = depth_to_points(depth, intr, extr, mask=mask)
        assert len(cloud) > 0
        # every recovered point within ~particle radius of an input particle
        d = np.linalg.norm(cloud[:, None] - pts[None], axis=-1).min(1)
        assert np.quantile(d, 0.9) < 0.2

    def test_floor_points_rejected_by_segmenter(self):
        pts = np.array([[0.0, 1.0, 0.0]], np.float32)
        img, intr, extr = _render_cloud(pts)
        depth = img[..., 4]
        mask = depth_mask_segmenter(img[..., :3], depth, 0.5, intr, extr)
        cloud = depth_to_points(depth, intr, extr, mask=mask)
        assert (cloud[:, 1] > 0.5).all()  # nothing below the table height


class TestCloudOps:
    def test_voxel_downsample_merges(self):
        pts = np.array([[0.0, 0, 0], [0.001, 0, 0], [1.0, 0, 0]], np.float64)
        out = voxel_downsample(pts, 0.1)
        assert len(out) == 2

    def test_outlier_removal(self):
        rng = np.random.RandomState(0)
        cluster = rng.randn(100, 3) * 0.05
        outlier = np.array([[10.0, 10.0, 10.0]])
        pts = np.concatenate([cluster, outlier])
        out = remove_statistical_outliers(pts, k=10, std_ratio=2.0)
        assert len(out) <= 100
        assert np.abs(out).max() < 5.0


class TestStateExtraction:
    def test_get_state_cur_from_render(self):
        rng = np.random.RandomState(3)
        pts = (rng.rand(200, 3) * np.array([1.5, 0.1, 1.5])
               + np.array([-0.7, 0.9, -0.7])).astype(np.float32)
        img, intr, extr = _render_cloud(pts)
        task = {"fps_radius": 0.2, "max_nobj": 50, "k_filter": 1.0}
        pm = PerceptionModule(task, voxel=0.05)
        state, cloud = pm.get_state_cur(img[None, ..., :3], img[None, ..., 4],
                                        intr[None], extr[None],
                                        rng=np.random.RandomState(0))
        assert 0 < len(state) <= 50
        # keypoints lie near the object cloud
        d = np.linalg.norm(state[:, None] - pts[None], axis=-1).min(1)
        assert np.quantile(d, 0.9) < 0.3


class TestGroundingSAMSeam:
    """Interface-contract test of the open-vocab segmentation pipeline with
    injected fakes (the real weights are env-gated; perception.py:24-148)."""

    def _fake_pipeline(self, h=32, w=32):
        # two overlapping detections of the object + one table detection
        obj_mask = np.zeros((h, w), bool)
        obj_mask[8:20, 10:22] = True
        obj_mask_dup = np.zeros((h, w), bool)
        obj_mask_dup[8:20, 10:21] = True  # ~0.92 IoU duplicate
        table_mask = np.zeros((h, w), bool)
        table_mask[20:, :] = True

        boxes = np.array([[10, 8, 22, 20], [10, 8, 21, 20], [0, 20, 32, 32]],
                         np.float32)
        scores = np.array([0.9, 0.8, 0.95], np.float32)
        phrases = ["deformable object", "deformable object", "table"]
        masks = {0: obj_mask, 1: obj_mask_dup, 2: table_mask}

        calls = {"set_image": 0}

        def detector(rgb):
            assert rgb.dtype == np.uint8
            return boxes, scores, phrases

        class Pred:
            def set_image(self, rgb):
                calls["set_image"] += 1

            def predict(self, box):
                for i, b in enumerate(boxes):
                    if np.allclose(box, b):
                        return masks[i]
                raise AssertionError("unknown box")

        return detector, Pred(), obj_mask, table_mask, calls

    def test_union_excludes_table_and_dedupes(self):
        from adaptigraph_tpu.planning.segmentation import GroundingSAMSegmenter

        det, pred, obj_mask, table_mask, calls = self._fake_pipeline()
        seg = GroundingSAMSegmenter(det, pred, prompts=("deformable object",),
                                    table_prompts=("table",))
        depth = np.ones((32, 32), np.float32)
        out = seg(np.zeros((32, 32, 3), np.uint8), depth, 0.5,
                  np.array([30.0, 30, 16, 16]), np.eye(4))
        assert calls["set_image"] == 1
        assert (out == obj_mask).all()  # table excluded, duplicate merged
        # depth-invalid pixels never survive
        depth2 = depth.copy()
        depth2[8:10] = 0.0
        out2 = seg(np.zeros((32, 32, 3), np.uint8), depth2, 0.5,
                   np.array([30.0, 30, 16, 16]), np.eye(4))
        assert not out2[8:10].any() and out2[10:20, 10:22].any()

    def test_box_threshold_filters(self):
        from adaptigraph_tpu.planning.segmentation import GroundingSAMSegmenter

        det, pred, *_ = self._fake_pipeline()
        seg = GroundingSAMSegmenter(det, pred, box_threshold=0.99)
        out = seg(np.zeros((32, 32, 3), np.uint8), np.ones((32, 32), np.float32),
                  0.5, np.array([30.0, 30, 16, 16]), np.eye(4))
        assert not out.any()  # every detection below threshold

    def test_iou_dedupe_rule(self):
        from adaptigraph_tpu.planning.segmentation import iou_dedupe

        a = np.zeros((8, 8), bool); a[:4] = True
        b = a.copy()
        c = ~a
        keep = iou_dedupe([a, b, c], [0.5, 0.9, 0.7], iou_thresh=0.9)
        assert set(keep) == {1, 2} and keep[0] == 1  # best-first, dup dropped

    def test_plugs_into_perception_module(self):
        from adaptigraph_tpu.planning.perception import PerceptionModule
        from adaptigraph_tpu.planning.segmentation import GroundingSAMSegmenter

        det, pred, *_ = self._fake_pipeline()
        seg = GroundingSAMSegmenter(det, pred)
        pm = PerceptionModule({"fps_radius": 0.05, "max_nobj": 20},
                              segmenter=seg)
        depth = np.full((32, 32), 2.0, np.float32)
        intr = np.array([30.0, 30.0, 16.0, 16.0])
        extr = np.eye(4)
        pts = pm.get_tabletop_points([np.zeros((32, 32, 3), np.uint8)],
                                     [depth], [intr], [extr])
        assert pts.ndim == 2 and pts.shape[1] == 3


class TestClothPerception:
    def test_splatted_cloth_state_extraction(self):
        """N7 caveat retirement: our renderer splats cloth as particles
        (reference draws a shaded mesh, by_softgym_cloth.h render_mode 2) —
        perception over the splatted frames must still recover the cloth's
        spatial extent. Build a real cloth scene, render the capture view,
        run the full PerceptionModule pipeline, and check the extracted
        keypoints cover the cloth's bbox."""
        from adaptigraph_tpu.scenes import build_scene
        from adaptigraph_tpu.planning.perception import PerceptionModule

        b = build_scene("cloth", np.random.RandomState(7))
        pos = np.asarray(b.state.particles.pos)[: b.n_active]
        # lift to a typical tabletop height band like the settled scene
        img, intr, extr = _render_cloud(pos, size=160)
        pm = PerceptionModule({"fps_radius": 0.2, "max_nobj": 100},
                              table_height=0.0, voxel=0.05,
                              workspace=((-5, 5), (0.0, 5), (-5, 5)))
        state, raw = pm.get_state_cur(img[None, ..., :3], img[None, ..., 4],
                                      [intr], [extr])
        assert len(state) >= 10, f"too few cloth keypoints: {len(state)}"
        # extracted extent must cover most of the true cloth footprint
        ext_true = pos[:, [0, 2]].max(0) - pos[:, [0, 2]].min(0)
        ext_perc = state[:, [0, 2]].max(0) - state[:, [0, 2]].min(0)
        assert (ext_perc > 0.6 * ext_true).all(), (ext_perc, ext_true)
        # and keypoints must lie near the cloth surface
        d = np.abs(state[:, 1].mean() - pos[:, 1].mean())
        assert d < 0.3
