"""Perception: multi-camera RGB-D -> object point cloud -> graph state.

Port of src/planning/perception.py (PerceptionModule): the reference fuses
4 RealSense views, segments the object with GroundingDINO + SAM
(:68-148), crops to the tabletop workspace, voxel-downsamples, removes
outliers (:151-256), and converts the fused cloud to sim coordinates + FPS
graph state (:318-349).

Here the geometric pipeline (depth back-projection, workspace crop, voxel
downsample, statistical outlier removal, height filter, FPS) is implemented
natively (numpy/JAX, no open3d); the open-vocabulary segmentation stage is a
pluggable `segmenter` callable — `depth_mask_segmenter` works out of the box
for sim frames (anything above the table that isn't background), and a
GroundingDINO/SAM torch wrapper can be injected on hardware rigs.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

from adaptigraph_tpu.utils.host_fps import fps_rad_idx, fps_with_idx


def depth_to_points(depth_m: np.ndarray, intr: np.ndarray, extr: np.ndarray,
                    mask: np.ndarray | None = None) -> np.ndarray:
    """Back-project a depth map to WORLD points.

    depth_m: (H, W) metric depth (0 = invalid); intr: [fx, fy, cx, cy];
    extr: (4, 4) GL view matrix (world->cam). Inverts the renderer's
    projection (sim.render): x_cam = (u-cx)/fx * z, y_cam = -(v-cy)/fy * z,
    z_cam = -z.
    """
    h, w = depth_m.shape
    fx, fy, cx, cy = intr
    vv, uu = np.mgrid[0:h, 0:w]
    z = depth_m
    valid = z > 0
    if mask is not None:
        valid &= mask.astype(bool)
    x = (uu + 0.5 - cx) / fx * z
    y = -(vv + 0.5 - cy) / fy * z
    pts_cam = np.stack([x, y, -z], axis=-1)[valid]  # GL cam frame
    # world = R^T (cam - t)
    r = extr[:3, :3]
    t = extr[:3, 3]
    return (pts_cam - t) @ r


def voxel_downsample(points: np.ndarray, voxel: float) -> np.ndarray:
    """Average points per voxel (open3d voxel_down_sample equivalent)."""
    if len(points) == 0:
        return points
    keys = np.floor(points / voxel).astype(np.int64)
    _, inv, counts = np.unique(keys, axis=0, return_inverse=True, return_counts=True)
    sums = np.zeros((counts.shape[0], 3))
    np.add.at(sums, inv, points)
    return (sums / counts[:, None]).astype(np.float32)


def remove_statistical_outliers(points: np.ndarray, k: int = 20,
                                std_ratio: float = 2.0, iterations: int = 2):
    """Iterative statistical outlier removal (perception.py:220-240 uses
    open3d's; same nearest-neighbor-distance criterion)."""
    pts = points
    for _ in range(iterations):
        if len(pts) <= k + 1:
            break
        d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        knn = np.sort(d, axis=1)[:, :k].mean(axis=1)
        keep = knn < knn.mean() + std_ratio * knn.std()
        pts = pts[keep]
    return pts


def depth_mask_segmenter(color: np.ndarray, depth_m: np.ndarray, table_height: float,
                         intr, extr) -> np.ndarray:
    """Default sim segmenter: pixels whose world point sits above the table
    surface (and isn't background). Stands in for DINO+SAM on rendered
    frames where the table/floor are the only other geometry."""
    h, w = depth_m.shape
    fx, fy, cx, cy = intr
    vv, uu = np.mgrid[0:h, 0:w]
    z = depth_m
    x = (uu + 0.5 - cx) / fx * z
    y = -(vv + 0.5 - cy) / fy * z
    cam = np.stack([x, y, -z], axis=-1)
    r, t = extr[:3, :3], extr[:3, 3]
    world_y = (cam - t) @ r[:, 1]
    return (z > 0) & (world_y > table_height + 0.02)


def real_points_to_sim(points_m: np.ndarray, sim_real_ratio: float) -> np.ndarray:
    """Real table-frame points (meters, y-up — the frame our ArUco board
    calibration emits, objp lying in the xz-plane) -> sim units.

    The reference's conversion (perception.py:335-337) scales by
    sim_real_ratio and remaps its z-up board frame into the sim frame;
    our board frame is already y-up, so only the scale applies here — the
    planning-frame z-negation is flex_to_plan, applied by the caller
    exactly as for sim states."""
    return np.asarray(points_m, np.float32) * float(sim_real_ratio)


def capture_goal(env, pm: "PerceptionModule", out_path: str | None = None):
    """Capture the target point cloud from live frames — the reference's
    construct_goal_from_perception (perception.py:352-397): observe all
    cameras, fuse the segmented tabletop cloud, persist it for
    plan.py's pcd target mode. Works identically against RealEnv hardware
    and the SimCameraBackend/SimPlanEnv doubles.

    Returns the (M, 3) cloud (env-native units: meters for RealEnv, sim
    units for SimPlanEnv — plan.py scales by sim_real_ratio per its env)."""
    colors, depths = env.get_obs()
    pts = pm.get_tabletop_points(colors, depths, env.cam_intr, env.cam_extr)
    if out_path:
        base = os.path.dirname(out_path)
        if base:
            os.makedirs(base, exist_ok=True)
        np.save(out_path, pts)
    return pts


class PerceptionModule:
    """get_tabletop_points + get_state_cur (perception.py:151-349)."""

    def __init__(self, task_config, segmenter: Callable | None = None,
                 table_height: float = 0.5, voxel: float = 0.02,
                 workspace=((-3.5, 3.5), (0.0, 3.0), (-4.5, 4.5))):
        self.task_config = task_config
        self.segmenter = segmenter or depth_mask_segmenter
        self.table_height = table_height
        self.voxel = voxel
        self.workspace = np.asarray(workspace, np.float64)
        self.fps_radius = float(task_config["fps_radius"])
        self.max_nobj = int(task_config["max_nobj"])
        self.k_filter = float(task_config.get("k_filter", 1.0))

    def get_tabletop_points(self, colors, depths, intrs, extrs) -> np.ndarray:
        """Fused segmented object point cloud from n cameras.

        colors: (n, H, W, 3); depths: (n, H, W) metric; intrs (n, 4);
        extrs (n, 4, 4). Returns (M, 3) world points.
        """
        clouds = []
        for c, d, k, e in zip(colors, depths, intrs, extrs):
            m = self.segmenter(c, d, self.table_height, k, e)
            pts = depth_to_points(d, k, e, mask=m)
            clouds.append(pts)
        pts = np.concatenate(clouds, axis=0) if clouds else np.zeros((0, 3))
        # workspace bbox crop (perception.py:200-214)
        ws = self.workspace
        keep = np.all((pts >= ws[:, 0]) & (pts <= ws[:, 1]), axis=1)
        pts = pts[keep]
        pts = voxel_downsample(pts, self.voxel)
        if len(pts) > 4000:  # keep outlier removal tractable
            pts = pts[np.random.RandomState(0).choice(len(pts), 4000, replace=False)]
        pts = remove_statistical_outliers(pts)
        # height k-filter: drop points too far above the lowest k-quantile
        # (perception.py:242-252)
        if len(pts) and self.k_filter < 1.0:
            y = pts[:, 1]
            cut = np.quantile(y, self.k_filter)
            pts = pts[y <= cut + 1e-6]
        return pts.astype(np.float32)

    def get_state_cur(self, colors, depths, intrs, extrs, rng=None):
        """Object graph state: fused cloud -> radius-FPS keypoints capped at
        max_nobj (perception.py:318-349). Returns (state (k, 3), raw cloud)."""
        rng = rng or np.random
        pts = self.get_tabletop_points(colors, depths, intrs, extrs)
        if len(pts) == 0:
            return np.zeros((0, 3), np.float32), pts
        _, idx = fps_rad_idx(pts, self.fps_radius, rng)
        if len(idx) > self.max_nobj:
            _, sub = fps_with_idx(pts[idx], self.max_nobj)
            idx = idx[sub]
        return pts[idx].astype(np.float32), pts
