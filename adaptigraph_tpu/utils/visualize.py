"""Visualization: keypoint/edge overlays on camera frames + video assembly.

Port of the reference's overlay/video utilities (src/planning/plan_utils.py
:104-281 visualize_img; src/dynamics/rollout/graph.py:44-230
visualize_graph; moviepy_merge_video src/dynamics/utils.py:97-103 — here
cv2.VideoWriter since moviepy isn't available).

Projection convention matches the saved camera params: extr is the GL view
matrix; flip y/z after transforming, then pinhole-project
(rollout/graph.py:87-97).
"""

from __future__ import annotations

import os

import numpy as np


def project_points(points, intr, extr):
    """(N, 3) world -> (N, 2) pixel coords (+ depth) using the saved
    GL-convention extrinsics."""
    pts = np.concatenate([points, np.ones((len(points), 1))], axis=1) @ extr.T
    pts[:, 1] *= -1
    pts[:, 2] *= -1
    fx, fy, cx, cy = intr
    z = np.maximum(pts[:, 2], 1e-6)
    u = pts[:, 0] * fx / z + cx
    v = pts[:, 1] * fy / z + cy
    return np.stack([u, v], axis=1), z


def overlay_graph(img, kp, intr, extr, edges=None, gt_kp=None, eef_kp=None,
                  point_size: int = 4, edge_size: int = 1):
    """Draw predicted keypoints (red), ground truth (green), eef (blue), and
    graph edges onto an RGB uint8 image."""
    import cv2

    out = np.ascontiguousarray(img.copy())

    def draw_points(points, color):
        uv, _ = project_points(points, intr, extr)
        for u, v in uv:
            if 0 <= u < out.shape[1] and 0 <= v < out.shape[0]:
                cv2.circle(out, (int(u), int(v)), point_size, color, -1)
        return uv

    uv = draw_points(kp, (255, 0, 0))
    if edges is not None:
        recv, send, valid = edges
        for r, s, ok in zip(recv, send, valid):
            if not ok or r >= len(uv) or s >= len(uv):
                continue
            p1, p2 = uv[int(r)], uv[int(s)]
            cv2.line(out, (int(p1[0]), int(p1[1])), (int(p2[0]), int(p2[1])),
                     (0, 0, 0), edge_size)
    if gt_kp is not None:
        draw_points(gt_kp, (0, 200, 0))
    if eef_kp is not None:
        draw_points(eef_kp, (0, 0, 255))
    return out


def overlay_plan(img, state_init, state_pred, action, intr, extr,
                 target_state=None, push_length: float = 0.1):
    """Planning overlay: initial state, predicted state, action arrow,
    target (plan_utils.py:104-281)."""
    import cv2

    out = overlay_graph(img, state_init, intr, extr)
    if state_pred is not None:
        out = overlay_graph(out, state_pred, intr, extr, gt_kp=None)
    if target_state is not None:
        out = overlay_graph(out, target_state, intr, extr, gt_kp=target_state)
    # action arrow in the xz plane at table height (planning frame: z flipped)
    xs, zs, theta, length = action[:4]
    x2 = xs - length * push_length * np.cos(theta)
    z2 = zs - length * push_length * np.sin(theta)
    seg = np.array([[xs, 0.55, -zs], [x2, 0.55, -z2]])
    uv, _ = project_points(seg, intr, extr)
    cv2.arrowedLine(out, (int(uv[0, 0]), int(uv[0, 1])),
                    (int(uv[1, 0]), int(uv[1, 1])), (255, 255, 0), 2)
    return out


def merge_video(image_dir: str, pattern: str, out_path: str, fps: int = 10):
    """Assemble <idx>_<pattern>.jpg frames into an mp4 (cv2 VideoWriter)."""
    import cv2

    files = sorted([f for f in os.listdir(image_dir) if f.endswith(f"{pattern}.jpg")],
                   key=lambda f: int(f.split("_")[0]))
    if not files:
        return False
    first = cv2.imread(os.path.join(image_dir, files[0]))
    h, w = first.shape[:2]
    vw = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in files:
        vw.write(cv2.imread(os.path.join(image_dir, f)))
    vw.release()
    return True
