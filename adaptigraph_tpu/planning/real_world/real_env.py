"""Real-robot environment: xArm6 + multi-camera rig behind the planning API.

Port of src/planning/real_world/real_env.py (RealEnv :22-569): camera
processes + shared-memory transport, ArUco fixed-camera calibration
(:462-538), robot-world hand-eye registration hook (:328-460), and the push
primitives — approach above the start point, descend, push along the
segment, lift (:212-240); gripper variant grasps between descend and move
(:242-276). Workspace clipping keeps commanded poses above the table.

`use_robot=False` runs the same code against FakeXarm + SimCameraBackend —
the hardware-free double (real_env.py:79-83's pattern) used by tests.

Frames: planning/table frame (x, z) in meters; `T_table_base` maps table
points into the robot base frame (from calibration). sim <-> real scale is
sim_real_ratio=10 (1 sim unit = 10 cm).
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from adaptigraph_tpu.planning.real_world.cameras import (
    MultiCamera, RealsenseBackend, SimCameraBackend)


class RealEnv:
    def __init__(self, task_config=None, use_robot: bool = True,
                 use_real_cameras: bool = True, camera_serials=None,
                 robot_ip: str = "192.168.1.209", resolution=(720, 720),
                 calib_dir: str = "dump/calibration"):
        self.task_config = task_config or {}
        self.use_robot = use_robot
        self.resolution = resolution
        self.calib_dir = calib_dir
        self.push_height = float(self.task_config.get("clipping_height", -0.06))
        self.approach_height = 0.15  # meters above the table for transit
        self.sim_real_ratio = float(self.task_config.get("sim_real_ratio", 10.0))

        if use_real_cameras:
            serials = camera_serials or []
            backends = {f"cam_{i}": RealsenseBackend(s, resolution)
                        for i, s in enumerate(serials)}
        else:
            backends = {f"cam_{i}": SimCameraBackend(resolution) for i in range(4)}
        self.cameras = MultiCamera(backends, resolution)

        if use_robot:
            from adaptigraph_tpu.planning.real_world.xarm6 import XarmController

            self.robot = XarmController(robot_ip)
        else:
            from adaptigraph_tpu.planning.real_world.xarm6 import FakeXarm

            self.robot = FakeXarm()

        # table->base: identity until calibrated/loaded
        self.T_table_base = np.eye(4)
        self.cam_intr = None
        self.cam_extr = None

    # ---------- lifecycle ----------

    def start(self, wait_ready: float = 5.0):
        ok = self.cameras.start(wait_ready)
        if not ok:
            raise RuntimeError("cameras failed to become ready")
        self._load_calibration()
        return self

    def stop(self):
        self.cameras.stop()
        self.robot.close()

    # ---------- observation ----------

    def get_obs(self):
        """Timestamp-aligned frames: (colors (n,H,W,3) uint8,
        depths (n,H,W) float meters)."""
        frames = self.cameras.get_obs()
        names = sorted(frames.keys())
        colors = np.stack([frames[n]["color"] for n in names])
        depths = np.stack([frames[n]["depth"] for n in names]).astype(np.float32) / 1000.0
        return colors, depths

    # ---------- calibration ----------

    def calibrate(self, board_shape=(5, 7), marker_len_m: float = 0.03,
                  save: bool = True):
        """Fixed-camera extrinsics from an ArUco board on the table
        (real_env.py:462-538): detect markers per camera, solvePnP against
        the known board layout, store world(table)->camera transforms."""
        import cv2

        aruco = cv2.aruco
        dictionary = aruco.getPredefinedDictionary(aruco.DICT_4X4_50)
        colors, _ = self.get_obs()
        n = len(colors)
        extr = np.tile(np.eye(4, dtype=np.float32)[None], (n, 1, 1))
        intr = np.zeros((n, 4), np.float32)
        for i, (name, cam) in enumerate(sorted(self.cameras.cams.items())):
            intr[i] = cam.backend.get_intrinsics()
            gray = cv2.cvtColor(colors[i], cv2.COLOR_RGB2GRAY)
            detector = aruco.ArucoDetector(dictionary)
            corners, ids, _ = detector.detectMarkers(gray)
            if ids is None or len(ids) == 0:
                continue  # leave identity; caller decides validity
            objp, imgp = [], []
            cols = board_shape[0]
            for c, mid in zip(corners, ids.ravel()):
                gx, gy = mid % cols, mid // cols
                ox, oy = gx * marker_len_m * 1.5, gy * marker_len_m * 1.5
                objp.extend([[ox, 0, oy], [ox + marker_len_m, 0, oy],
                             [ox + marker_len_m, 0, oy + marker_len_m],
                             [ox, 0, oy + marker_len_m]])
                imgp.extend(c.reshape(4, 2))
            fx, fy, cx, cy = intr[i]
            k = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
            ok, rvec, tvec = cv2.solvePnP(np.asarray(objp, np.float64),
                                          np.asarray(imgp, np.float64), k, None)
            if ok:
                r, _ = cv2.Rodrigues(rvec)
                extr[i, :3, :3] = r
                extr[i, :3, 3] = tvec.ravel()
        self.cam_intr, self.cam_extr = intr, extr
        if save:
            os.makedirs(self.calib_dir, exist_ok=True)
            with open(os.path.join(self.calib_dir, "calibration.pkl"), "wb") as f:
                pickle.dump({"intr": intr, "extr": extr,
                             "T_table_base": self.T_table_base}, f)
        return intr, extr

    def _load_calibration(self):
        path = os.path.join(self.calib_dir, "calibration.pkl")
        if os.path.exists(path):
            with open(path, "rb") as f:
                d = pickle.load(f)
            self.cam_intr = d["intr"]
            self.cam_extr = d["extr"]
            self.T_table_base = d.get("T_table_base", np.eye(4))

    # ---------- motion primitives ----------

    def _table_to_base_mm(self, p_table_m):
        """Table-frame meters -> base-frame mm, clipped above the table
        (real_env.py:212-240's transform + collision clipping)."""
        p = np.asarray([p_table_m[0], p_table_m[1], p_table_m[2], 1.0])
        q = self.T_table_base @ p
        q[2] = max(q[2], self.push_height)
        return q[:3] * 1000.0

    def step(self, action4_sim):
        """Pusher primitive: action in SIM units [xs, zs, xe, ze] ->
        approach -> descend -> push -> lift."""
        a = np.asarray(action4_sim, np.float64) / self.sim_real_ratio
        start = np.array([a[0], a[1], self.push_height])
        end = np.array([a[2], a[3], self.push_height])
        orn = [180.0, 0.0, np.degrees(np.arctan2(end[1] - start[1],
                                                 end[0] - start[0]))]
        hi = self.approach_height
        ok = True
        for wp in (np.r_[start[:2], self.push_height + hi], start, end,
                   np.r_[end[:2], self.push_height + hi]):
            pos = self._table_to_base_mm(wp)
            ok &= self.robot.move_to_pose([*pos, *orn], wait=True)
            if not self.robot.is_alive:
                raise RuntimeError("xarm reported an error during push")
        return ok

    def step_gripper(self, action4_sim):
        """Grasp primitive (real_env.py:242-276): approach, descend, close,
        lift-move, lower, open."""
        a = np.asarray(action4_sim, np.float64) / self.sim_real_ratio
        start = np.array([a[0], a[1], self.push_height])
        end = np.array([a[2], a[3], self.push_height])
        orn = [180.0, 0.0, 0.0]
        hi = self.approach_height
        self.robot.open_gripper()
        for wp in (np.r_[start[:2], self.push_height + hi], start):
            self.robot.move_to_pose([*self._table_to_base_mm(wp), *orn], wait=True)
        self.robot.close_gripper()
        for wp in (np.r_[start[:2], self.push_height + hi],
                   np.r_[end[:2], self.push_height + hi], end):
            self.robot.move_to_pose([*self._table_to_base_mm(wp), *orn], wait=True)
        self.robot.open_gripper()
        self.robot.move_to_pose(
            [*self._table_to_base_mm(np.r_[end[:2], self.push_height + hi]), *orn],
            wait=True)
        return True
