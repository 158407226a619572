"""Sim layer tests: cameras, renderer, robot kinematics, episode IO, and
environment plumbing on a miniature scene."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaptigraph_tpu.engine.state import (
    SHAPE_BOX, SHAPE_PLANE, make_shapes, make_particles, empty_springs, empty_clusters,
    SceneSpec, SceneState, SolverParams,
)
from adaptigraph_tpu.sim.cameras import CameraRig, view_matrix
from adaptigraph_tpu.sim.render import render_frame
from adaptigraph_tpu.sim import robot
from adaptigraph_tpu.sim.episode_io import store_data, load_data
from adaptigraph_tpu.utils import Config


class TestCameras:
    def test_view_matrix_looks_at_center(self):
        rig = CameraRig(720, 720)
        pos, ang, intr, extr = rig.multiview()
        for i in range(4):
            # workspace center (0, 0.5, 0) should project near the image center
            p = extr[i] @ np.array([0.0, 0.5, 0.0, 1.0])
            assert p[2] < 0  # in front (GL -z)
            fx, fy, cx, cy = intr[i]
            u = p[0] * fx / -p[2] + cx
            v = -p[1] * fy / -p[2] + cy
            assert abs(u - cx) < 120 and abs(v - cy) < 180

    def test_intrinsics_fov45(self):
        rig = CameraRig(720, 720)
        fx, fy, cx, cy = rig.intrinsics()
        assert fx == pytest.approx((1 / np.tan(np.pi / 8)) * 360, rel=1e-5)
        assert (cx, cy) == (360.0, 360.0)

    def test_extrinsic_is_rigid(self):
        v = view_matrix(np.array([6.0, 10, 6]), np.array([np.deg2rad(45), -np.deg2rad(45), 0]))
        r = v[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


class TestRenderer:
    def _shapes(self):
        return make_shapes([SHAPE_PLANE], [[0, 0, 0]], [[0, 0, 0]], [[0, 0, 0, 1]], m_max=2)

    def test_particle_visible_and_depth(self):
        rig = CameraRig(96, 96)
        pos, ang = rig.single_view(1)
        from adaptigraph_tpu.sim.env import _fwd_from_angle

        fwd = _fwd_from_angle(ang)
        particles = jnp.array([[0.0, 0.5, 0.0]])
        colors = jnp.array([[1.0, 0.0, 0.0]])
        active = jnp.array([True])
        img = render_frame(particles, colors, active, self._shapes(),
                           jnp.array(pos, dtype=jnp.float32), jnp.array(fwd),
                           jnp.array(rig.intrinsics()) * (96 / 720.0), width=96, height=96,
                           point_radius=0.3)
        img = np.asarray(img)
        # some red pixels exist
        red = (img[..., 0] > 0.9) & (img[..., 1] < 0.2)
        assert red.sum() > 0
        # depth at red pixel approx distance from camera to the particle
        yy, xx = np.nonzero(red)
        d = img[yy[0], xx[0], 4]
        cam = np.array([6.0, 10.0, 6.0])
        # depth is along camera forward, <= euclidean distance
        assert 0 < d <= np.linalg.norm(cam - np.array([0, 0.5, 0])) + 0.5

    def test_floor_fills_background_below_horizon(self):
        rig = CameraRig(64, 64)
        pos, ang = rig.single_view(1)
        from adaptigraph_tpu.sim.env import _fwd_from_angle

        fwd = _fwd_from_angle(ang)
        img = render_frame(jnp.zeros((1, 3)), jnp.zeros((1, 3)), jnp.array([False]),
                           self._shapes(), jnp.array(pos, dtype=jnp.float32),
                           jnp.array(fwd), jnp.array(rig.intrinsics()) * (64 / 720.0),
                           width=64, height=64)
        img = np.asarray(img)
        assert img[40:, :, 4].min() > 0  # lower rows hit the floor -> depth > 0

    def test_cloth_vertex_normals_flat_grid(self):
        from adaptigraph_tpu.sim.render import cloth_vertex_normals

        dimx, dimz = 8, 6
        xs, zs = np.meshgrid(np.arange(dimx), np.arange(dimz), indexing="xy")
        pts = np.stack([xs.ravel() * 0.1, np.zeros(dimx * dimz),
                        zs.ravel() * 0.1], 1).astype(np.float32)
        pad = np.zeros((60, 3), np.float32)
        n = np.asarray(cloth_vertex_normals(jnp.asarray(np.concatenate([pts, pad])),
                                            dimx, dimz))
        # flat xz sheet: every grid normal is +/- y
        np.testing.assert_allclose(np.abs(n[: dimx * dimz, 1]), 1.0, atol=1e-5)
        np.testing.assert_allclose(n[: dimx * dimz, [0, 2]], 0.0, atol=1e-5)
        # padding rows carry zero normals (neutral shading)
        np.testing.assert_allclose(n[dimx * dimz:], 0.0)

    def test_cloth_surfel_shading_varies_on_draped_grid(self, monkeypatch,
                                                        request):
        """A draped (non-flat) cloth grid rendered with cloth_dims shows
        shading variation across the sheet; the flat render is uniform.
        Depth output is unaffected by shading. Pinned to the SURFEL path
        (ADAPTIGRAPH_CLOTH_MESH=0): the triangle-mesh rasterizer additionally
        fills inter-splat holes, legitimately changing depth on those pixels
        (covered by tests/test_render_cloth_mesh.py)."""
        monkeypatch.setenv("ADAPTIGRAPH_CLOTH_MESH", "0")
        # the env gate is read at trace time: drop cached traces on entry
        # and again at teardown so neither direction leaks between tests
        jax.clear_caches()
        request.addfinalizer(jax.clear_caches)
        rig = CameraRig(96, 96)
        pos, ang = rig.single_view(1)
        from adaptigraph_tpu.sim.env import _fwd_from_angle

        fwd = _fwd_from_angle(ang)
        dimx = dimz = 16
        xs, zs = np.meshgrid(np.arange(dimx), np.arange(dimz), indexing="xy")
        x = (xs.ravel() - dimx / 2) * 0.3
        z = (zs.ravel() - dimz / 2) * 0.3
        y = 0.6 + 0.6 * np.sin(x * 2.0) * np.cos(z * 2.0)  # draped folds
        pts = jnp.asarray(np.stack([x, y, z], 1).astype(np.float32))
        colors = jnp.tile(jnp.array([[0.2, 0.4, 1.0]]), (dimx * dimz, 1))
        active = jnp.ones(dimx * dimz, bool)
        kw = dict(width=96, height=96, point_radius=0.2, splat_px=3)
        intr = jnp.array(rig.intrinsics()) * (96 / 720.0)
        img_flat = np.asarray(render_frame(
            pts, colors, active, self._shapes(), jnp.array(pos, dtype=jnp.float32),
            jnp.array(fwd), intr, **kw))
        img_shaded = np.asarray(render_frame(
            pts, colors, active, self._shapes(), jnp.array(pos, dtype=jnp.float32),
            jnp.array(fwd), intr, cloth_dims=(dimx, dimz), **kw))
        cloth_px = (img_flat[..., 2] > 0.9) & (img_flat[..., 0] < 0.3)
        assert cloth_px.sum() > 20
        # unshaded: single blue everywhere; shaded: real variation
        assert img_flat[..., 2][cloth_px].std() < 1e-5
        assert img_shaded[..., 2][cloth_px].std() > 0.02
        np.testing.assert_allclose(img_shaded[..., 4], img_flat[..., 4], atol=1e-5)

    def test_box_occludes_floor(self):
        shapes = make_shapes([SHAPE_PLANE, SHAPE_BOX], [[0, 0, 0], [1.0, 1.0, 1.0]],
                             [[0, 0, 0], [0, 0, 0]], [[0, 0, 0, 1]] * 2, m_max=2)
        rig = CameraRig(64, 64)
        pos, ang = rig.single_view(1)
        from adaptigraph_tpu.sim.env import _fwd_from_angle

        fwd = _fwd_from_angle(ang)
        img = render_frame(jnp.zeros((1, 3)), jnp.zeros((1, 3)), jnp.array([False]),
                           shapes, jnp.array(pos, dtype=jnp.float32), jnp.array(fwd),
                           jnp.array(rig.intrinsics()) * (64 / 720.0), width=64, height=64)
        d_center = float(np.asarray(img)[32, 32, 4])
        cam = np.array([6.0, 10.0, 6.0])
        # center ray hits the box well before the floor
        assert 0 < d_center < np.linalg.norm(cam) - 1.0


class TestRobot:
    def test_fk_base_height(self):
        p, r = robot.fk_link_poses(jnp.zeros(6), jnp.array([0.0, 0, 0]))
        # first joint offset: 0.267m * 10 along bullet z == flex y
        np.testing.assert_allclose(np.asarray(p[1]), [0, 2.67, 0], atol=1e-5)

    def test_ik_reaches_target(self):
        base = jnp.array([-4.1, 0.8, 0.0])
        target = jnp.array([-1.0, 2.0, 0.5])
        rot = robot.pusher_orientation(jnp.float32(0.3))
        q0 = jnp.zeros(6)
        q = robot.ik_solve(target, rot, q0, base, iters=60)
        p, _ = robot.fk_eef(q, base)
        assert float(jnp.linalg.norm(p - target)) < 0.15

    def test_pusher_orientation_points_down(self):
        r = robot.pusher_orientation(jnp.float32(0.7))
        r = np.asarray(r)
        np.testing.assert_allclose(r[:, 2], [0, -1, 0], atol=1e-6)  # local z down
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


class TestEpisodeIO:
    def test_h5_roundtrip(self, tmp_path):
        T, C, H, W = 3, 4, 16, 16
        imgs = [np.random.rand(C, H, W, 5).astype(np.float32) for _ in range(T)]
        parts = [np.random.rand(50, 3).astype(np.float32) for _ in range(T)]
        eefs = [np.random.rand(1, 14).astype(np.float32) for _ in range(T)]
        fn = os.path.join(tmp_path, "00.h5")
        store_data(fn, (imgs, parts, eefs), np.array([1.0, 2, 3, 4]))
        back = load_data(fn)
        assert back["info"]["n_cams"] == C
        assert back["info"]["timestamp"] == T
        assert back["positions"].shape == (T, 50, 3)
        assert back["eef_states"].shape == (T, 1, 14)
        assert back["observations"]["color"]["cam_0"].dtype == np.uint8
        assert back["observations"]["depth"]["cam_0"].dtype == np.uint16
        np.testing.assert_allclose(back["action"], [1, 2, 3, 4])
        # depth mm scaling
        want = (imgs[0][0, :, :, 4] * 1000).astype(np.uint16)
        np.testing.assert_array_equal(back["observations"]["depth"]["cam_0"][0], want)


def _tiny_build(material, rng, shapes=None, caps=None):
    """A 36-particle blob standing in for a rope: fast enough for CPU tests."""
    from adaptigraph_tpu.scenes.build import SceneBuild

    g = np.stack(np.meshgrid(np.arange(4), np.arange(3), np.arange(3),
                             indexing="ij"), -1).reshape(-1, 3)
    pts = (g * 0.08 + np.array([-0.15, 0.55, -0.1])).astype(np.float32)
    particles = make_particles(pts, group=0, self_collide=True, n_max=64)
    spec = SceneSpec(
        springs=empty_springs(4), clusters=empty_clusters(2, 4),
        global_stiffness=jnp.float32(0.0), global_rest=jnp.zeros((0, 3)),
        rest_pos=jnp.zeros((64, 3)),
        params=SolverParams(collision_distance=jnp.float32(0.03)),
    )
    state = SceneState(particles=particles, shapes=shapes,
                       cluster_rot=jnp.tile(jnp.array([0.0, 0, 0, 1.0]), (2, 1)),
                       global_rot=jnp.array([0.0, 0, 0, 1.0]))
    return SceneBuild(state=state, spec=spec, scene={}, props={"stiffness": 0.5},
                      n_active=len(pts), substeps=2, iterations=2)


@pytest.fixture
def tiny_env(monkeypatch):
    import adaptigraph_tpu.sim.env as env_mod
    from adaptigraph_tpu.scenes.build import Caps

    monkeypatch.setattr(env_mod, "build_scene", _tiny_build)
    monkeypatch.setitem(env_mod.MATERIAL_CAPS, "rope", Caps(n=64, s=4, c=2, k=4, m=8))
    cfg = Config({"dataset": {
        "obj": "rope", "pusher_len": 1.0, "robot_speed_inv": 10,
        "screenWidth": 48, "screenHeight": 48, "max_chunks": 3, "settle_steps": 10,
        "action_space": 2, "camera_view": 1, "fps": False,
    }})
    return env_mod.SimEnv(cfg)


class TestSimEnv:
    def test_reset_and_capture(self, tiny_env):
        data = tiny_env.reset(seed=0, save_data=True)
        imgs, parts, eefs = data
        assert len(imgs) == len(parts) == len(eefs) == 1
        color, depth = imgs[0]
        assert color.shape == (4, 48, 48, 3) and color.dtype == "uint8"
        assert depth.shape == (4, 48, 48) and depth.dtype == "uint16"
        assert parts[0].shape == (36, 3)
        assert eefs[0].shape == (1, 14)

    def test_push_moves_particles_toward_push(self, tiny_env):
        tiny_env.reset(seed=0)
        before = tiny_env.get_positions().copy()
        # push through the blob: start left of it in action frame, end past it
        out = tiny_env.step(np.array([-1.5, 0.1, 0.8, 0.1]), save_data=True,
                            data=([], [], []))
        assert out is not None
        obs, data = out
        assert obs.shape == (48, 48, 5)
        after = tiny_env.get_positions()
        assert np.linalg.norm(after - before, axis=1).max() > 0.05
        assert len(data[1]) >= 1  # captured at least one frame

    def test_attach_free_fast_path_matches_attach_path(self, tiny_env):
        """Pushes without grasps dispatch the static has_attach=False scan
        (skipping the per-frame inv_mass mutation, hoisting the contact
        tables); it must reproduce the attach-capable scan exactly — the
        skipped mutations were identities when attach_active == 0."""
        tiny_env.reset(seed=0)
        st0 = jax.tree.map(jnp.copy, tiny_env.state)
        act = np.array([-1.5, 0.1, 0.8, 0.1])
        plan = tiny_env.plan_push(act)
        assert not np.any(plan["attach_active"])  # rope pushes never grasp

        n_chunks = min(-(-(plan["t_push"] + tiny_env.settle_steps) // 40),
                       tiny_env.max_chunks)
        # drive _push_fn twice, forcing each scan variant by swapping which
        # group_fn answers for the no-attach key
        results = {}
        for forced in (False, True):
            tiny_env.state = jax.tree.map(jnp.copy, st0)
            fns = dict(tiny_env._group_fns)
            fns[False] = tiny_env._group_fns[forced]
            orig, tiny_env._group_fns = tiny_env._group_fns, fns
            try:
                st, pos_rec, _, _, bad = tiny_env._push_fn(
                    tiny_env.state, tiny_env.spec, plan["eef"], plan["rot"],
                    plan["gap"], plan["attach_idx"], plan["attach_rel"],
                    plan["attach_active"], n_chunks_active=n_chunks,
                    link_pos_traj=plan["link_pos"],
                    link_quat_traj=plan["link_quat"])
            finally:
                tiny_env._group_fns = orig
            assert not bool(bad[0])
            results[forced] = (np.asarray(st.particles.pos),
                               np.asarray(pos_rec))
        np.testing.assert_allclose(results[False][0], results[True][0],
                                   atol=1e-7)
        np.testing.assert_allclose(results[False][1], results[True][1],
                                   atol=1e-7)

    def test_gripper_grasp_cycle(self, monkeypatch):
        """Cloth-style gripper push: grasp pins particles, release restores
        their inverse mass (the donated-buffer regression test)."""
        import adaptigraph_tpu.sim.env as env_mod
        from adaptigraph_tpu.scenes.build import Caps

        monkeypatch.setattr(env_mod, "build_scene", _tiny_build)
        monkeypatch.setitem(env_mod.MATERIAL_CAPS, "cloth",
                            Caps(n=64, s=4, c=2, k=4, m=8))
        cfg = Config({"dataset": {
            "obj": "cloth", "gripper": True, "pusher_len": 1.0,
            "robot_speed_inv": 10, "screenWidth": 48, "screenHeight": 48,
            "max_chunks": 4, "settle_steps": 10, "action_space": 2,
            "camera_view": 1, "fps": False,
        }})
        env = env_mod.SimEnv(cfg)
        env.reset(seed=2)
        w0 = np.asarray(env.state.particles.inv_mass).copy()
        out = env.step(np.array([0.0, 0.0, 0.8, 0.3]), save_data=True,
                       data=([], [], []))
        assert out is not None
        obs, data = out
        # all inverse masses restored after release
        w1 = np.asarray(env.state.particles.inv_mass)
        np.testing.assert_allclose(w1, w0)
        # eef states carry two finger rows
        assert data[2][0].shape == (2, 14)

    def test_seed_determinism(self, tiny_env):
        tiny_env.reset(seed=3)
        a1 = tiny_env.sample_action()
        p1 = tiny_env.get_positions().copy()
        tiny_env.reset(seed=3)
        a2 = tiny_env.sample_action()
        p2 = tiny_env.get_positions().copy()
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(p1, p2)
