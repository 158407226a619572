"""xArm6-in-the-sim tests: trajectory IK tracking, link convex hulls as
collision + render shapes, and the SimEnv arm wiring (the reference adds
every URDF link mesh to the sim and IK-steps it per frame,
src/sim/sim_env/robot_env.py:19-108, flex_env.py:127-149,297-307)."""

import numpy as np
import jax
import jax.numpy as jnp

from adaptigraph_tpu.engine.state import SHAPE_CONVEX, make_shapes
from adaptigraph_tpu.engine.collisions import shape_contact_deltas
from adaptigraph_tpu.sim import robot
from adaptigraph_tpu.sim.render import render_frame
from adaptigraph_tpu.utils import geometry as geo

BASE = np.array([-4.1, 0.8, 0.0], np.float32)


class TestTrajectoryIK:
    def test_ik_traj_tracks_moving_target(self):
        t = 60
        # a slow horizontal sweep through the workspace at pushing height
        xs = np.linspace(-1.5, 0.5, t)
        targets = np.stack([xs, np.full(t, 1.5), np.linspace(0.5, -0.5, t)], 1)
        rot = np.asarray(robot.pusher_orientation(jnp.float32(0.3)))
        rots = np.tile(rot[None], (t, 1, 1))
        q = robot.ik_traj(jnp.asarray(targets), jnp.asarray(rots),
                          jnp.zeros(6), jnp.asarray(BASE))
        # after the initial convergence frames the eef must track closely
        pos_err = []
        for i in range(10, t):
            p, r = robot.fk_eef(q[i], jnp.asarray(BASE))
            pos_err.append(float(jnp.linalg.norm(p - targets[i])))
        assert np.median(pos_err) < 0.05  # 5 mm at sim_real_ratio 10
        assert max(pos_err) < 0.2

    def test_link_pose_traj_matches_fk(self):
        q = jnp.asarray(np.random.RandomState(0).uniform(-0.5, 0.5, (4, 6)),
                        jnp.float32)
        lp, lq = robot.link_pose_traj(q, jnp.asarray(BASE))
        assert lp.shape == (4, 7, 3) and lq.shape == (4, 7, 4)
        p6, r6 = robot.fk_eef(q[2], jnp.asarray(BASE))
        np.testing.assert_allclose(np.asarray(lp[2, -1]), np.asarray(p6),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(geo.quat_to_matrix(lq[2, -1])),
                                   np.asarray(r6), atol=1e-4)


class TestArmShapes:
    def test_assets_load_and_scale(self):
        a = robot.load_arm_assets(scale=10.0)
        assert len(a["planes"]) == 7
        for p in a["planes"]:
            assert p.shape[1] == 4 and len(p) >= 6
            # normals unit, offsets in world units (xarm links are <6 units)
            np.testing.assert_allclose(np.linalg.norm(p[:, :3], axis=1), 1.0,
                                       atol=1e-4)
            assert np.abs(p[:, 3]).max() < 8.0

    def test_link_hull_pushes_particle_out(self):
        a = robot.load_arm_assets(scale=10.0)
        planes = a["planes"][0]  # base link hull, ~0.8-unit radius at origin
        shapes = make_shapes([SHAPE_CONVEX], [np.zeros(3)], [np.zeros(3)],
                             [[0, 0, 0, 1.0]], planes=[planes])
        pos = jnp.array([[0.0, 0.3, 0.0]])  # inside the hull
        delta, cnt = shape_contact_deltas(
            pos, pos, shapes, shapes.pos, shapes.quat, jnp.zeros((1, 3)),
            0.015, 0.0, 0.1, 1.0 / 120)
        assert int(cnt[0]) == 1
        # pushed out of the NEAREST face by penetration + collision_distance
        assert float(jnp.linalg.norm(delta[0])) > 0.01
        # a point far away is untouched
        far = jnp.array([[3.0, 3.0, 3.0]])
        d2, c2 = shape_contact_deltas(
            far, far, shapes, shapes.pos, shapes.quat, jnp.zeros((1, 3)),
            0.015, 0.0, 0.1, 1.0 / 120)
        assert int(c2[0]) == 0 and float(jnp.linalg.norm(d2[0])) == 0.0

    def test_convex_renders_in_frame(self):
        a = robot.load_arm_assets(scale=10.0)
        shapes = make_shapes([SHAPE_CONVEX], [np.zeros(3)], [[0.0, 1.0, 0.0]],
                             [[0, 0, 0, 1.0]], planes=[a["planes"][1]])
        cam_pos = jnp.array([0.0, 1.0, 6.0])
        fwd = jnp.array([0.0, 0.0, -1.0])
        intr = jnp.array([120.0, 120.0, 48.0, 48.0])
        f = render_frame(jnp.zeros((1, 3)), jnp.zeros((1, 3)),
                         jnp.zeros(1, bool), shapes, cam_pos, fwd, intr,
                         width=96, height=96)
        depth = np.asarray(f[..., 4])
        hit = depth[(depth > 0) & (depth < 7.0)]
        assert hit.size > 20  # the hull occupies real pixels
        # hull extents ~0.5 units -> hits several units before the far plane
        assert abs(hit.min() - 6.0) < 1.5


class TestSimEnvArm:
    def test_env_step_with_arm(self):
        from adaptigraph_tpu.sim.env import SimEnv

        cfg = {"dataset": {"obj": "rope", "max_chunks": 8, "settle_steps": 40,
                           "chunk_group": 2, "screenHeight": 96,
                           "screenWidth": 96, "robot_speed_inv": 30,
                           "use_robot": True}}
        env = SimEnv(cfg)
        data = env.reset(seed=0, save_data=True)
        assert env.n_arm == 7
        kinds = np.asarray(env.state.shapes.kind)
        assert (kinds[env.arm_slot0: env.arm_slot0 + 7] == SHAPE_CONVEX).all()
        a = env.sample_action()
        out = env.step(a, save_data=True, data=data)
        assert out is not None, "simulator exploded with the arm enabled"
        _, data = out
        # the recorded eef states derive from the FK chain: the tool base
        # must sit within IK tolerance of the scripted trajectory height
        eef_rows = data[2][-1]
        assert eef_rows.shape[-1] == 14
        # arm link shapes moved from the rest pose during the push
        lp = np.asarray(env.state.shapes.pos[env.arm_slot0 + 6])
        assert np.linalg.norm(lp - env._rest_link_pos[6]) > 0.1
        # captured frames are quantized (color u8, depth u16) pairs; smoke-
        # check shape + dtype + non-degenerate depth
        color, depth = data[0][-1]
        assert color.dtype == np.uint8 and color.shape[-1] == 3
        assert depth.dtype == np.uint16 and (depth > 0).any()
