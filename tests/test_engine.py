"""Per-constraint unit tests of the XPBD engine against analytic solutions
(the test seams SURVEY.md §4 calls for: single spring, two-particle contact,
shape-match cluster, kinematic-shape contacts, friction, sleeping)."""

import numpy as np
import jax.numpy as jnp
import pytest

from adaptigraph_tpu.engine import (
    ParticleState,
    SceneSpec,
    SceneState,
    SolverParams,
    SHAPE_BOX,
    SHAPE_CAPSULE,
    SHAPE_PLANE,
    xpbd_step,
    rollout_steps,
    neighbor_list,
)
from adaptigraph_tpu.engine.state import (
    empty_clusters,
    empty_springs,
    make_clusters,
    make_particles,
    make_shapes,
    make_springs,
)


def _floor(m_max=4):
    return make_shapes([SHAPE_PLANE], [[0, 0, 0]], [[0, 0, 0]], [[0, 0, 0, 1]], m_max=m_max)


def _spec(n, springs=None, clusters=None, global_stiffness=0.0, global_rest=None, **params):
    return SceneSpec(
        springs=springs if springs is not None else empty_springs(4),
        clusters=clusters if clusters is not None else empty_clusters(2, 4),
        global_stiffness=jnp.float32(global_stiffness),
        global_rest=jnp.zeros((n, 3), jnp.float32) if global_rest is None else jnp.asarray(global_rest),
        rest_pos=jnp.zeros((n, 3), jnp.float32),
        params=SolverParams(**{k: jnp.float32(v) for k, v in params.items()}),
    )


def _state(particles, shapes, n_clusters=2):
    return SceneState(
        particles=particles,
        shapes=shapes,
        cluster_rot=jnp.tile(jnp.array([0.0, 0, 0, 1.0]), (n_clusters, 1)),
        global_rot=jnp.array([0.0, 0, 0, 1.0]),
    )


class TestIntegration:
    def test_free_fall_matches_kinematics(self):
        p = make_particles([[0.0, 10.0, 0.0]])
        st = _state(p, _floor())
        spec = _spec(1, gravity=-10.0, dt=1.0 / 60)
        for _ in range(30):
            st = xpbd_step(st, spec, substeps=2, iterations=1)
        t = 30 / 60.0
        # symplectic Euler with per-substep dt: y = y0 - g*sum_k k*h^2
        h = (1.0 / 60) / 2
        n = 60
        y_expected = 10.0 - 10.0 * h * h * n * (n + 1) / 2
        assert np.asarray(st.particles.pos)[0, 1] == pytest.approx(y_expected, abs=1e-3)

    def test_pinned_particle_does_not_move(self):
        p = make_particles([[0.0, 5.0, 0.0]], inv_mass=[0.0])
        st = _state(p, _floor())
        spec = _spec(1, gravity=-10.0)
        for _ in range(20):
            st = xpbd_step(st, spec, substeps=2, iterations=4)
        np.testing.assert_allclose(np.asarray(st.particles.pos)[0], [0, 5.0, 0], atol=1e-6)


class TestSprings:
    def test_stretched_spring_relaxes_to_rest(self):
        p = make_particles([[0.0, 2.0, 0], [2.0, 2.0, 0]])
        springs = make_springs([[0, 1]], rest=1.0, stiffness=1.0)
        spec = _spec(2, springs=springs, gravity=0.0)
        st = _state(p, _floor())
        for _ in range(60):
            st = xpbd_step(st, spec, substeps=2, iterations=8)
        pos = np.asarray(st.particles.pos)
        length = np.linalg.norm(pos[0] - pos[1])
        assert length == pytest.approx(1.0, abs=1e-3)
        # symmetric masses: midpoint preserved
        np.testing.assert_allclose((pos[0] + pos[1]) / 2, [1.0, 2.0, 0], atol=1e-4)

    def test_spring_with_pinned_end(self):
        p = make_particles([[0.0, 2.0, 0], [2.0, 2.0, 0]], inv_mass=[0.0, 1.0])
        springs = make_springs([[0, 1]], rest=0.5, stiffness=1.0)
        spec = _spec(2, springs=springs, gravity=0.0)
        st = _state(p, _floor())
        for _ in range(60):
            st = xpbd_step(st, spec, substeps=2, iterations=8)
        pos = np.asarray(st.particles.pos)
        np.testing.assert_allclose(pos[0], [0, 2.0, 0], atol=1e-6)
        assert np.linalg.norm(pos[1] - pos[0]) == pytest.approx(0.5, abs=1e-3)


class TestContacts:
    def test_particle_settles_on_floor_at_collision_distance(self):
        p = make_particles([[0.0, 0.5, 0.0]])
        st = _state(p, _floor())
        spec = _spec(1, gravity=-10.0, collision_distance=0.03)
        for _ in range(120):
            st = xpbd_step(st, spec, substeps=2, iterations=4)
        assert np.asarray(st.particles.pos)[0, 1] == pytest.approx(0.03, abs=2e-3)

    def test_particle_settles_on_box_top(self):
        shapes = make_shapes(
            [SHAPE_PLANE, SHAPE_BOX],
            [[0, 0, 0], [1.0, 0.5, 1.0]],
            [[0, 0, 0], [0, 0, 0]],
            [[0, 0, 0, 1]] * 2,
            m_max=4,
        )
        p = make_particles([[0.0, 1.5, 0.0]])
        st = _state(p, shapes)
        spec = _spec(1, gravity=-10.0, collision_distance=0.05)
        for _ in range(120):
            st = xpbd_step(st, spec, substeps=2, iterations=4)
        assert np.asarray(st.particles.pos)[0, 1] == pytest.approx(0.55, abs=3e-3)

    def test_capsule_pushes_particle_sideways(self):
        # vertical-motion-free: capsule sweeps through the particle location
        shapes = make_shapes(
            [SHAPE_PLANE, SHAPE_CAPSULE],
            [[0, 0, 0], [0.2, 1.0, 0.0]],
            [[0, 0, 0], [-2.0, 0.1, 0.0]],
            [[0, 0, 0, 1], [0, 0, 0.7071, 0.7071]],  # capsule axis along y
            m_max=4,
        )
        p = make_particles([[0.0, 0.1, 0.0]])
        st = _state(p, shapes)
        spec = _spec(1, gravity=0.0, collision_distance=0.03)
        # drive capsule from x=-2 to x=+0.5 over 50 frames
        xs = np.linspace(-2.0, 0.5, 50)
        for x in xs:
            tgt_pos = st.shapes.pos.at[1, 0].set(x)
            st = st._replace(shapes=st.shapes.moved_to(tgt_pos, st.shapes.quat))
            st = xpbd_step(st, spec, substeps=2, iterations=4)
        # particle must have been pushed ahead of the capsule surface
        px = np.asarray(st.particles.pos)[0, 0]
        assert px > 0.5 + 0.2  # beyond capsule front face

    def test_overlapping_particles_separate(self):
        p = make_particles([[0.0, 2.0, 0], [0.02, 2.0, 0]], group=[0, 1])
        st = _state(p, _floor())
        # heavy damping so the depenetration impulse doesn't carry them apart
        spec = _spec(2, gravity=0.0, solid_rest_distance=0.1, radius=0.1, damping=110.0)
        for _ in range(60):
            st = xpbd_step(st, spec, substeps=2, iterations=8)
        pos = np.asarray(st.particles.pos)
        # separated to at least the rest distance, with bounded overshoot
        d = np.linalg.norm(pos[0] - pos[1])
        assert 0.1 - 2e-3 <= d <= 0.12

    def test_same_group_no_self_collide_pass_through(self):
        p = make_particles([[0.0, 2.0, 0], [0.02, 2.0, 0]], group=[0, 0], self_collide=False)
        st = _state(p, _floor())
        spec = _spec(2, gravity=0.0, solid_rest_distance=0.1, radius=0.1)
        for _ in range(10):
            st = xpbd_step(st, spec, substeps=2, iterations=8)
        pos = np.asarray(st.particles.pos)
        assert np.linalg.norm(pos[0] - pos[1]) == pytest.approx(0.02, abs=1e-5)


class TestShapeMatching:
    def test_cluster_restores_rigid_shape(self):
        rest_pts = np.array([[0.0, 0, 0], [1.0, 0, 0], [0.0, 1.0, 0]], dtype=np.float32)
        clusters = make_clusters([[0, 1, 2]], rest_pts, stiffness=0.9, c_max=2, k_max=4)
        start = rest_pts.copy()
        start[1] = [1.6, 0.1, 0]  # perturb
        p = make_particles(start)
        st = _state(p, _floor())
        spec = _spec(3, clusters=clusters, gravity=0.0)
        for _ in range(40):
            st = xpbd_step(st, spec, substeps=2, iterations=6)
        pos = np.asarray(st.particles.pos)
        d01 = np.linalg.norm(pos[0] - pos[1])
        d02 = np.linalg.norm(pos[0] - pos[2])
        d12 = np.linalg.norm(pos[1] - pos[2])
        assert d01 == pytest.approx(1.0, abs=5e-3)
        assert d02 == pytest.approx(1.0, abs=5e-3)
        assert d12 == pytest.approx(np.sqrt(2), abs=5e-3)

    def test_cluster_is_rotation_invariant(self):
        # a rotated-but-rigid cluster should stay put (no ghost forces)
        rest_pts = np.array([[0.0, 0, 0], [1.0, 0, 0], [0.0, 1.0, 0]], dtype=np.float32)
        theta = 0.7
        rot = np.array([
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ], dtype=np.float32)
        start = rest_pts @ rot.T + np.array([0.0, 2.0, 0.0], dtype=np.float32)
        clusters = make_clusters([[0, 1, 2]], rest_pts, stiffness=1.0, c_max=2, k_max=4)
        p = make_particles(start)
        st = _state(p, _floor())
        spec = _spec(3, clusters=clusters, gravity=0.0)
        for _ in range(20):
            st = xpbd_step(st, spec, substeps=2, iterations=6)
        np.testing.assert_allclose(np.asarray(st.particles.pos)[:3], start, atol=2e-3)

    def test_global_cluster_stiffens_chain(self):
        # a straight chain with global shape matching resists bending
        n = 10
        pts = np.stack([np.linspace(0, 1, n), np.full(n, 2.0), np.zeros(n)], 1).astype(np.float32)
        rest = pts - pts.mean(0)
        p = make_particles(pts)
        st = _state(p, _floor())
        stiff_spec = _spec(n, global_stiffness=0.5, global_rest=rest, gravity=-10.0)
        soft_spec = _spec(n, global_stiffness=0.0, global_rest=rest, gravity=-10.0)
        st_stiff = st
        st_soft = st
        for _ in range(30):
            st_stiff = xpbd_step(st_stiff, stiff_spec, substeps=2, iterations=4)
            st_soft = xpbd_step(st_soft, soft_spec, substeps=2, iterations=4)
        spread_stiff = np.ptp(np.asarray(st_stiff.particles.pos)[:, 1])
        spread_soft = np.ptp(np.asarray(st_soft.particles.pos)[:, 1])
        # soft chain free-falls uniformly (spread ~0); stiff one also keeps
        # shape; but the stiff one must not deform MORE than soft
        assert spread_stiff <= spread_soft + 1e-3

    def test_plasticity_absorbs_deformation(self):
        """plasticThreshold/plasticCreep (NvFlex.h:95-154): an over-stretched
        plastic cluster keeps (part of) the deformation after release, while
        the elastic cluster snaps back to its rest extent."""
        rest_pts = np.array([[0.0, 0, 0], [0.5, 0, 0], [1.0, 0, 0]], dtype=np.float32)
        start = rest_pts.copy()
        start[2] = [1.8, 0, 0]  # stretch the end well past the threshold

        def run(plastic):
            clusters = make_clusters([[0, 1, 2]], rest_pts, stiffness=0.5,
                                     c_max=2, k_max=4)
            spec = _spec(3, clusters=clusters, gravity=0.0,
                         plastic_threshold=0.02, plastic_creep=0.3)
            # phase 1: hold both ends pinned in the stretched pose — sustained
            # load is what drives plastic flow (a transient snaps back first)
            inv_mass = np.array([0.0, 1.0, 0.0], dtype=np.float32)
            st = _state(make_particles(start, inv_mass=inv_mass), _floor())
            if plastic:
                st = st._replace(cluster_rest=jnp.array(clusters.rest))
            for _ in range(30):
                st = xpbd_step(st, spec, substeps=2, iterations=6)
            # phase 2: release the stretched end
            released = make_particles(np.asarray(st.particles.pos)[:3],
                                      inv_mass=np.array([0.0, 1.0, 1.0], np.float32))
            st = st._replace(particles=released)
            for _ in range(60):
                st = xpbd_step(st, spec, substeps=2, iterations=6)
            pos = np.asarray(st.particles.pos)
            return np.linalg.norm(pos[2] - pos[0]), st

        elastic_extent, _ = run(plastic=False)
        plastic_extent, st = run(plastic=True)
        assert elastic_extent == pytest.approx(1.0, abs=2e-2)  # snaps back
        assert plastic_extent > 1.3  # permanent set retained
        # the spec's rest offsets are untouched; the flow lives in state
        rest = np.asarray(st.cluster_rest)[0, :3]
        assert np.ptp(rest[:, 0]) > 1.3  # rest shape itself stretched
        np.testing.assert_allclose(rest.mean(0), 0.0, atol=1e-5)  # re-centered


class TestFriction:
    def test_high_friction_floor_stops_sliding(self):
        p_hi = make_particles([[0.0, 0.03, 0.0]])
        p_hi = p_hi._replace(vel=jnp.array([[1.0, 0.0, 0.0]]))
        st = _state(p_hi, _floor())
        hi = _spec(1, gravity=-10.0, dynamic_friction=1.0, collision_distance=0.03)
        lo = _spec(1, gravity=-10.0, dynamic_friction=0.0, collision_distance=0.03)
        st_hi, st_lo = st, st
        for _ in range(30):
            st_hi = xpbd_step(st_hi, hi, substeps=2, iterations=4)
            st_lo = xpbd_step(st_lo, lo, substeps=2, iterations=4)
        x_hi = np.asarray(st_hi.particles.pos)[0, 0]
        x_lo = np.asarray(st_lo.particles.pos)[0, 0]
        assert x_hi < x_lo - 0.05  # friction dissipates sliding


class TestRollout:
    def test_rollout_steps_matches_stepwise(self):
        p = make_particles([[0.0, 1.0, 0.0], [0.3, 1.0, 0.0]], group=[0, 1])
        springs = make_springs([[0, 1]], rest=0.3, stiffness=0.8)
        spec = _spec(2, springs=springs, gravity=-10.0, collision_distance=0.03)
        st = _state(p, _floor())
        T = 10
        pos_traj = jnp.tile(st.shapes.pos[None], (T, 1, 1))
        quat_traj = jnp.tile(st.shapes.quat[None], (T, 1, 1))
        final, rec = rollout_steps(st, spec, pos_traj, quat_traj, substeps=2, iterations=4)
        st2 = st
        for _ in range(T):
            st2 = st2._replace(shapes=st2.shapes.moved_to(st2.shapes.pos, st2.shapes.quat))
            st2 = xpbd_step(st2, spec, substeps=2, iterations=4)
        np.testing.assert_allclose(
            np.asarray(final.particles.pos), np.asarray(st2.particles.pos), atol=1e-5)
        assert rec.shape == (T, 2, 3)

    def test_sleeping_freezes_slow_particles(self):
        p = make_particles([[0.0, 0.03, 0.0]])
        st = _state(p, _floor())
        spec = _spec(1, gravity=-10.0, collision_distance=0.03, sleep_threshold=0.05)
        for _ in range(60):
            st = xpbd_step(st, spec, substeps=2, iterations=4)
        assert np.linalg.norm(np.asarray(st.particles.vel)) == 0.0


class TestNeighborList:
    def test_matches_bruteforce(self, rng):
        pts = rng.rand(100, 3).astype(np.float32)
        active = np.ones(100, dtype=bool)
        active[90:] = False
        idx, valid = neighbor_list(jnp.array(pts), 0.2, jnp.array(active), k=16)
        idx, valid = np.asarray(idx), np.asarray(valid)
        d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        for i in range(100):
            if not active[i]:
                assert not valid[i].any()
                continue
            want = {j for j in range(100) if j != i and active[j] and d[i, j] < 0.2}
            if len(want) <= 16:
                assert set(idx[i][valid[i]]) == want

    def test_tiled_matches_dense(self, rng):
        from adaptigraph_tpu.engine.neighbors import neighbor_list_tiled

        pts = rng.rand(300, 3).astype(np.float32) * 2
        active = np.ones(300, dtype=bool)
        i1, v1 = neighbor_list(jnp.array(pts), 0.3, jnp.array(active), k=12)
        i2, v2 = neighbor_list_tiled(jnp.array(pts), 0.3, jnp.array(active), k=12, tile=128)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
