"""Dense (Pallas) vs sparse (neighbor-list) solver paths must produce the
same trajectories when the neighbor cap is not binding."""

import numpy as np
import jax.numpy as jnp

from adaptigraph_tpu.engine import SHAPE_PLANE, SceneSpec, SceneState, SolverParams, xpbd_step
from adaptigraph_tpu.engine.state import (
    empty_clusters, empty_springs, make_particles, make_shapes)


def _scene(n=60, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.rand(n, 3).astype(np.float32) * 0.5 + np.array([0, 0.3, 0], np.float32)
    p = make_particles(pts, group=np.arange(n) % 10)
    shapes = make_shapes([SHAPE_PLANE], [[0, 0, 0]], [[0, 0, 0]], [[0, 0, 0, 1]],
                         m_max=2)
    spec = SceneSpec(
        springs=empty_springs(0), clusters=empty_clusters(0, 0),
        global_stiffness=jnp.float32(0.0), global_rest=jnp.zeros((0, 3)),
        rest_pos=jnp.zeros((n, 3)),
        params=SolverParams(radius=jnp.float32(0.08),
                            solid_rest_distance=jnp.float32(0.08),
                            gravity=jnp.float32(-10.0)))
    st = SceneState(particles=p, shapes=shapes,
                    cluster_rot=jnp.zeros((0, 4)), global_rot=jnp.array([0.0, 0, 0, 1]))
    return st, spec


def test_dense_and_sparse_trajectories_match():
    st_d, spec = _scene()
    st_s = st_d
    for _ in range(15):
        st_d = xpbd_step(st_d, spec, substeps=2, iterations=4, dense_contacts=True)
        st_s = xpbd_step(st_s, spec, substeps=2, iterations=4, dense_contacts=False,
                         neighbor_k=59)  # cap >= all possible neighbors
    np.testing.assert_allclose(np.asarray(st_d.particles.pos),
                               np.asarray(st_s.particles.pos), atol=5e-5)


def test_block_and_dense_trajectories_match():
    """The AABB-culled block sweep must reproduce the all-pairs sweep —
    culled blocks contain no interacting pairs by construction. Tolerance
    covers f32 accumulation-order differences (512- vs 128-wide col blocks)
    amplified over 15 frames."""
    st_d, spec = _scene(n=200, seed=3)
    st_b = st_d
    for _ in range(15):
        st_d = xpbd_step(st_d, spec, substeps=2, iterations=4,
                         contact_mode="dense")
        st_b = xpbd_step(st_b, spec, substeps=2, iterations=4,
                         contact_mode="block")
    np.testing.assert_allclose(np.asarray(st_d.particles.pos),
                               np.asarray(st_b.particles.pos), atol=5e-4)


def test_block_kernel_matches_dense_kernel_single_call():
    """Direct kernel-vs-kernel check at tight tolerance on one call."""
    import jax.numpy as jnp2
    from adaptigraph_tpu.engine.pallas_kernels import (
        block_sparse_contact_deltas, dense_contact_deltas, tile_overlap_blocks)

    rng = np.random.RandomState(11)
    n = 384
    pos = jnp2.asarray(rng.rand(n, 3).astype(np.float32) * 0.8)
    pos_prev = pos + jnp2.asarray(rng.randn(n, 3).astype(np.float32) * 0.005)
    group = jnp2.asarray(np.arange(n, dtype=np.int32) % 40)
    inv_mass = jnp2.ones((n,))
    sc = jnp2.zeros((n,), bool)
    active = jnp2.asarray(np.arange(n) % 7 != 0)
    rest_pos = jnp2.zeros((n, 3))
    args = (pos, pos_prev, group, inv_mass, sc, active, rest_pos,
            0.08, 0.25, 0.0)
    d_d, c_d = dense_contact_deltas(*args, interpret=True)
    bidx, bcnt, ovf = tile_overlap_blocks(pos, active, 0.08 * 1.5)
    d_b, c_b = block_sparse_contact_deltas(*args, bidx, bcnt, interpret=True)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(c_d), np.asarray(c_b), atol=0)
    np.testing.assert_allclose(np.asarray(d_d), np.asarray(d_b), atol=1e-6)


def test_block_sweep_multi_tile_spread_scene():
    """Several 128-particle tiles spread far apart: culling must skip the
    far pairs yet keep intra-tile contacts identical to dense."""
    st_d, spec = _scene(n=600, seed=5)
    # spread clumps: shift each third of the particles far apart in x
    pos = np.array(st_d.particles.pos)
    pos[200:400, 0] += 50.0
    pos[400:, 0] += 100.0
    import jax.numpy as jnp2
    st_d = st_d._replace(particles=st_d.particles._replace(pos=jnp2.asarray(pos)))
    st_b = st_d
    for _ in range(10):
        st_d = xpbd_step(st_d, spec, substeps=2, iterations=4,
                         contact_mode="dense")
        st_b = xpbd_step(st_b, spec, substeps=2, iterations=4,
                         contact_mode="block")
    np.testing.assert_allclose(np.asarray(st_d.particles.pos),
                               np.asarray(st_b.particles.pos), atol=1e-5)


def _spring_cluster_scene(n=80, seed=7):
    from adaptigraph_tpu.engine.state import make_clusters, make_springs

    rng = np.random.RandomState(seed)
    pts = rng.rand(n, 3).astype(np.float32) * 0.5 + np.array([0, 0.3, 0], np.float32)
    p = make_particles(pts, group=np.arange(n) % 10)
    shapes = make_shapes([SHAPE_PLANE], [[0, 0, 0]], [[0, 0, 0]], [[0, 0, 0, 1]],
                         m_max=2)
    idx = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    springs = make_springs(idx, rest=0.05, stiffness=0.4, capacity=n + 10)
    members = [list(range(i, min(i + 6, n))) for i in range(0, n, 4)]
    clusters = make_clusters(members, pts, 0.3, c_max=len(members) + 2, k_max=8)
    spec = SceneSpec(
        springs=springs, clusters=clusters,
        global_stiffness=jnp.float32(0.0), global_rest=jnp.zeros((0, 3)),
        rest_pos=jnp.zeros((n, 3)),
        params=SolverParams(radius=jnp.float32(0.08),
                            solid_rest_distance=jnp.float32(0.08),
                            gravity=jnp.float32(-10.0)))
    st = SceneState(particles=p, shapes=shapes,
                    cluster_rot=jnp.tile(jnp.array([0.0, 0, 0, 1.0]),
                                         (len(members) + 2, 1)),
                    global_rot=jnp.array([0.0, 0, 0, 1]))
    return st, spec


def test_incidence_gather_matches_scatter_paths():
    """Spring/cluster passes via the precomputed incidence tables (gather
    only) must reproduce the scatter-add formulation exactly (same pair
    terms, different reduction order -> tight tolerance over 15 frames)."""
    from adaptigraph_tpu.engine.state import (
        build_cluster_incidence, build_spring_incidence)

    st_a, spec = _spring_cluster_scene()
    n = spec.rest_pos.shape[0]
    spec_inc = spec._replace(
        spring_inc=build_spring_incidence(spec.springs, n),
        cluster_inc=build_cluster_incidence(spec.clusters, n))
    st_b = st_a
    for _ in range(15):
        st_a = xpbd_step(st_a, spec, substeps=2, iterations=4)
        st_b = xpbd_step(st_b, spec_inc, substeps=2, iterations=4)
    np.testing.assert_allclose(np.asarray(st_a.particles.pos),
                               np.asarray(st_b.particles.pos), atol=2e-5)


def test_offset_family_conversion_matches_spring_list():
    """attach_incidence's offset-family conversion (the gather-free spring
    pass) must not change trajectories vs the raw spring-list formulation."""
    from adaptigraph_tpu.scenes.build import attach_incidence

    st_a, spec = _spring_cluster_scene()
    n = spec.rest_pos.shape[0]
    spec_c = attach_incidence(spec, n)
    assert spec_c.offset_springs is not None  # the chain converts fully
    assert int(np.asarray(spec_c.springs.valid).sum()) == 0
    st_b = st_a
    for _ in range(15):
        st_a = xpbd_step(st_a, spec, substeps=2, iterations=4)
        st_b = xpbd_step(st_b, spec_c, substeps=2, iterations=4)
    np.testing.assert_allclose(np.asarray(st_a.particles.pos),
                               np.asarray(st_b.particles.pos), atol=2e-5)


def test_cluster_matmul_matches_gather_rope_scene():
    """The membership-matrix cluster pass (solver._cluster_deltas_matmul)
    must reproduce the gather formulation on a real rope scene, including
    the folded-in global cluster (state.fold_global_cluster) — the algebra
    in ClusterMatmul's docstring vs flexExtSoft.cpp:551,592-616."""
    import jax

    from adaptigraph_tpu.scenes.build import (
        _BUILDERS, MATERIAL_CAPS, attach_incidence)
    from adaptigraph_tpu.scenes.samplers import sample_scene
    from adaptigraph_tpu.engine.state import fold_global_cluster
    from adaptigraph_tpu.engine.solver import (
        _cluster_deltas, _cluster_deltas_matmul, _global_cluster_deltas)

    rng = np.random.RandomState(3)
    scene, _ = sample_scene("rope", rng)
    caps = MATERIAL_CAPS["rope"]
    particles, spec0, _ = _BUILDERS["rope"](scene, rng, caps)
    spec0 = attach_incidence(spec0, caps.n)
    spec1 = fold_global_cluster(spec0, particles)
    assert spec1.cluster_mm is not None
    assert spec1.global_rest.shape[0] == 0  # global folded away
    pos = particles.pos + 0.01 * jax.random.normal(
        jax.random.PRNGKey(0), particles.pos.shape)
    rot0 = jnp.tile(jnp.array([0.0, 0, 0, 1.0]), (caps.c, 1))
    d1, c1, _ = _cluster_deltas(pos, spec0.clusters, rot0,
                                inc=spec0.cluster_inc)
    dg, cg, _ = _global_cluster_deltas(
        pos, particles.active, particles.inv_mass, spec0.global_rest,
        spec0.global_stiffness, jnp.array([0.0, 0, 0, 1.0]))
    d2, c2, _ = _cluster_deltas_matmul(pos, spec1.rest_pos, spec1.clusters,
                                       rot0, spec1.cluster_mm)
    np.testing.assert_allclose(np.asarray(d1 + dg), np.asarray(d2), atol=5e-5)
    np.testing.assert_allclose(np.asarray(c1 + cg), np.asarray(c2), atol=1e-5)


def test_rollout_steps_hoisted_tables_match_stepwise():
    """rollout_steps packs the contact-table attribute rows once and lets
    each frame refresh only the position rows; that must be bit-equivalent
    to xpbd_step's own per-frame pack (same table contents by
    construction)."""
    from adaptigraph_tpu.engine.solver import rollout_steps

    st, spec = _spring_cluster_scene()
    T = 3
    pos_traj = jnp.tile(st.shapes.pos[None], (T, 1, 1))
    quat_traj = jnp.tile(st.shapes.quat[None], (T, 1, 1))
    final, _ = rollout_steps(st, spec, pos_traj, quat_traj, substeps=2,
                             iterations=2, record=False,
                             contact_mode="block")
    st_ref = st
    for t in range(T):
        st_ref = st_ref._replace(shapes=st_ref.shapes.moved_to(
            pos_traj[t], quat_traj[t]))
        st_ref = xpbd_step(st_ref, spec, substeps=2, iterations=2,
                           contact_mode="block")
    np.testing.assert_allclose(np.asarray(final.particles.pos),
                               np.asarray(st_ref.particles.pos), atol=1e-7)
    np.testing.assert_allclose(np.asarray(final.particles.vel),
                               np.asarray(st_ref.particles.vel), atol=1e-6)


def test_cluster_matmul_trim_is_exact():
    """state.trim_cluster_matmul drops only all-zero padding rows, so the
    trimmed pass must reproduce the full-width pass exactly (deltas, counts,
    and the stitched cap-C rotation state) — the padding rows were ~96% of
    the pass's HBM traffic at the rope bench point."""
    import jax

    from adaptigraph_tpu.scenes.build import (
        _BUILDERS, MATERIAL_CAPS, attach_incidence)
    from adaptigraph_tpu.scenes.samplers import sample_scene
    from adaptigraph_tpu.engine.state import (fold_global_cluster,
                                              pad_cluster_matmul,
                                              trim_cluster_matmul)
    from adaptigraph_tpu.engine.solver import _cluster_deltas_matmul

    rng = np.random.RandomState(3)
    scene, _ = sample_scene("rope", rng)
    caps = MATERIAL_CAPS["rope"]
    particles, spec0, _ = _BUILDERS["rope"](scene, rng, caps)
    spec0 = attach_incidence(spec0, caps.n)
    spec1 = fold_global_cluster(spec0, particles)
    spec2 = trim_cluster_matmul(spec1)
    ct = spec2.cluster_mm.matrix.shape[0]
    assert ct < caps.c and ct % 8 == 0
    pos = particles.pos + 0.01 * jax.random.normal(
        jax.random.PRNGKey(0), particles.pos.shape)
    rot0 = jnp.tile(jnp.array([0.0, 0, 0, 1.0]), (caps.c, 1))
    d_full, c_full, q_full = _cluster_deltas_matmul(
        pos, spec1.rest_pos, spec1.clusters, rot0, spec1.cluster_mm)
    d_trim, c_trim, q_trim = _cluster_deltas_matmul(
        pos, spec2.rest_pos, spec2.clusters, rot0, spec2.cluster_mm)
    assert q_trim.shape == (caps.c, 4)
    np.testing.assert_allclose(np.asarray(d_full), np.asarray(d_trim),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(c_full), np.asarray(c_trim),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(q_full), np.asarray(q_trim),
                               atol=1e-7)
    # batch alignment round-trip: re-padded trimmed pass is inert past ct
    mm_pad = pad_cluster_matmul(spec2.cluster_mm, ct + 16)
    d_pad, c_pad, q_pad = _cluster_deltas_matmul(
        pos, spec2.rest_pos, spec2.clusters, rot0, mm_pad)
    np.testing.assert_allclose(np.asarray(d_pad), np.asarray(d_trim),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(q_pad), np.asarray(q_trim),
                               atol=1e-7)


def test_cluster_segments_match_gather_granular_scene():
    """The contiguous-segment cluster pass (granular granule layout) must
    reproduce the gather formulation."""
    import jax

    from adaptigraph_tpu.scenes import build_scene
    from adaptigraph_tpu.scenes.build import Caps
    from adaptigraph_tpu.engine.state import build_cluster_segments
    from adaptigraph_tpu.engine.solver import (
        _cluster_deltas, _cluster_deltas_segments)

    b = build_scene("granular", np.random.RandomState(5),
                    caps=Caps(n=4096, s=0, c=256, k=640, m=8))
    spec, st = b.spec, b.state
    seg = build_cluster_segments(spec.clusters, spec.rest_pos, 4096)
    assert seg is not None
    pos = st.particles.pos + 0.01 * jax.random.normal(
        jax.random.PRNGKey(0), st.particles.pos.shape)
    d1, c1, q1 = _cluster_deltas(pos, spec.clusters, st.cluster_rot,
                                 inc=spec.cluster_inc)
    d2, c2, q2 = _cluster_deltas_segments(pos, spec.rest_pos, spec.clusters,
                                          st.cluster_rot, seg)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-3)


def test_fused_shape_contacts_match_xla_pass_in_solver():
    """xpbd_step(n_shapes_active=M) fuses the kinematic-shape contact
    stage into the Pallas sweep; positions must match the separate XLA
    pass on a scene where the pusher genuinely displaces particles."""
    import numpy as np
    import jax.numpy as jnp
    from adaptigraph_tpu.scenes.build import build_scene, Caps
    from adaptigraph_tpu.engine.state import (SHAPE_BOX, SHAPE_PLANE,
                                              make_shapes)
    from adaptigraph_tpu.engine import xpbd_step

    caps = Caps(n=512, s=0, c=64, k=512, m=4)
    shapes = make_shapes([SHAPE_PLANE, SHAPE_BOX],
                         [[0, 0, 0], [0.05, 0.4, 0.8]],
                         [[0, 0, 0], [0, 0.4, 0]],
                         [[0, 0, 0, 1], [0, 0, 0, 1]], m_max=4)
    b = build_scene("rope", np.random.RandomState(0), shapes=shapes,
                    caps=caps,
                    scene_overrides={"length": 1.0,
                                     "translation": np.array([0, 1.0, 0],
                                                             np.float32),
                                     "z_rotation": 0.0, "y_rotation": 90.0})
    st = b.state
    p0 = np.asarray(st.particles.pos)[: b.n_active]
    sh = st.shapes
    newp = np.asarray(sh.pos).copy()
    newp[1, 1] = 0.9
    newp[1, 0] = float(p0[:, 0].mean())
    st = st._replace(shapes=sh.moved_to(jnp.asarray(newp), sh.quat))
    outs = {}
    for ns in (None, 2):
        s2 = xpbd_step(st, b.spec, 2, 4, contact_mode="block",
                       n_shapes_active=ns)
        outs[ns] = np.asarray(s2.particles.pos)[: b.n_active]
    assert np.abs(outs[None] - p0).max() > 1e-4  # pusher genuinely acted
    np.testing.assert_allclose(outs[None], outs[2], atol=2e-5)
