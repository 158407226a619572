"""Scene sampler/builder tests: parameter distributions match the reference
ranges (src/sim/sim_env/scenes.py) and built scenes are structurally sound."""

import numpy as np
import pytest

from adaptigraph_tpu.scenes import sample_scene, build_scene
from adaptigraph_tpu.scenes.build import greedy_ball_cover, MATERIAL_CAPS


class TestSamplers:
    def test_rope_stiffness_map_soft_branch(self):
        # stiffness < 0.5: global = s*1e-4/0.5, spacing = 2+8s (scenes.py:25-27)
        rng = np.random.RandomState(1)
        for _ in range(50):
            scene, props = sample_scene("rope", rng)
            s = props["stiffness"]
            if s < 0.5:
                assert props["global_stiffness"] == pytest.approx(s * 1e-4 / 0.5)
                assert props["cluster_spacing"] == pytest.approx(2 + 8 * s)
            else:
                assert props["global_stiffness"] == pytest.approx((s - 0.5) * 4e-4 + 1e-4)
                assert props["cluster_spacing"] == pytest.approx(6 + 4 * (s - 0.5))
            assert 2.5 <= props["length"] <= 3.0

    def test_granular_counts(self):
        rng = np.random.RandomState(2)
        for _ in range(20):
            scene, props = sample_scene("granular", rng)
            assert 0.1 <= props["granular_scale"] <= 0.3
            assert props["num_granular"] == scene["num_x"] * scene["num_z"]
            assert scene["num_x"] >= 1 and scene["num_z"] >= 1

    def test_cloth_stiffness_coupling(self):
        rng = np.random.RandomState(3)
        for _ in range(20):
            scene, props = sample_scene("cloth", rng)
            sf = props["sf"]
            assert props["dynamic_friction"] == pytest.approx(-sf * 0.9 + 1.0)
            assert 1.0 <= props["stretch_stiffness"] <= 1.5
            assert props["bend_stiffness"] == pytest.approx(sf * 1.4 + 0.1)


class TestGreedyCover:
    def test_covers_all_points(self, rng):
        pts = rng.rand(200, 3).astype(np.float32)
        clusters = greedy_ball_cover(pts, 0.3)
        covered = np.zeros(200, dtype=bool)
        for m in clusters:
            covered[m] = True
        assert covered.all()

    def test_cluster_members_within_radius(self, rng):
        pts = rng.rand(100, 3).astype(np.float32) * 2
        for m in greedy_ball_cover(pts, 0.5):
            # all members are within radius of SOME seed: the seed is the
            # highest-index unused point, which is always in the cluster
            d = np.linalg.norm(pts[m][:, None] - pts[m][None], axis=-1)
            assert d.max() <= 1.0 + 1e-6  # diameter bound


class TestBuilders:
    def test_rope_structure(self):
        b = build_scene("rope", np.random.RandomState(0))
        caps = MATERIAL_CAPS["rope"]
        assert 0 < b.n_active <= caps.n
        assert int(np.asarray(b.spec.clusters.valid).sum()) > 0
        assert int(np.asarray(b.spec.springs.valid).sum()) == 0  # linkRadius=0
        # one end pinned (y<0.4 rule), one end free
        w = np.asarray(b.state.particles.inv_mass)[: b.n_active]
        assert 0 < (w == 0).sum() < b.n_active
        assert float(b.spec.global_stiffness) >= 0
        assert (b.substeps, b.iterations) == (2, 4)

    def test_cloth_structure(self):
        b = build_scene("cloth", np.random.RandomState(1))
        assert b.n_active == 4900
        # springs live as static-offset families (attach_incidence converts
        # the grid topology; leftover irregular set must be empty)
        os_ = b.spec.offset_springs
        assert os_ is not None and int(np.asarray(b.spec.springs.valid).sum()) == 0
        n_springs = int(np.asarray(os_.valid).sum())
        # 2 axes x (stretch 70*69 + bend 70*68) + shear 2*69*69
        assert n_springs == 2 * (70 * 69) + 2 * (70 * 68) + 2 * 69 * 69
        assert (b.substeps, b.iterations) == (4, 50)
        # spring rests: stretch=r, shear=sqrt(2) r, bend=2r
        rest = np.asarray(os_.rest)[np.asarray(os_.valid)]
        uniq = np.unique(np.round(rest, 5))
        want = np.array([0.03, 0.03 * np.sqrt(2), 0.06])
        np.testing.assert_allclose(np.sort(uniq), np.sort(want), atol=1e-5)

    def test_granular_structure(self):
        b = build_scene("granular", np.random.RandomState(2))
        nclusters = int(np.asarray(b.spec.clusters.valid).sum())
        assert nclusters > 0
        group = np.asarray(b.state.particles.group)[: b.n_active]
        # every granule is its own collision group == its own cluster
        assert len(np.unique(group)) == nclusters
        # rigid stiffness 0.8 everywhere (by_granular.h:67)
        stiff = np.asarray(b.spec.clusters.stiffness)[np.asarray(b.spec.clusters.valid)]
        np.testing.assert_allclose(stiff, 0.8)
        assert (b.substeps, b.iterations) == (12, 6)

    def test_rope_from_obj_mesh(self, tmp_path):
        """OBJ-driven rope (the reference's rope.obj import path): same
        world dims, clusters, and pinning as the procedural lattice."""
        from adaptigraph_tpu.scenes.mesh import export_obj, make_cylinder_mesh

        obj = tmp_path / "rope.obj"
        export_obj(make_cylinder_mesh(length=1.0, radius=0.0165), str(obj))
        b = build_scene("rope", np.random.RandomState(0),
                        scene_overrides={"mesh_path": str(obj)})
        b_ref = build_scene("rope", np.random.RandomState(0))
        caps = MATERIAL_CAPS["rope"]
        assert 0 < b.n_active <= caps.n
        # same world extents as the procedural build (within a voxel)
        pos = np.asarray(b.state.particles.pos)[: b.n_active]
        ref = np.asarray(b_ref.state.particles.pos)[: b_ref.n_active]
        np.testing.assert_allclose(pos.min(0), ref.min(0), atol=0.12)
        np.testing.assert_allclose(pos.max(0), ref.max(0), atol=0.12)
        assert int(np.asarray(b.spec.clusters.valid).sum()) > 0
        w = np.asarray(b.state.particles.inv_mass)[: b.n_active]
        assert 0 < (w == 0).sum() < b.n_active  # y<0.4 pinning applies

    def test_rope_overflow_seed_truncates_to_cap(self):
        # seed 4 samples length=2.98 -> 3129 lattice points > cap 3072;
        # the build must truncate tail slices, not crash
        b = build_scene("rope", np.random.RandomState(4))
        assert b.n_active == MATERIAL_CAPS["rope"].n

    def test_pairs_within_matches_dense(self, rng):
        from adaptigraph_tpu.scenes.mesh import _pairs_within

        pts = rng.rand(200, 3).astype(np.float32)
        idx, dist = _pairs_within(pts, 0.2)
        d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        iu = np.triu_indices(200, k=1)
        want = set(zip(iu[0][d[iu] < 0.2].tolist(), iu[1][d[iu] < 0.2].tolist()))
        assert set(map(tuple, idx.tolist())) == want
        np.testing.assert_allclose(
            dist, np.linalg.norm(pts[idx[:, 0]] - pts[idx[:, 1]], axis=-1), rtol=1e-6)

    def test_builds_are_seed_deterministic(self):
        b1 = build_scene("rope", np.random.RandomState(7))
        b2 = build_scene("rope", np.random.RandomState(7))
        np.testing.assert_array_equal(np.asarray(b1.state.particles.pos),
                                      np.asarray(b2.state.particles.pos))


def test_truncation_stamped_into_props():
    """Capacity-cap truncations must be recorded in property_params
    (episode physics labels) so the data distribution shift is visible
    downstream (scenes/build.py rope tail-slice drop + granular grid cap)."""
    import numpy as np
    from adaptigraph_tpu.scenes import build_scene
    from adaptigraph_tpu.scenes.build import MATERIAL_CAPS, Caps

    rng = np.random.RandomState(0)
    small = MATERIAL_CAPS["rope"]._replace(n=512)
    b = build_scene("rope", rng, caps=small)
    assert b.props.get("truncated_particles", 0) > 0
    assert b.n_active == 512

    rng = np.random.RandomState(0)
    gsmall = MATERIAL_CAPS["granular"]._replace(n=1024, c=600)
    g = build_scene("granular", rng, caps=gsmall)
    assert g.props.get("truncated_granules", 0) > 0

    # an uncapped build must NOT carry the keys
    rng = np.random.RandomState(1)
    full = build_scene("rope", rng)
    assert "truncated_particles" not in full.props or \
        full.props["truncated_particles"] == 0


def test_bucketed_caps_rebuild_identical_scene():
    """Per-scene capacity bucketing (scenes/build.bucket_caps + SimEnv.reset
    probe-rebuild): building at the smallest fitting bucket from an
    identically-seeded rng must reproduce the full-cap scene exactly —
    the builder consumes the same random stream when nothing hits a cap."""
    from adaptigraph_tpu.scenes.build import MATERIAL_CAPS, bucket_caps

    base = MATERIAL_CAPS["granular"]
    for seed in (3, 7):
        full = build_scene("granular", np.random.RandomState(seed), caps=base)
        cl = full.spec.clusters
        caps = bucket_caps(full.n_active,
                           int(np.asarray(cl.valid).sum()),
                           int(np.asarray(cl.member_valid).sum(1).max()), base)
        small = build_scene("granular", np.random.RandomState(seed), caps=caps)
        assert caps.n >= full.n_active and small.n_active == full.n_active
        assert caps.n % 128 == 0 and caps.c % 128 == 0 and caps.k % 128 == 0
        na = full.n_active
        np.testing.assert_array_equal(
            np.asarray(full.state.particles.pos)[:na],
            np.asarray(small.state.particles.pos)[:na])
        np.testing.assert_array_equal(
            np.asarray(full.state.particles.group)[:na],
            np.asarray(small.state.particles.group)[:na])
