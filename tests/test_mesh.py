"""Mesh asset toolkit tests (SURVEY.md N4/N5): OBJ io, transforms, AABB-tree
closest point vs brute force, parity voxelization volumes, SDF signs, and the
mesh -> soft-body pipeline feeding the XPBD engine."""

import numpy as np
import jax.numpy as jnp
import pytest

from adaptigraph_tpu.scenes.mesh import (
    AABBTree,
    TriMesh,
    export_obj,
    import_obj,
    make_box_mesh,
    make_cylinder_mesh,
    make_icosphere,
    raycast,
    sample_mesh,
    signed_distance_grid,
    soft_from_mesh,
    voxelize,
    _closest_on_triangles,
)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


class TestObjIO:
    def test_roundtrip(self, tmp_path):
        m = make_box_mesh((0.3, 0.5, 0.7))
        p = tmp_path / "box.obj"
        export_obj(m, str(p))
        m2 = import_obj(str(p))
        np.testing.assert_allclose(m2.vertices, m.vertices, rtol=1e-6)
        np.testing.assert_array_equal(m2.faces, m.faces)

    def test_quad_fan_and_negative_indices(self, tmp_path):
        p = tmp_path / "quad.obj"
        p.write_text(
            "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
            "f 1/1/1 2/2/2 3/3/3 4/4/4\n"  # quad with vt/vn refs -> 2 tris
            "f -4 -3 -2\n"  # negative (relative) indices
        )
        m = import_obj(str(p))
        assert m.vertices.shape == (4, 3)
        np.testing.assert_array_equal(m.faces, [[0, 1, 2], [0, 2, 3], [0, 1, 2]])


class TestTransforms:
    def test_normalized_unit_extent_origin_corner(self):
        m = make_box_mesh((1.0, 2.0, 0.5)).translated([3, -1, 2]).normalized()
        lo, hi = m.bounds
        np.testing.assert_allclose(lo, 0, atol=1e-6)
        assert abs((hi - lo).max() - 1.0) < 1e-6

    def test_homogeneous_transform(self):
        m = make_box_mesh()
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = [1, 2, 3]
        lo, hi = m.transformed(t).bounds
        np.testing.assert_allclose((lo + hi) / 2, [1, 2, 3], atol=1e-6)


class TestClosestPoint:
    def test_matches_bruteforce(self, rng):
        mesh = make_icosphere(radius=0.5, subdiv=1)
        tree = AABBTree(mesh)
        q = rng.randn(40, 3) * 0.8
        dist, _, _ = tree.closest_point(q)
        tri = mesh.triangles().astype(np.float64)
        for qi in range(len(q)):
            cp = _closest_on_triangles(np.broadcast_to(q[qi], (len(tri), 3)), tri)
            brute = np.sqrt(((cp - q[qi]) ** 2).sum(1).min())
            assert abs(dist[qi] - brute) < 1e-9

    def test_sphere_distance_analytic(self, rng):
        mesh = make_icosphere(radius=0.5, subdiv=3)
        tree = AABBTree(mesh)
        q = rng.randn(10, 3)
        q = q / np.linalg.norm(q, axis=1, keepdims=True) * 2.0  # radius-2 shell
        dist, _, _ = tree.closest_point(q)
        np.testing.assert_allclose(dist, 1.5, atol=0.01)  # 2.0 - 0.5, faceting tol


class TestRaycast:
    def test_box_hit_and_miss(self):
        m = make_box_mesh()  # cube [-0.5, 0.5]^3
        t, tid = raycast(m, [[-2, 0.1, 0.1], [-2, 5, 0]], [[1, 0, 0], [1, 0, 0]])
        assert abs(t[0] - 1.5) < 1e-9 and tid[0] >= 0
        assert np.isinf(t[1]) and tid[1] == -1


class TestVoxelize:
    def test_box_volume(self):
        m = make_box_mesh()  # unit cube, volume 1
        vox = voxelize(m, dx=0.05)
        vol = vox.occupancy.sum() * vox.dx ** 3
        assert abs(vol - 1.0) < 0.1

    def test_sphere_volume(self):
        m = make_icosphere(radius=0.5, subdiv=3)
        vox = voxelize(m, dims=(32, 32, 32))
        vol = vox.occupancy.sum() * vox.dx ** 3
        expect = 4 / 3 * np.pi * 0.5 ** 3
        assert abs(vol - expect) / expect < 0.12

    def test_occupied_centers_inside(self):
        m = make_box_mesh((0.5, 0.25, 0.4))
        vox = voxelize(m, dx=0.06, margin=2)
        ii = np.argwhere(vox.occupancy)
        pts = vox.origin + ii * vox.dx
        assert (np.abs(pts) <= np.array([0.5, 0.25, 0.4]) + 1e-6).all()


class TestSDF:
    def test_box_signs_and_values(self):
        m = make_box_mesh()
        sdf = signed_distance_grid(m, dims=24, margin=3)
        inside = sdf.sample([[0.0, 0.0, 0.0]])[0]
        outside = sdf.sample([[0.6, 0.0, 0.0]])[0]  # within the margin band
        assert -0.56 < inside < -0.40  # center of unit cube: -0.5
        assert 0.05 < outside < 0.16  # 0.1 past the +x face (dx ~ 0.042)


class TestSampleAndSoft:
    def test_sample_mesh_covers_cylinder(self):
        m = make_cylinder_mesh(length=2.0, radius=0.2)
        pts = sample_mesh(m, radius=0.08)
        assert len(pts) > 100
        # samples live inside the (slightly padded) cylinder volume
        assert (np.abs(pts[:, 0]) <= 1.0 + 0.08).all()
        assert (np.linalg.norm(pts[:, 1:], axis=1) <= 0.2 + 0.08).all()
        # spans nearly the full length
        assert pts[:, 0].max() - pts[:, 0].min() > 1.7

    def test_soft_from_mesh_recipe(self):
        m = make_cylinder_mesh(length=2.0, radius=0.2).translated([5, 5, 5])
        asset = soft_from_mesh(m, particle_radius=0.1, cluster_spacing=2.0,
                               link_radius=2.5, global_stiffness=0.02)
        # recentred at the origin regardless of input placement
        assert np.abs(asset.points.mean(0)).max() < 0.15
        covered = np.zeros(len(asset.points), dtype=bool)
        for c in asset.clusters:
            covered[c] = True
        assert covered.all()
        assert len(asset.spring_idx) > 0
        d = np.linalg.norm(
            asset.points[asset.spring_idx[:, 0]] - asset.points[asset.spring_idx[:, 1]],
            axis=1)
        np.testing.assert_allclose(d, asset.spring_rest, rtol=1e-5)
        assert (asset.spring_rest < 2.5 * 0.1).all()

    def test_soft_asset_settles_in_engine(self):
        """Mesh-built soft body dropped on the floor: runs the real solver,
        stays finite, and lands resting on the plane."""
        from adaptigraph_tpu.engine import SceneSpec, SceneState, SolverParams, xpbd_step
        from adaptigraph_tpu.engine.state import (
            SHAPE_PLANE, empty_springs, make_clusters, make_particles, make_shapes,
            make_springs,
        )

        m = make_cylinder_mesh(length=1.2, radius=0.15)
        asset = soft_from_mesh(m, particle_radius=0.1, cluster_spacing=3.0,
                               cluster_stiffness=0.6)
        pts = asset.points + np.array([0, 0.5, 0], dtype=np.float32)
        particles = make_particles(pts, group=0, self_collide=True)
        clusters = make_clusters(asset.clusters, pts, asset.cluster_stiffness)
        rest = np.zeros((0, 3), np.float32)  # no global cluster
        spec = SceneSpec(
            springs=(make_springs(asset.spring_idx, asset.spring_rest,
                                  asset.spring_stiffness)
                     if len(asset.spring_idx) else empty_springs(4)),
            clusters=clusters,
            global_stiffness=jnp.float32(0.0),
            global_rest=jnp.asarray(rest),
            rest_pos=jnp.asarray(pts),
            params=SolverParams(radius=jnp.float32(0.1),
                                collision_distance=jnp.float32(0.05)),
        )
        shapes = make_shapes([SHAPE_PLANE], [[0, 0, 0]], [[0, 0, 0]], [[0, 0, 0, 1]])
        st = SceneState(particles=particles, shapes=shapes,
                        cluster_rot=jnp.tile(jnp.array([0.0, 0, 0, 1.0]),
                                             (clusters.stiffness.shape[0], 1)),
                        global_rot=jnp.array([0.0, 0, 0, 1.0]))
        for _ in range(40):
            st = xpbd_step(st, spec, substeps=2, iterations=4)
        pos = np.asarray(st.particles.pos)[: len(pts)]
        assert np.isfinite(pos).all()
        assert pos[:, 1].min() > -0.05  # not through the floor
        assert pos[:, 1].max() < 0.6  # came down from the drop height
