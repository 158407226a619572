"""Cloth triangle-mesh rasterization (sim/render.py::_cloth_mesh_fragments).

The reference draws cloth as a shaded GL triangle mesh
(by_softgym_cloth.h render_mode=2, opengl/shadersGL.cpp); render_frame's
cloth_dims path must therefore produce gap-free mesh coverage (not just
particle splats), correct interpolated depth, and correct occlusion
against kinematic shapes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from adaptigraph_tpu.engine.state import SHAPE_BOX, make_shapes
from adaptigraph_tpu.sim.render import (
    _cloth_grid_faces, render_frame)


def _no_shapes():
    """One padded (invalid) box: an empty kinematic shape set."""
    s = make_shapes([SHAPE_BOX], [[0.1, 0.1, 0.1]], [[0.0, -10.0, 0.0]],
                    [[0.0, 0.0, 0.0, 1.0]])
    return s._replace(valid=s.valid.at[0].set(False))


def _flat_grid(dimx, dimz, spacing, y=0.5):
    xs = np.arange(dimx) * spacing
    zs = np.arange(dimz) * spacing
    zz, xx = np.meshgrid(zs, xs, indexing="ij")
    pos = np.stack([xx, np.full_like(xx, y), zz], axis=-1).reshape(-1, 3)
    pos -= pos.mean(0) * np.array([1.0, 0.0, 1.0])
    return pos.astype(np.float32)


def _down_cam(h=3.0):
    """Near-top-down camera. Exactly straight down is degenerate for the
    y-up basis (cross(up, fwd) = 0), so look down with a slight z tilt and
    place the camera so the optical axis still passes through the origin."""
    tilt = 0.08
    cam_pos = jnp.array([0.0, h, -tilt * h])
    fwd = jnp.array([0.0, -1.0, tilt])
    return cam_pos, fwd / jnp.linalg.norm(fwd)


def _render(pos, cloth_dims, width=96, height=96, splat_px=0,
            point_radius=1e-4, cam_h=3.0):
    n = pos.shape[0]
    colors = jnp.full((n, 3), 0.5)
    active = jnp.ones((n,), bool)
    shapes = _no_shapes()
    cam_pos, fwd = _down_cam(cam_h)
    intr = jnp.array([80.0, 80.0, 48.0, 48.0])
    return render_frame(jnp.asarray(pos), colors, active, shapes,
                        cam_pos, fwd, intr,
                        width=width, height=height, splat_px=splat_px,
                        point_radius=point_radius, cloth_dims=cloth_dims)


def test_grid_faces_topology():
    faces = _cloth_grid_faces(3, 4)
    assert faces.shape == (2 * 2 * 3, 3)
    # every quad contributes its 4 corners across its two triangles
    quad0 = set(faces[0]) | set(faces[len(faces) // 2])
    assert quad0 == {0, 1, 3, 4}
    assert faces.max() == 3 * 4 - 1


def test_mesh_fills_between_sparse_particles():
    """Splats alone cannot cover a widely spaced grid; the mesh must.

    Cell pitch ~6 px — the raster tile covers triangles up to ~7 px
    (production cloth is 2.6-5.2 px/cell at 360^2/720^2; larger triangles
    fall back to splat hole-fill)."""
    dim = 8
    pos = _flat_grid(dim, dim, spacing=0.18, y=0.5)
    frame = _render(pos, cloth_dims=(dim, dim))
    depth = np.asarray(frame[..., 4])
    # interior footprint of the sheet: central half of its projected bbox
    hit = depth > 0
    ys, xs = np.nonzero(hit)
    y0, y1 = ys.min(), ys.max()
    x0, x1 = xs.min(), xs.max()
    cy0, cy1 = y0 + (y1 - y0) // 4, y1 - (y1 - y0) // 4
    cx0, cx1 = x0 + (x1 - x0) // 4, x1 - (x1 - x0) // 4
    interior = hit[cy0:cy1, cx0:cx1]
    assert interior.size > 100
    assert interior.mean() > 0.999, "mesh rasterization left holes"
    # without the mesh (no cloth_dims) the sparse splats cover almost nothing
    frame_splat = _render(pos, cloth_dims=None)
    cov_splat = (np.asarray(frame_splat[..., 4]) > 0)[cy0:cy1, cx0:cx1].mean()
    assert cov_splat < 0.6


def test_mesh_depth_is_metric():
    """Depth output is metric z along the camera forward axis: for a flat
    sheet it equals (cam ray to plane) distance projected on the axis —
    (cam_h - y) at the optical center, slightly larger off-axis."""
    dim = 8
    y = 0.75
    cam_h = 3.0
    pos = _flat_grid(dim, dim, spacing=0.18, y=y)
    frame = _render(pos, cloth_dims=(dim, dim), cam_h=cam_h)
    depth = np.asarray(frame[..., 4])
    vals = depth[depth > 0]
    assert vals.size > 500
    expect = cam_h - y
    assert np.all(np.abs(vals - expect) < 0.05 * expect)
    assert abs(np.median(vals) - expect) < 0.02 * expect


def test_mesh_occludes_and_is_occluded():
    """Cloth above a box hides it; a box above the cloth hides the cloth."""
    dim = 8
    pos = _flat_grid(dim, dim, spacing=0.18, y=0.5)
    n = pos.shape[0]
    colors = jnp.full((n, 3), 0.5)
    active = jnp.ones((n,), bool)
    cam_pos, fwd = _down_cam(3.0)
    intr = jnp.array([80.0, 80.0, 48.0, 48.0])

    def render_with_box(box_y):
        shapes = make_shapes([SHAPE_BOX], [[0.2, 0.05, 0.2]],
                             [[0.0, box_y, 0.0]], [[0.0, 0.0, 0.0, 1.0]])
        return render_frame(jnp.asarray(pos), colors, active, shapes,
                            cam_pos, fwd, intr,
                            width=96, height=96, splat_px=0,
                            point_radius=1e-4, cloth_dims=(dim, dim))

    below = np.asarray(render_with_box(0.2))
    above = np.asarray(render_with_box(1.5))
    center = (slice(44, 52), slice(44, 52))
    # box below: center depth is the cloth's (3.0 - 0.5)
    np.testing.assert_allclose(below[..., 4][center], 2.5, atol=2e-2)
    # box above: center depth is the box top (3.0 - 1.55)
    np.testing.assert_allclose(above[..., 4][center], 1.45, atol=2e-2)


def test_non_cloth_render_unchanged():
    """cloth_dims=None keeps the splat-only path byte-identical."""
    rng = np.random.default_rng(0)
    pos = rng.uniform(-0.5, 0.5, (64, 3)).astype(np.float32) + [0, 0.5, 0]
    a = np.asarray(_render(pos, cloth_dims=None, splat_px=2,
                           point_radius=0.04))
    b = np.asarray(_render(pos, cloth_dims=None, splat_px=2,
                           point_radius=0.04))
    np.testing.assert_array_equal(a, b)
    assert (a[..., 4] > 0).sum() > 0


def test_mesh_shading_two_sided():
    """A tilted sheet still lights (two-sided Lambert, no black backface)."""
    dim = 8
    pos = _flat_grid(dim, dim, spacing=0.25, y=0.5)
    # tilt 140 deg about x so the face normal points away from the light
    th = np.deg2rad(140.0)
    rot = np.array([[1, 0, 0],
                    [0, np.cos(th), -np.sin(th)],
                    [0, np.sin(th), np.cos(th)]], dtype=np.float32)
    pos = pos @ rot.T + np.array([0, 0.8, 0], dtype=np.float32)
    frame = np.asarray(_render(pos, cloth_dims=(dim, dim)))
    mask = frame[..., 4] > 0
    assert mask.sum() > 50
    assert frame[..., :3][mask].mean() > 0.15
