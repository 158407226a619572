"""On-device renderer: analytic shape raycast + particle point splatting.

TPU-native replacement for the OpenGL/EGL offscreen renderer
(PyFleX/bindings/opengl/, readback pyflex.cpp:3500-3711). Instead of a GL
pipeline we produce the same (H, W, 5) RGBA+depth frames with pure array
ops, which jit/vmap over cameras and capture frames:

  * kinematic shapes (table boxes, floor, tool capsule/board) are rendered
    by exact per-pixel ray intersection — slab test for boxes, quadratic for
    capsules, plane hit for the floor; a handful of shapes x H*W rays is one
    fused VPU pass;
  * particles are splatted as screen-space discs with a z-buffer realized by
    two scatter passes (scatter-min depth, then write colors where the depth
    matches);
  * depth output is metric distance along the camera ray's z (same
    "linearized depth" convention as pyflex.cpp:3699-3703); background = 0.

Lambert-ish shading from a fixed light direction keeps images contrastful
for the color-difference action gate (src/sim/data_gen/data_gen.py:86-94).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from adaptigraph_tpu.engine.state import (
    SHAPE_BOX, SHAPE_CAPSULE, SHAPE_CONVEX, ShapeSet)
from adaptigraph_tpu.utils import geometry as geo

_FAR = 1e9
_LIGHT = jnp.array([0.3, 0.8, 0.5])
_BG = jnp.array([0.9, 0.9, 0.9])
_SHAPE_COLOR = jnp.array([160.0 / 255] * 3)


def _ray_box(ro, rd, half):
    """Slab test: origin/dir in box local frame. Returns (t, normal)."""
    inv = 1.0 / jnp.where(jnp.abs(rd) < 1e-9, jnp.where(rd >= 0, 1e-9, -1e-9), rd)
    t0 = (-half - ro) * inv
    t1 = (half - ro) * inv
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    t_enter = jnp.max(tmin, axis=-1)
    t_exit = jnp.min(tmax, axis=-1)
    hit = (t_exit >= jnp.maximum(t_enter, 0.0))
    t = jnp.where(hit, jnp.where(t_enter > 0, t_enter, t_exit), _FAR)
    # normal: axis of the entering slab
    axis = jnp.argmax(tmin, axis=-1)
    n = -jnp.sign(rd) * jax.nn.one_hot(axis, 3, dtype=ro.dtype)
    return t, n


def _ray_capsule(ro, rd, radius, half_len):
    """Capsule along local x. Solve |(p - clamp(px))| = r approximately via
    infinite-cylinder hit clamped to caps (sphere caps included)."""
    oy = ro[..., 1:]
    dy = rd[..., 1:]
    a = jnp.sum(dy * dy, axis=-1)
    b = 2 * jnp.sum(oy * dy, axis=-1)
    c = jnp.sum(oy * oy, axis=-1) - radius**2
    disc = b * b - 4 * a * c
    t_cyl = jnp.where(disc >= 0, (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) / (2 * a + 1e-12), _FAR)
    px = ro[..., 0] + t_cyl * rd[..., 0]
    cyl_ok = (t_cyl > 0) & (jnp.abs(px) <= half_len)
    t = jnp.where(cyl_ok, t_cyl, _FAR)

    def sphere_t(center_x):
        oc = ro - jnp.stack([jnp.broadcast_to(center_x, ro[..., 0].shape),
                             jnp.zeros_like(ro[..., 0]), jnp.zeros_like(ro[..., 0])], -1)
        b2 = 2 * jnp.sum(oc * rd, axis=-1)
        c2 = jnp.sum(oc * oc, axis=-1) - radius**2
        d2 = b2 * b2 - 4 * c2
        ts = jnp.where(d2 >= 0, (-b2 - jnp.sqrt(jnp.maximum(d2, 0.0))) / 2, _FAR)
        return jnp.where(ts > 0, ts, _FAR)

    t = jnp.minimum(t, jnp.minimum(sphere_t(half_len), sphere_t(-half_len)))
    p = ro + t[..., None] * rd
    closest = jnp.stack([jnp.clip(p[..., 0], -half_len, half_len),
                         jnp.zeros_like(p[..., 0]), jnp.zeros_like(p[..., 0])], -1)
    n = p - closest
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-9)
    return jnp.where(t < _FAR, t, _FAR), n


def _ray_convex(ro, rd, planes):
    """Convex polytope (intersection of halfspaces n·x <= d) raycast — the
    render path for SHAPE_CONVEX kinematic shapes (robot arm link hulls; the
    reference draws the same links as GL triangle meshes, robot_env.py:19-60).
    Generalized slab test: entering planes (n·rd < 0) set t_enter = max,
    exiting planes set t_exit = min. Zero-normal rows are padding."""
    n = planes[..., :3]  # (P, 3)
    d = planes[..., 3]
    pvalid = jnp.sum(n * n, axis=-1) > 0.25
    denom = jnp.einsum("...i,pi->...p", rd, n)  # (..., P)
    num = d - jnp.einsum("...i,pi->...p", ro, n)
    t = num / jnp.where(jnp.abs(denom) < 1e-9,
                        jnp.where(denom >= 0, 1e-9, -1e-9), denom)
    entering = denom < 0
    # parallel rays outside a plane never hit: force a miss via t_enter=inf
    outside_parallel = (jnp.abs(denom) < 1e-9) & (num < 0) & pvalid
    t_in = jnp.where(entering & pvalid, t, -_FAR)
    t_in = jnp.where(outside_parallel, _FAR, t_in)
    t_out = jnp.where((~entering) & pvalid & (jnp.abs(denom) >= 1e-9), t, _FAR)
    t_enter = jnp.max(t_in, axis=-1)
    t_exit = jnp.min(t_out, axis=-1)
    hit = (t_exit >= jnp.maximum(t_enter, 0.0)) & (t_enter < _FAR) & \
        jnp.any(pvalid)
    thit = jnp.where(hit, jnp.where(t_enter > 0, t_enter, _FAR), _FAR)
    best = jnp.argmax(jnp.where(t_in == t_enter[..., None], 1.0, 0.0), axis=-1)
    nrm = n[best]
    return thit, nrm


def cloth_vertex_normals(pos, dimx: int, dimz: int):
    """Per-vertex normals for a dimz x dimx cloth grid laid out row-major
    (build_cloth's gid = z * dimx + x). Central differences inside the grid,
    one-sided at the borders. Returns (N, 3) with zero rows past the grid so
    non-grid/padding particles shade neutrally.

    This is the surfel half of the reference's shaded-mesh cloth rendering
    (by_softgym_cloth.h render_mode=2 draws the spring grid as a lit triangle
    mesh via opengl/shadersGL.cpp); we shade the splatted particles with the
    same per-vertex normals instead of rasterizing triangles."""
    n_total = pos.shape[0]
    grid = pos[: dimx * dimz].reshape(dimz, dimx, 3)

    def diff(g, axis):
        lo = (jax.lax.slice_in_dim(g, 1, 2, axis=axis)
              - jax.lax.slice_in_dim(g, 0, 1, axis=axis))
        hi = (jax.lax.slice_in_dim(g, g.shape[axis] - 1, g.shape[axis], axis=axis)
              - jax.lax.slice_in_dim(g, g.shape[axis] - 2, g.shape[axis] - 1, axis=axis))
        mid = (jax.lax.slice_in_dim(g, 2, g.shape[axis], axis=axis)
               - jax.lax.slice_in_dim(g, 0, g.shape[axis] - 2, axis=axis)) * 0.5
        return jnp.concatenate([lo, mid, hi], axis=axis)

    dx = diff(grid, 1)   # along x (columns)
    dz = diff(grid, 0)   # along z (rows)
    n = jnp.cross(dz, dx)
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-9)
    out = jnp.zeros((n_total, 3), dtype=pos.dtype)
    return out.at[: dimx * dimz].set(n.reshape(-1, 3))


def _cloth_grid_faces(dimx: int, dimz: int):
    """Triangle index array (T, 3) for the dimz x dimx row-major cloth grid
    (build_cloth's gid = z * dimx + x): two triangles per quad, the same
    topology the reference's mesh path draws (by_softgym_cloth.h
    render_mode=2 builds the spring grid into a GL triangle mesh). Host-side
    numpy — dims are static."""
    import numpy as np
    z, x = np.meshgrid(np.arange(dimz - 1), np.arange(dimx - 1), indexing="ij")
    v00 = (z * dimx + x).ravel()
    v01 = v00 + 1
    v10 = v00 + dimx
    v11 = v10 + 1
    tris = np.concatenate([
        np.stack([v00, v10, v01], axis=-1),
        np.stack([v01, v10, v11], axis=-1)], axis=0)
    return tris.astype(np.int32)


_MESH_TILE = 8  # rasterization tile half-quad triangles fit into (pixels)


def _mesh_enabled() -> bool:
    """Escape hatch: ADAPTIGRAPH_CLOTH_MESH=0 drops the mesh fragments and
    keeps the r2 surfel-shaded splats (the mesh raster grows the z-buffer
    scatter ~6x for cloth; the remote TPU worker has a history of hanging
    on outsized programs — CLAUDE.md). Read at trace time."""
    import os
    return os.environ.get("ADAPTIGRAPH_CLOTH_MESH", "1") != "0"


def _cloth_mesh_fragments(pos, base_colors, faces, rot, cam_pos, intrinsics,
                          width: int, height: int):
    """Rasterize the cloth triangle mesh into z-buffer fragments.

    TPU-native replacement for the reference's shaded-mesh cloth rendering
    (by_softgym_cloth.h render_mode=2 + opengl/shadersGL.cpp): instead of a
    GL raster pipeline, each triangle tests a fixed _MESH_TILE^2 pixel tile
    anchored at its screen bbox corner — barycentric inside test, linear
    screen-space z, two-sided Lambert face shading — and the fragments merge
    into render_frame's scatter-min z-buffer alongside the particle splats
    (which remain as hole-fill for triangles larger than the tile, e.g.
    extreme close-ups). Returns (pix, z, col, ok): (T*K,), (T*K,), (T*K, 3),
    (T*K,) arrays ready to concatenate with the splat fragment list."""
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    tv = pos[faces]                       # (T, 3, 3) world verts
    tcol = jnp.mean(base_colors[faces], axis=1)  # (T, 3)

    p_cam = (tv - cam_pos) @ rot.T
    z = -p_cam[..., 2]                    # (T, 3)
    valid = jnp.all(z > 0.01, axis=-1)
    zs = jnp.maximum(z, 1e-6)
    u = p_cam[..., 0] * fx / zs + cx      # (T, 3)
    v = -p_cam[..., 1] * fy / zs + cy

    # face normal -> two-sided Lambert (a sheet lights from either side)
    n = jnp.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-9)
    lam = jnp.abs(n @ (_LIGHT / jnp.linalg.norm(_LIGHT)))
    shade = (0.35 + 0.65 * lam)[:, None] * tcol   # (T, 3)

    # tile anchored at the bbox min pixel
    u0 = jnp.floor(jnp.min(u, axis=-1))   # (T,)
    v0 = jnp.floor(jnp.min(v, axis=-1))
    offs = jnp.arange(_MESH_TILE, dtype=jnp.float32)
    du, dv = jnp.meshgrid(offs, offs, indexing="ij")
    du, dv = du.ravel(), dv.ravel()       # (K,)
    px = u0[:, None] + du[None, :] + 0.5  # pixel centers, (T, K)
    py = v0[:, None] + dv[None, :] + 0.5

    def edge(ax, ay, bx, by, px, py):
        return (bx - ax)[:, None] * (py - ay[:, None]) \
            - (by - ay)[:, None] * (px - ax[:, None])

    w0 = edge(u[:, 1], v[:, 1], u[:, 2], v[:, 2], px, py)
    w1 = edge(u[:, 2], v[:, 2], u[:, 0], v[:, 0], px, py)
    w2 = edge(u[:, 0], v[:, 0], u[:, 1], v[:, 1], px, py)
    area = w0 + w1 + w2                   # 2x signed area, (T, K) constant per T
    denom = jnp.where(jnp.abs(area) < 1e-9, 1e-9, area)
    b0, b1, b2 = w0 / denom, w1 / denom, w2 / denom
    inside = (b0 >= -1e-6) & (b1 >= -1e-6) & (b2 >= -1e-6) \
        & (jnp.abs(area) > 1e-9)
    zf = b0 * z[:, 0:1] + b1 * z[:, 1:2] + b2 * z[:, 2:3]  # (T, K)

    ipx = jnp.round(px - 0.5).astype(jnp.int32)
    ipy = jnp.round(py - 0.5).astype(jnp.int32)
    in_img = (ipx >= 0) & (ipx < width) & (ipy >= 0) & (ipy < height)
    ok = inside & in_img & valid[:, None] & (zf > 0.01)
    pix = jnp.where(ok, ipy * width + ipx, 0)
    zfrag = jnp.where(ok, zf, _FAR)
    col = jnp.broadcast_to(shade[:, None, :], pix.shape + (3,))
    return (pix.ravel(), zfrag.ravel(), col.reshape(-1, 3), ok.ravel())


def _ray_plane(ro, rd):
    t = -ro[..., 1] / jnp.where(jnp.abs(rd[..., 1]) < 1e-9, 1e-9, rd[..., 1])
    t = jnp.where(t > 0, t, _FAR)
    n = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), ro.shape)
    return t, n


@partial(jax.jit, static_argnames=("width", "height", "splat_px", "cloth_dims"))
def render_frames_store(pos, colors, active, shapes: ShapeSet, shape_pos,
                        shape_quat, cam_pos, cam_fwd, intrinsics,
                        width: int = 720, height: int = 720, splat_px: int = 2,
                        point_radius: float = 0.04, cloth_dims=None):
    """render_frames_batch quantized ON DEVICE to the h5 schema dtypes:
    (color (F, C, H, W, 3) uint8 RGB, depth (F, C, H, W) uint16 mm).
    Capture transfers ride the remote-TPU tunnel; shipping f32 RGBA+depth
    cost 8x the bytes of the uint8/uint16 the episode stores anyway."""
    f = render_frames_batch(pos, colors, active, shapes, shape_pos, shape_quat,
                            cam_pos, cam_fwd, intrinsics, width=width,
                            height=height, splat_px=splat_px,
                            point_radius=point_radius, cloth_dims=cloth_dims)
    color = (jnp.clip(f[..., :3], 0.0, 1.0) * 255).astype(jnp.uint8)
    depth = (f[..., 4] * 1000).astype(jnp.uint16)
    return color, depth


@partial(jax.jit, static_argnames=("width", "height", "splat_px", "cloth_dims"))
def render_frames_batch(pos, colors, active, shapes: ShapeSet, shape_pos,
                        shape_quat, cam_pos, cam_fwd, intrinsics,
                        width: int = 720, height: int = 720, splat_px: int = 2,
                        point_radius: float = 0.04, cloth_dims=None):
    """Render F frames x C cameras in ONE device program.

    Capture rendering previously dispatched one program per (frame, camera)
    — at remote-TPU tunnel latency (~seconds/dispatch) that dominates
    episode generation wall-clock. Args: pos (F, N, 3); colors (N, 3);
    active (F, N); shapes: static shape set whose per-frame poses come from
    shape_pos (F, M, 3) / shape_quat (F, M, 4); cam_pos/cam_fwd (C, 3);
    intrinsics (4,). Returns (F, C, H, W, 5)."""

    def one(p, a, sp, sq):
        sh = shapes._replace(pos=sp, quat=sq)
        return jax.vmap(
            lambda cp, cf: render_frame(p, colors, a, sh, cp, cf,
                                        intrinsics, width=width, height=height,
                                        splat_px=splat_px,
                                        point_radius=point_radius,
                                        cloth_dims=cloth_dims)
        )(cam_pos, cam_fwd)

    return jax.vmap(one)(pos, active, shape_pos, shape_quat)


@partial(jax.jit, static_argnames=("width", "height", "splat_px", "cloth_dims"))
def render_frame(pos, colors, active, shapes: ShapeSet, cam_pos, cam_angle_fwd,
                 intrinsics, width: int = 720, height: int = 720, splat_px: int = 2,
                 point_radius: float = 0.04, cloth_dims=None):
    """Render one camera frame.

    Args:
      pos: (N, 3) particle positions; colors: (N, 3); active: (N,).
      shapes: kinematic shapes at their current pose.
      cam_pos: (3,); cam_angle_fwd: (3,) camera forward vector (unit).
      intrinsics: (4,) [fx, fy, cx, cy].
      splat_px: half-extent of the particle splat neighborhood in pixels.
      cloth_dims: optional static (dimx, dimz) — the particles form a cloth
        grid. The grid is rasterized as a true shaded triangle mesh (the
        TPU analogue of by_softgym_cloth.h render_mode=2 + shadersGL.cpp)
        via _cloth_mesh_fragments; the Lambert-shaded particle splats stay
        on as hole-fill for triangles exceeding the raster tile.

    Returns: (H, W, 5) float32 — RGB in [0,1], alpha, metric depth (0 = bg).
    """
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    up = jnp.array([0.0, 1.0, 0.0])
    z_axis = -cam_angle_fwd
    x_axis = jnp.cross(up, z_axis)
    x_axis = x_axis / (jnp.linalg.norm(x_axis) + 1e-9)
    y_axis = jnp.cross(z_axis, x_axis)
    rot = jnp.stack([x_axis, y_axis, z_axis], axis=0)  # world->cam

    # ---- shape raycast ----
    uu = (jnp.arange(width, dtype=jnp.float32) + 0.5 - cx) / fx
    vv = -(jnp.arange(height, dtype=jnp.float32) + 0.5 - cy) / fy
    dirs_cam = jnp.stack(
        [jnp.tile(uu[None, :], (height, 1)),
         jnp.tile(vv[:, None], (1, width)),
         -jnp.ones((height, width), dtype=jnp.float32)], axis=-1)
    dirs_world = dirs_cam @ rot  # rows are axes -> rot.T @ v == v @ rot

    def one_shape(kind, size, spos, squat, valid, planes):
        q_inv = geo.quat_conjugate(squat)
        ro = geo.quat_rotate(q_inv, cam_pos - spos)
        rd = geo.quat_rotate(q_inv, dirs_world)
        ro = jnp.broadcast_to(ro, rd.shape)
        t_box, n_box = _ray_box(ro, rd, size)
        t_cap, n_cap = _ray_capsule(ro, rd, size[0], size[1])
        t_pl, n_pl = _ray_plane(ro, rd)
        t = jnp.where(kind == SHAPE_BOX, t_box,
                      jnp.where(kind == SHAPE_CAPSULE, t_cap, t_pl))
        n = jnp.where(kind == SHAPE_BOX, n_box,
                      jnp.where(kind == SHAPE_CAPSULE, n_cap, n_pl))
        if planes.shape[-2] > 0:
            t_cx, n_cx = _ray_convex(ro, rd, planes)
            t = jnp.where(kind == SHAPE_CONVEX, t_cx, t)
            n = jnp.where(kind == SHAPE_CONVEX, n_cx, n)
        t = jnp.where(valid, t, _FAR)
        n_world = geo.quat_rotate(squat, n)
        return t, n_world

    # scan (not vmap) over shapes with a running z-min: a vmapped sweep
    # materializes an (M, H, W, 3) intermediate that XLA lane-pads 3->128
    # (42x) — 23 GB for an 8-frame batch at 720^2. The scan keeps peak
    # memory O(H*W) per frame regardless of shape count.
    def shape_body(carry, sh):
        t_best, nx, ny, nz = carry
        kind, size, spos, squat, valid, planes = sh
        t, n = one_shape(kind, size, spos, squat, valid, planes)
        take = t < t_best
        # component carries: an (H, W, 3) carry buffer would itself be
        # lane-padded 3->128; four (H, W) planes are not
        return (jnp.where(take, t, t_best),
                jnp.where(take, n[..., 0], nx),
                jnp.where(take, n[..., 1], ny),
                jnp.where(take, n[..., 2], nz)), None

    zero = jnp.zeros((height, width))
    (t_hit, nx, ny, nz), _ = jax.lax.scan(
        shape_body, (jnp.full((height, width), _FAR), zero, zero, zero),
        (shapes.kind, shapes.size, shapes.pos, shapes.quat, shapes.valid,
         shapes.planes))
    n_hit = jnp.stack([nx, ny, nz], axis=-1)
    shade = 0.45 + 0.55 * jnp.clip(jnp.sum(n_hit * _LIGHT / jnp.linalg.norm(_LIGHT),
                                           axis=-1), 0.0, 1.0)
    hit_mask = t_hit < _FAR
    # dirs_cam z = -1, so t is directly the metric depth along camera forward
    color = jnp.where(hit_mask[..., None], _SHAPE_COLOR * shade[..., None], _BG)

    # ---- particle splat ----
    base_colors = colors
    if cloth_dims is not None:
        dimx, dimz = cloth_dims
        vn = cloth_vertex_normals(pos, dimx, dimz)
        # two-sided Lambert: a sheet lights from either side
        lam = jnp.abs(vn @ (_LIGHT / jnp.linalg.norm(_LIGHT)))
        has_n = jnp.sum(vn * vn, axis=-1) > 1e-6
        colors = colors * jnp.where(has_n, 0.35 + 0.65 * lam, 1.0)[:, None]
    p_cam = (pos - cam_pos) @ rot.T
    z = -p_cam[..., 2]
    vis = active & (z > 0.01)
    u = p_cam[..., 0] * fx / jnp.maximum(z, 1e-6) + cx
    v = -p_cam[..., 1] * fy / jnp.maximum(z, 1e-6) + cy
    r_px = jnp.clip(point_radius * fx / jnp.maximum(z, 1e-6), 0.5, float(splat_px) + 0.5)

    offs = jnp.arange(-splat_px, splat_px + 1, dtype=jnp.float32)
    du, dv = jnp.meshgrid(offs, offs, indexing="ij")
    du, dv = du.ravel(), dv.ravel()  # (S,)
    pu = jnp.round(u[:, None] + du[None, :]).astype(jnp.int32)
    pv = jnp.round(v[:, None] + dv[None, :]).astype(jnp.int32)
    in_disc = (du[None, :] ** 2 + dv[None, :] ** 2) <= (r_px[:, None] ** 2)
    in_img = (pu >= 0) & (pu < width) & (pv >= 0) & (pv < height)
    ok = vis[:, None] & in_disc & in_img
    pix = jnp.where(ok, pv * width + pu, 0)
    zsplat = jnp.where(ok, jnp.broadcast_to(z[:, None], pix.shape), _FAR)
    pcol = jnp.broadcast_to(colors[:, None, :], pix.shape + (3,))

    frag_pix = pix.ravel()
    frag_z = zsplat.ravel()
    frag_col = pcol.reshape(-1, 3)
    frag_ok = ok.ravel()
    if cloth_dims is not None and _mesh_enabled():
        # mesh fragments join the same z-buffer; splats remain as hole-fill
        faces = jnp.asarray(_cloth_grid_faces(*cloth_dims))
        mpix, mz, mcol, mok = _cloth_mesh_fragments(
            pos, base_colors, faces, rot, cam_pos, intrinsics, width, height)
        frag_pix = jnp.concatenate([frag_pix, mpix])
        frag_z = jnp.concatenate([frag_z, mz])
        frag_col = jnp.concatenate([frag_col, mcol])
        frag_ok = jnp.concatenate([frag_ok, mok])

    zbuf_shape = jnp.where(hit_mask, t_hit, _FAR).ravel()
    zbuf = zbuf_shape.at[frag_pix].min(frag_z)
    # second pass: fragments whose depth won write their color; losers are
    # routed to a dummy slot past the image
    own = (frag_z <= zbuf[frag_pix] + 1e-6) & frag_ok
    pix_safe = jnp.where(own, frag_pix, width * height)
    buf = jnp.concatenate([color.reshape(-1, 3), jnp.zeros((1, 3), dtype=color.dtype)], 0)
    buf = buf.at[pix_safe].set(frag_col)
    depth = jnp.where(zbuf < _FAR, zbuf, 0.0).reshape(height, width)
    img = buf[: width * height].reshape(height, width, 3)
    alpha = jnp.ones((height, width, 1), dtype=jnp.float32)
    return jnp.concatenate([img, alpha, depth[..., None]], axis=-1)
