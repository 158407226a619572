"""Kinematic-shape collision: signed distances, normals, contact projection.

Replaces the NvFlex particle-vs-convex-shape contact stage (driven through
NvFlexSetShapes, see PyFleX/bindings/pyflex.cpp:2066-2076 and the AddBox /
capsule helpers in bindings/helpers.h:472). Shapes are boxes (table,
flat-board pusher), capsules (stick pusher, gripper fingers), and an
infinite floor plane. All math is branch-free and vmapped over
(particles x shapes), so the whole contact stage is one fused VPU pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from adaptigraph_tpu.engine.state import (
    SHAPE_BOX, SHAPE_CAPSULE, SHAPE_CONVEX, ShapeSet)
from adaptigraph_tpu.utils import geometry as geo

_EPS = 1e-9


def _box_sdf(q, half):
    """SDF + outward normal of an axis-aligned box at origin, local point q."""
    d = jnp.abs(q) - half
    outside = jnp.maximum(d, 0.0)
    dist_out = jnp.linalg.norm(outside, axis=-1)
    max_d = jnp.max(d, axis=-1)
    sd = dist_out + jnp.minimum(max_d, 0.0)
    # outside: gradient of |max(d,0)|; inside: face of least penetration
    n_out = outside * jnp.sign(q)
    n_out = n_out / (jnp.linalg.norm(n_out, axis=-1, keepdims=True) + _EPS)
    inner_axis = jnp.argmax(d, axis=-1)
    n_in = jax.nn.one_hot(inner_axis, 3, dtype=q.dtype) * jnp.sign(q)
    n = jnp.where((max_d > 0.0)[..., None], n_out, n_in)
    return sd, n


def _capsule_sdf(q, size):
    """Capsule along local +x: size = (radius, half_length, _)."""
    r, hl = size[..., 0], size[..., 1]
    a = jnp.clip(q[..., 0], -hl, hl)
    closest = jnp.stack([a, jnp.zeros_like(a), jnp.zeros_like(a)], axis=-1)
    d = q - closest
    dist = jnp.linalg.norm(d, axis=-1)
    sd = dist - r
    n = d / (dist[..., None] + _EPS)
    return sd, n


def _plane_sdf(q):
    sd = q[..., 1]
    n = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], dtype=q.dtype), q.shape)
    return sd, n


def _convex_sdf(q, planes):
    """Convex polytope as intersection of halfspaces n·x <= d.

    planes: (P, 4) local halfspaces, zero-normal rows = padding. sd is exact
    inside and near faces, an under-estimate only near edges/corners —
    the standard convex collision approximation (the engine's analogue of
    the triangle-mesh kinematic shapes added via pyflex_add_mesh,
    PyFleX/bindings/pyflex.cpp:2828)."""
    n = planes[..., :3]  # (P, 3)
    d = planes[..., 3]
    pvalid = jnp.sum(n * n, axis=-1) > 0.25
    sd_p = jnp.einsum("...i,pi->...p", q, n) - d  # (..., P)
    sd_p = jnp.where(pvalid, sd_p, -3e37)
    best = jnp.argmax(sd_p, axis=-1)
    sd = jnp.max(sd_p, axis=-1)
    # all-padding plane set: report "very far" so no contact fires
    sd = jnp.where(jnp.any(pvalid), sd, 3e37)
    nrm = n[best]
    return sd, nrm


def shape_sdf(p_world, kind, size, pos, quat, planes=None):
    """Signed distance + world-frame outward normal of one shape for a batch
    of world points p_world (..., 3)."""
    q = geo.quat_rotate(geo.quat_conjugate(quat), p_world - pos)
    sd_box, n_box = _box_sdf(q, size)
    sd_cap, n_cap = _capsule_sdf(q, size)
    sd_pl, n_pl = _plane_sdf(q)
    sd = jnp.where(kind == SHAPE_BOX, sd_box, jnp.where(kind == SHAPE_CAPSULE, sd_cap, sd_pl))
    n_local = jnp.where((kind == SHAPE_BOX), n_box, jnp.where(kind == SHAPE_CAPSULE, n_cap, n_pl))
    if planes is not None and planes.shape[-2] > 0:
        sd_cx, n_cx = _convex_sdf(q, planes)
        sd = jnp.where(kind == SHAPE_CONVEX, sd_cx, sd)
        n_local = jnp.where((kind == SHAPE_CONVEX), n_cx, n_local)
    n_world = geo.quat_rotate(quat, n_local)
    return sd, n_world


def shape_contact_deltas(pos_pred, pos_prev, shapes: ShapeSet, shape_pos,
                         shape_quat, shape_vel, collision_distance, margin,
                         dynamic_friction, dt):
    """Position corrections for particle-vs-kinematic-shape contacts.

    COMPONENT-SPLIT: all particle-side math runs on (N,) lane-dense arrays
    with a static Python loop over the M shapes — an (M, N, 3) vmap pays the
    TPU lane padding 3 -> 128 on every elementwise op (~42x the payload;
    measured ~32 us/iteration at the rope design point for a ~15-op pass).
    Per-shape parameters are scalars, so each unrolled shape is ~60 pure-VPU
    (N,)-ops. Semantics identical to `_shape_contact_deltas_ref`
    (test_engine parity).

    Args:
      pos_pred: (N, 3) predicted positions this substep.
      pos_prev: (N, 3) positions at substep start (for friction).
      shapes: static shape set (kinds/sizes/valid).
      shape_pos/shape_quat: (M, 3)/(M, 4) poses at this substep (interpolated).
      shape_vel: (M, 3) linear velocity of each shape.
      collision_distance / margin: NvFlexParams collisionDistance +
        shapeCollisionMargin (NvFlex.h:95-154).
      dynamic_friction: Coulomb coefficient.
      dt: substep dt.

    Returns: (delta (N, 3), count (N,)) — sum of corrections and number of
      active contacts per particle (for Jacobi averaging).
    """
    cd = collision_distance
    m_shapes = shapes.kind.shape[-1]
    n_planes = shapes.planes.shape[-2]
    px, py, pz = pos_pred[..., 0], pos_pred[..., 1], pos_pred[..., 2]
    ux = pos_pred[..., 0] - pos_prev[..., 0]
    uy = pos_pred[..., 1] - pos_prev[..., 1]
    uz = pos_pred[..., 2] - pos_prev[..., 2]
    zero = jnp.zeros_like(px)
    ax = ay = az = cnt = zero

    for m in range(m_shapes):
        kind = shapes.kind[..., m]
        size = shapes.size[..., m, :]
        valid = shapes.valid[..., m]
        spos = shape_pos[..., m, :]
        svel = shape_vel[..., m, :]
        q = shape_quat[..., m, :]
        # world->local rotation (R^T) rows from the quaternion, as scalars
        qx_, qy_, qz_, qw_ = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
        r00 = 1 - 2 * (qy_ * qy_ + qz_ * qz_)
        r01 = 2 * (qx_ * qy_ - qz_ * qw_)
        r02 = 2 * (qx_ * qz_ + qy_ * qw_)
        r10 = 2 * (qx_ * qy_ + qz_ * qw_)
        r11 = 1 - 2 * (qx_ * qx_ + qz_ * qz_)
        r12 = 2 * (qy_ * qz_ - qx_ * qw_)
        r20 = 2 * (qx_ * qz_ - qy_ * qw_)
        r21 = 2 * (qy_ * qz_ + qx_ * qw_)
        r22 = 1 - 2 * (qx_ * qx_ + qy_ * qy_)
        wx = px - spos[..., 0]
        wy = py - spos[..., 1]
        wz = pz - spos[..., 2]
        qxp = r00 * wx + r10 * wy + r20 * wz
        qyp = r01 * wx + r11 * wy + r21 * wz
        qzp = r02 * wx + r12 * wy + r22 * wz

        # ---- box SDF ----
        hx, hy, hz = size[..., 0], size[..., 1], size[..., 2]
        dxb = jnp.abs(qxp) - hx
        dyb = jnp.abs(qyp) - hy
        dzb = jnp.abs(qzp) - hz
        ox = jnp.maximum(dxb, 0.0)
        oy = jnp.maximum(dyb, 0.0)
        oz = jnp.maximum(dzb, 0.0)
        dist_out = jnp.sqrt(ox * ox + oy * oy + oz * oz)
        max_d = jnp.maximum(dxb, jnp.maximum(dyb, dzb))
        sd_box = dist_out + jnp.minimum(max_d, 0.0)
        inv_out = 1.0 / (dist_out + _EPS)
        nbx_o = ox * jnp.sign(qxp) * inv_out
        nby_o = oy * jnp.sign(qyp) * inv_out
        nbz_o = oz * jnp.sign(qzp) * inv_out
        # inside: face of least penetration; ties resolve first-axis like argmax
        is_x = (dxb >= dyb) & (dxb >= dzb)
        is_y = (~is_x) & (dyb >= dzb)
        is_z = ~(is_x | is_y)
        nbx_i = jnp.where(is_x, jnp.sign(qxp), 0.0)
        nby_i = jnp.where(is_y, jnp.sign(qyp), 0.0)
        nbz_i = jnp.where(is_z, jnp.sign(qzp), 0.0)
        out_side = max_d > 0.0
        nbx = jnp.where(out_side, nbx_o, nbx_i)
        nby = jnp.where(out_side, nby_o, nby_i)
        nbz = jnp.where(out_side, nbz_o, nbz_i)

        # ---- capsule SDF (axis +x; size = (radius, half_len, _)) ----
        r_c, hl = size[..., 0], size[..., 1]
        a_c = jnp.clip(qxp, -hl, hl)
        cdx = qxp - a_c
        d2c = cdx * cdx + qyp * qyp + qzp * qzp
        inv_dc = jax.lax.rsqrt(d2c + _EPS * _EPS)
        dist_c = d2c * inv_dc
        sd_cap = dist_c - r_c
        ncx = cdx * inv_dc
        ncy = qyp * inv_dc
        ncz = qzp * inv_dc

        # ---- plane SDF (local y-up) ----
        sd_pl = qyp

        is_box = kind == SHAPE_BOX
        is_cap = kind == SHAPE_CAPSULE
        sd = jnp.where(is_box, sd_box, jnp.where(is_cap, sd_cap, sd_pl))
        nlx = jnp.where(is_box, nbx, jnp.where(is_cap, ncx, 0.0))
        nly = jnp.where(is_box, nby, jnp.where(is_cap, ncy, 1.0))
        nlz = jnp.where(is_box, nbz, jnp.where(is_cap, ncz, 0.0))

        if n_planes > 0:
            # ---- convex polytope: running max over halfspaces ----
            planes = shapes.planes[..., m, :, :]
            pn = planes[..., :3]
            pd = planes[..., 3]
            pvalid = jnp.sum(pn * pn, axis=-1) > 0.25
            sd_cx = jnp.full_like(px, -3e37)
            nxx = nxy = nxz = zero
            any_valid = jnp.any(pvalid, axis=-1)
            for p_i in range(n_planes):
                n0, n1, n2 = pn[..., p_i, 0], pn[..., p_i, 1], pn[..., p_i, 2]
                sp = qxp * n0 + qyp * n1 + qzp * n2 - pd[..., p_i]
                sp = jnp.where(pvalid[..., p_i], sp, -3e37)
                take = sp > sd_cx  # strict: first max wins ties, like argmax
                sd_cx = jnp.where(take, sp, sd_cx)
                nxx = jnp.where(take, n0, nxx)
                nxy = jnp.where(take, n1, nxy)
                nxz = jnp.where(take, n2, nxz)
            sd_cx = jnp.where(any_valid, sd_cx, 3e37)
            is_cx = kind == SHAPE_CONVEX
            sd = jnp.where(is_cx, sd_cx, sd)
            nlx = jnp.where(is_cx, nxx, nlx)
            nly = jnp.where(is_cx, nxy, nly)
            nlz = jnp.where(is_cx, nxz, nlz)

        # local->world normal (R @ n)
        nwx = r00 * nlx + r01 * nly + r02 * nlz
        nwy = r10 * nlx + r11 * nly + r12 * nlz
        nwz = r20 * nlx + r21 * nly + r22 * nlz

        pen = cd - sd
        contact = (pen > 0.0) & valid
        cf = jnp.where(contact, 1.0, 0.0)
        # Coulomb friction on the tangential relative displacement
        rx = ux - svel[..., 0] * dt
        ry = uy - svel[..., 1] * dt
        rz = uz - svel[..., 2] * dt
        rel_n = rx * nwx + ry * nwy + rz * nwz
        tx = rx - nwx * rel_n
        ty = ry - nwy * rel_n
        tz = rz - nwz * rel_n
        t_norm = jnp.sqrt(tx * tx + ty * ty + tz * tz)
        max_slide = dynamic_friction * jnp.abs(pen)
        scale = jnp.minimum(1.0, max_slide / (t_norm + _EPS)) * cf
        ax = ax + nwx * (pen * cf) - tx * scale
        ay = ay + nwy * (pen * cf) - ty * scale
        az = az + nwz * (pen * cf) - tz * scale
        cnt = cnt + cf

    return jnp.stack([ax, ay, az], axis=-1), cnt


def _shape_contact_deltas_ref(pos_pred, pos_prev, shapes: ShapeSet, shape_pos,
                              shape_quat, shape_vel, collision_distance, margin,
                              dynamic_friction, dt):
    """Reference (M, N, 3)-vmapped form of shape_contact_deltas — kept for
    the component-split parity test."""
    cd = collision_distance

    def one_shape(kind, size, spos, squat, svel, valid, planes):
        sd, n = shape_sdf(pos_pred, kind, size, spos, squat, planes=planes)
        pen = cd - sd  # > 0 when closer than the collision offset
        in_contact = (pen > 0.0) & valid
        delta_n = n * pen[..., None]
        # Coulomb friction on the tangential relative displacement this substep
        rel = (pos_pred - pos_prev) - svel * dt
        rel_t = rel - n * jnp.sum(rel * n, axis=-1, keepdims=True)
        rel_t_norm = jnp.linalg.norm(rel_t, axis=-1, keepdims=True)
        max_slide = dynamic_friction * jnp.abs(pen)[..., None]
        scale = jnp.minimum(1.0, max_slide / (rel_t_norm + _EPS))
        delta_f = -rel_t * scale
        delta = jnp.where(in_contact[..., None], delta_n + delta_f, 0.0)
        return delta, in_contact.astype(jnp.float32)

    deltas, counts = jax.vmap(one_shape, in_axes=(0, 0, 0, 0, 0, 0, 0), out_axes=0)(
        shapes.kind, shapes.size, shape_pos, shape_quat, shape_vel, shapes.valid,
        shapes.planes,
    )
    return jnp.sum(deltas, axis=0), jnp.sum(counts, axis=0)
