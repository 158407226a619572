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


def shape_contact_deltas(pos_pred, pos_prev, shapes: ShapeSet, shape_pos, shape_quat,
                         shape_vel, collision_distance, margin, dynamic_friction, dt):
    """Position corrections for particle-vs-kinematic-shape contacts.

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
