"""Quaternion / rotation utilities (JAX, batched, jit-friendly).

Quaternions are stored ``(x, y, z, w)`` to match the reference convention
(scipy ``as_quat`` and ``quatFromAxisAngle`` at src/sim/utils.py:15-36;
``quaternion_to_rotation_matrix`` at src/dynamics/utils.py:48-72).
All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

XYZW_IDENTITY = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def quat_from_axis_angle(axis, angle):
    """Unit quaternion (xyzw) for a rotation of `angle` rad about `axis`."""
    axis = jnp.asarray(axis, dtype=jnp.float32)
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-12)
    half = jnp.asarray(angle, dtype=jnp.float32) * 0.5
    s = jnp.sin(half)[..., None]
    return jnp.concatenate([axis * s, jnp.cos(half)[..., None]], axis=-1)


def quat_multiply(q1, q2):
    """Hamilton product q1 * q2, both xyzw (matches src/sim/utils.py:28-36)."""
    x1, y1, z1, w1 = jnp.moveaxis(jnp.asarray(q1), -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(jnp.asarray(q2), -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return jnp.asarray(q) * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=jnp.float32)


def quat_normalize(q):
    q = jnp.asarray(q)
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)


def quat_to_matrix(q):
    """Rotation matrix from xyzw quaternion; broadcasts to (..., 3, 3)."""
    x, y, z, w = jnp.moveaxis(jnp.asarray(q), -1, 0)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def quat_rotate(q, v):
    """Rotate vectors v (..., 3) by quaternions q (..., 4).

    Uses the matmul-free form v' = v + 2 q_v x (q_v x v + w v): pure VPU ops,
    immune to low-precision dot_general defaults.
    """
    q = jnp.asarray(q)
    v = jnp.asarray(v)
    qv, w = q[..., :3], q[..., 3:4]
    t = jnp.cross(qv, jnp.cross(qv, v) + w * v)
    return v + 2.0 * t


def quat_from_euler_xyz(rx, ry, rz):
    """Quaternion from intrinsic xyz Euler angles (rad), xyzw layout."""
    qx = quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]), rx)
    qy = quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), ry)
    qz = quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), rz)
    return quat_multiply(quat_multiply(qx, qy), qz)


def matrix_to_quat(m):
    """xyzw quaternion from a rotation matrix (..., 3, 3); robust branchless form."""
    m = jnp.asarray(m)
    t = jnp.trace(m, axis1=-2, axis2=-1)
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    w = jnp.sqrt(jnp.maximum(0.0, 1.0 + t)) / 2.0
    x = jnp.sqrt(jnp.maximum(0.0, 1.0 + m00 - m11 - m22)) / 2.0
    y = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 + m11 - m22)) / 2.0
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 - m11 + m22)) / 2.0
    x = x * jnp.sign(jnp.where(m[..., 2, 1] - m[..., 1, 2] == 0, 1.0, m[..., 2, 1] - m[..., 1, 2]))
    y = y * jnp.sign(jnp.where(m[..., 0, 2] - m[..., 2, 0] == 0, 1.0, m[..., 0, 2] - m[..., 2, 0]))
    z = z * jnp.sign(jnp.where(m[..., 1, 0] - m[..., 0, 1] == 0, 1.0, m[..., 1, 0] - m[..., 0, 1]))
    return quat_normalize(jnp.stack([x, y, z, w], axis=-1))


def extract_rotation(A, q0, iterations: int = 8):
    """Extract the rotational part of a 3x3 deformation matrix A.

    Iterative quaternion method (Muller et al., "A Robust Method to Extract
    the Rotational Part of Deformations") — branch-free and much faster on
    TPU than batched SVD/polar decomposition. Used by the shape-matching
    constraint (the engine-side equivalent of NvFlex rigid clusters,
    reference PyFleX/extensions/flexExtSoft.cpp:551).

    Args:
      A: (..., 3, 3) target matrices (covariance of cluster positions).
      q0: (..., 4) xyzw warm-start quaternion (previous frame's rotation).
      iterations: fixed iteration count (unrolled; 8 is ample for warm starts).

    Returns:
      (..., 4) xyzw quaternion whose rotation matrix best aligns with A.
    """
    q = quat_normalize(q0)

    def body(q, _):
        R = quat_to_matrix(q)
        # omega = (sum_i r_i x a_i) / (|sum_i r_i . a_i| + eps)
        cross = jnp.cross(R[..., :, 0], A[..., :, 0], axis=-1)
        cross = cross + jnp.cross(R[..., :, 1], A[..., :, 1], axis=-1)
        cross = cross + jnp.cross(R[..., :, 2], A[..., :, 2], axis=-1)
        dot = (
            jnp.sum(R[..., :, 0] * A[..., :, 0], axis=-1)
            + jnp.sum(R[..., :, 1] * A[..., :, 1], axis=-1)
            + jnp.sum(R[..., :, 2] * A[..., :, 2], axis=-1)
        )
        omega = cross / (jnp.abs(dot)[..., None] + 1e-9)
        angle = jnp.linalg.norm(omega, axis=-1)
        axis = omega / (angle[..., None] + 1e-9)
        dq = quat_from_axis_angle(axis, angle)
        q_new = quat_normalize(quat_multiply(dq, q))
        q = jnp.where(angle[..., None] > 1e-9, q_new, q)
        return q, None

    # unrolled on purpose: a lax.scan here keeps each tiny (C, 3)/(C, 4)
    # op chain in its own loop iteration, defeating XLA fusion — at C=384
    # the scanned form measured 66 us vs single-digit us unrolled
    for _ in range(iterations):
        q, _ = body(q, None)
    return q


def rotation_2d_z(theta):
    """(..., 3, 3) rotation about +z by theta — the dataset augmentation matrix
    (reference src/dynamics/dataset/dataset.py:187-190)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], axis=-1),
            jnp.stack([s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )
