"""xArm6 kinematics in JAX — replaces pybullet FK/IK.

The reference loads xArm6 URDFs into pybullet and calls
calculateInverseKinematics once per sim step (src/sim/sim_env/flex_env.py:
297-307), converting link poses to FleX's y-up frame via the fixed
permutation [[1,0,0],[0,0,1],[0,-1,0]] (src/sim/sim_env/robot_env.py:12-16).

Here the chain is a fixed 6-joint kinematic tree (joint origins/axes taken
from the xArm6 URDF: joint1 z+0.267, joint2 rpy -pi/2 about x, joint3
xyz (0.0535, -0.2845, 0), joint4 xyz (0.0775, 0.3425, 0) rpy -pi/2,
joint5 rpy +pi/2, joint6 xyz (0.076, 0.097, 0) rpy -pi/2; all revolute
about local z). FK is a 6-step unrolled matrix chain; IK is damped least
squares with the Jacobian from jax.jacfwd, fixed iterations, so a whole
end-effector trajectory solves as one `lax.scan` on device.

Everything operates in the scaled FleX world frame (globalScaling=10,
flex_env.py:133-148): URDF meters x 10 with the bullet->flex axis swap
folded into the base transform.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# joint origin translations (URDF meters) and fixed rpy rotations
_JOINT_XYZ = np.array([
    [0.0, 0.0, 0.267],
    [0.0, 0.0, 0.0],
    [0.0535, -0.2845, 0.0],
    [0.0775, 0.3425, 0.0],
    [0.0, 0.0, 0.0],
    [0.076, 0.097, 0.0],
], dtype=np.float32)
_JOINT_RPY_X = np.array([0.0, -np.pi / 2, 0.0, -np.pi / 2, np.pi / 2, -np.pi / 2],
                        dtype=np.float32)
JOINT_LOWER = np.array([-6.2832, -2.059, -3.927, -6.2832, -1.69297, -6.2832],
                       dtype=np.float32)
JOINT_UPPER = np.array([6.2832, 2.0944, 0.19198, 6.2832, 3.14159, 6.2832],
                       dtype=np.float32)

# bullet (z-up) -> flex (y-up) rotation (robot_env.py:12-16)
_B2F = np.array([[1.0, 0, 0], [0, 0, 1.0], [0, -1.0, 0]], dtype=np.float32)


def _rx(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[1, 0, 0], [0, c, -s], [0, s, c]], dtype=jnp.float32)


def _rz(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack([
        jnp.stack([c, -s, z], -1),
        jnp.stack([s, c, z], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def fk_link_poses(joints, base_pos, scale: float = 10.0):
    """Forward kinematics of the 6-link chain, in the flex world frame.

    Args:
      joints: (6,) joint angles (rad).
      base_pos: (3,) robot base position in flex coords.
      scale: globalScaling (URDF meters -> world units).

    Returns: (link_pos (7, 3), link_rot (7, 3, 3)) — base + 6 links.
    """
    pos = jnp.asarray(base_pos, dtype=jnp.float32)
    rot = jnp.asarray(_B2F)  # base orientation [0,0,0,1] in bullet == B2F in flex
    poses_p = [pos]
    poses_r = [rot]
    for i in range(6):
        off = jnp.asarray(_JOINT_XYZ[i]) * scale
        pos = pos + rot @ off
        rot = rot @ _rx(jnp.asarray(_JOINT_RPY_X[i])) @ _rz(joints[i])
        poses_p.append(pos)
        poses_r.append(rot)
    return jnp.stack(poses_p), jnp.stack(poses_r)


def fk_eef(joints, base_pos, scale: float = 10.0):
    p, r = fk_link_poses(joints, base_pos, scale)
    return p[-1], r[-1]


@partial(jax.jit, static_argnames=("iters", "scale"))
def ik_solve(target_pos, target_rot, q0, base_pos, iters: int = 30, scale: float = 10.0,
             damping: float = 0.1, rot_weight: float = 0.3):
    """Damped-least-squares IK toward a 6-DoF end-effector target.

    Args:
      target_pos: (3,) flex-frame eef position.
      target_rot: (3, 3) flex-frame eef rotation.
      q0: (6,) warm-start joint angles.
    Returns: (6,) joint angles clipped to limits.
    """
    target_pos = jnp.asarray(target_pos, jnp.float32)
    target_rot = jnp.asarray(target_rot, jnp.float32)

    def err(q):
        p, r = fk_eef(q, base_pos, scale)
        e_pos = p - target_pos
        # orientation error: vee(R_t^T R - R^T R_t)/2 in target frame
        m = target_rot.T @ r
        e_rot = 0.5 * jnp.array([m[2, 1] - m[1, 2], m[0, 2] - m[2, 0], m[1, 0] - m[0, 1]])
        return jnp.concatenate([e_pos, rot_weight * e_rot])

    def body(q, _):
        e = err(q)
        jac = jax.jacfwd(err)(q)  # (6, 6)
        jtj = jac.T @ jac + (damping**2) * jnp.eye(6)
        dq = jnp.linalg.solve(jtj, jac.T @ e)
        q = jnp.clip(q - dq, jnp.asarray(JOINT_LOWER), jnp.asarray(JOINT_UPPER))
        return q, None

    q, _ = jax.lax.scan(body, jnp.asarray(q0, jnp.float32), None, length=iters)
    return q


def pusher_orientation(pusher_angle):
    """Flex-frame tool rotation for a down-pointing pusher whose board/stick
    axis is yawed by `pusher_angle` about the vertical (the env's
    orn = [0, pi, angle + pi/2] euler passed to bullet IK, flex_env.py:276).

    Returns a (3, 3) rotation whose local +z points DOWN (-y world) so a tool
    offset of [0, 0, L] in the link frame lands L units below the eef — the
    convention the preprocessing eef offsets rely on
    (config eef.pos, e.g. rope [[0, 0, 1]])."""
    a = pusher_angle + jnp.pi / 2
    ca, sa = jnp.cos(a), jnp.sin(a)
    # columns: local x, y, z expressed in world (flex) coords
    x_axis = jnp.stack([ca, jnp.zeros_like(a), -sa], -1)
    z_axis = jnp.array([0.0, -1.0, 0.0])
    z_axis = jnp.broadcast_to(z_axis, x_axis.shape)
    y_axis = jnp.cross(z_axis, x_axis)
    return jnp.stack([x_axis, y_axis, z_axis], axis=-1)
