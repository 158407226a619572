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


@partial(jax.jit, static_argnames=("iters_per_step", "scale"))
def ik_traj(eef_pos_traj, eef_rot_traj, q0, base_pos, iters_per_step: int = 6,
            scale: float = 10.0):
    """Joint trajectory tracking an end-effector trajectory: one DLS update
    block per frame, warm-started from the previous frame — the whole push
    solves as a single `lax.scan` BEFORE the sim loop (the tool trajectory is
    scripted, so IK never depends on particle state; contrast the reference's
    per-sim-step pybullet IK call, flex_env.py:297-304).

    Args: eef_pos_traj (T, 3), eef_rot_traj (T, 3, 3) flex-frame targets,
      q0 (6,) initial joints, base_pos (3,).
    Returns: (T, 6) joint angles."""
    lower = jnp.asarray(JOINT_LOWER)
    upper = jnp.asarray(JOINT_UPPER)

    def one_frame(q, tgt):
        tp, tr = tgt

        def err(qq):
            p, r = fk_eef(qq, base_pos, scale)
            e_pos = p - tp
            m = tr.T @ r
            e_rot = 0.5 * jnp.array([m[2, 1] - m[1, 2], m[0, 2] - m[2, 0],
                                     m[1, 0] - m[0, 1]])
            return jnp.concatenate([e_pos, 0.3 * e_rot])

        def body(qq, _):
            e = err(qq)
            jac = jax.jacfwd(err)(qq)
            jtj = jac.T @ jac + 0.01 * jnp.eye(6)
            dq = jnp.linalg.solve(jtj, jac.T @ e)
            return jnp.clip(qq - dq, lower, upper), None

        q, _ = jax.lax.scan(body, q, None, length=iters_per_step)
        return q, q

    _, q_traj = jax.lax.scan(one_frame, jnp.asarray(q0, jnp.float32),
                             (jnp.asarray(eef_pos_traj, jnp.float32),
                              jnp.asarray(eef_rot_traj, jnp.float32)))
    return q_traj


@partial(jax.jit, static_argnames=("scale",))
def link_pose_traj(q_traj, base_pos, scale: float = 10.0):
    """Batched FK: (T, 6) joints -> link poses (T, 7, 3) + quats (T, 7, 4)
    for the arm's kinematic collision/render shapes (the counterpart of
    getRobotShapeStates, robot_env.py:66-108)."""
    from adaptigraph_tpu.utils import geometry as geo

    def one(q):
        p, r = fk_link_poses(q, base_pos, scale)
        return p, geo.matrix_to_quat(r)

    return jax.vmap(one)(jnp.asarray(q_traj, jnp.float32))


_ARM_ASSETS = None


def load_arm_assets(scale: float = 10.0):
    """Load the committed xArm6 link convex hulls + surface samples
    (data/assets/xarm6_links.npz, generated by scripts/gen_xarm_assets.py
    from the URDF VHACD collision meshes). Halfspaces n·x <= d scale to
    world units as d*scale. Returns a dict {planes: list of 7 (P,4) arrays,
    surf: list of (S,3), surf_n: list of (S,3)} in link-local world units."""
    global _ARM_ASSETS
    if _ARM_ASSETS is not None and _ARM_ASSETS[0] == scale:
        return _ARM_ASSETS[1]
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "..", "data", "assets",
                        "xarm6_links.npz")
    raw = np.load(os.path.abspath(path))
    links = [str(x) for x in raw["links"]]
    planes, surf, surf_n = [], [], []
    for name in links:
        p = raw[f"{name}_planes"].astype(np.float32).copy()
        p[:, 3] *= scale
        planes.append(p)
        surf.append(raw[f"{name}_surf"].astype(np.float32) * scale)
        surf_n.append(raw[f"{name}_surf_n"].astype(np.float32))
    out = {"links": links, "planes": planes, "surf": surf, "surf_n": surf_n}
    _ARM_ASSETS = (scale, out)
    return out


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
