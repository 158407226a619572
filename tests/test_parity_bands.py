"""PyFleX-parity acceptance bands — golden physics behaviors the reference
scenes document, encoded as tolerance tests so solver-semantics drift fails
CI (VERDICT r1 missing #5 / next #7):

  * rope stiffness map (scenes.py:24-30): a stiff rope (global_stiffness +
    wide cluster cover) holds its shape; a soft rope deforms more when
    settling under gravity;
  * granular friction (by_granular.h:74-84): a dropped pile spreads farther
    with low inter-granule friction than with high friction;
  * cloth corner pin/lift (flex_env.py:311-361 grasp semantics): a pinned
    corner holds its height, the far corner stays near the floor, and no
    spring family tears.

Scenes are reduced-capacity versions of the real builders (same code path,
smaller particle budgets) so the bands run on the CPU mesh.
"""

import numpy as np
import jax.numpy as jnp

from adaptigraph_tpu.engine import rollout_steps
from adaptigraph_tpu.scenes import build_scene
from adaptigraph_tpu.scenes.build import MATERIAL_CAPS


def _settle(b, frames=40):
    t = frames
    pos_traj = jnp.tile(b.state.shapes.pos[None], (t, 1, 1))
    quat_traj = jnp.tile(b.state.shapes.quat[None], (t, 1, 1))
    final, _ = rollout_steps(b.state, b.spec, pos_traj, quat_traj,
                             substeps=b.substeps, iterations=b.iterations,
                             record=False, contact_mode="sparse")
    return np.asarray(final.particles.pos)[: b.n_active]


def _shape_error(settled, rest):
    """RMS residual after the best rigid fit of the rest shape onto the
    settled cloud (Kabsch) — 0 for a perfectly rigid settle."""
    a = rest - rest.mean(0)
    b = settled - settled.mean(0)
    h = a.T @ b
    u, s, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    r = vt.T @ np.diag([1, 1, d]) @ u.T
    return float(np.sqrt(np.mean(np.sum((b - a @ r.T) ** 2, axis=1))))


class TestRopeStiffnessBand:
    def test_stiff_rope_holds_shape_better(self):
        caps = MATERIAL_CAPS["rope"]._replace(n=1024, c=128)
        outs = {}
        for name, stiffness in (("soft", 0.05), ("stiff", 0.95)):
            rng = np.random.RandomState(7)
            # reproduce the reference's bimodal stiffness map deterministically
            if stiffness < 0.5:
                gs, spacing = stiffness * 1e-4 / 0.5, 2 + 8 * stiffness
            else:
                gs, spacing = (stiffness - 0.5) * 4e-4 + 1e-4, 6 + 4 * (stiffness - 0.5)
            b = build_scene("rope", rng, caps=caps, scene_overrides={
                "global_stiffness": gs, "cluster_spacing": spacing,
                "length": 2.5, "translation": np.array([0.0, 1.2, 2.0]),
                "pin_below_y": -1.0,  # free rope: let it fall and deform
            })
            rest = np.asarray(b.spec.rest_pos)[: b.n_active]
            settled = _settle(b, frames=40)
            outs[name] = _shape_error(settled, rest)
        assert np.isfinite(list(outs.values())).all()
        # band: soft deforms at least 1.5x more than stiff
        assert outs["soft"] > 1.5 * outs["stiff"], outs


class TestGranularFrictionBand:
    def test_low_friction_granules_slide_farther(self):
        """Coulomb floor friction (NvFlexParams dynamicFriction, the
        reference's granular physics knob by_granular.h:77): granules shoved
        sideways slide farther on a slick floor than a grippy one."""
        caps = MATERIAL_CAPS["granular"]._replace(n=2048, c=64)
        slide = {}
        for name, fric in (("slick", 0.05), ("grippy", 1.0)):
            rng = np.random.RandomState(3)
            b = build_scene("granular", rng, caps=caps, scene_overrides={
                "dynamic_friction": fric, "x_max": 0.6, "z_max": 0.6,
            })
            p = b.state.particles
            vel = jnp.zeros_like(p.vel).at[:, 0].set(
                jnp.where(p.active, 0.5, 0.0))
            b = b._replace(state=b.state._replace(particles=p._replace(vel=vel)))
            start = np.asarray(p.pos)[: b.n_active]
            settled = _settle(b, frames=40)
            slide[name] = float(np.mean(settled[:, 0] - start[:, 0]))
        assert np.isfinite(list(slide.values())).all()
        assert slide["slick"] > 1.3 * max(slide["grippy"], 1e-4), slide


class TestClothGraspBand:
    def test_pinned_corner_holds_and_cloth_hangs(self):
        caps = MATERIAL_CAPS["cloth"]._replace(n=24 * 24, s=8192)
        rng = np.random.RandomState(5)
        b = build_scene("cloth", rng, caps=caps, scene_overrides={
            "dimx": 24, "dimz": 24,
        })
        p = b.state.particles
        pts = np.asarray(p.pos)[: b.n_active]
        corner = int(np.argmax(pts[:, 0] + pts[:, 2]))
        far = int(np.argmin(pts[:, 0] + pts[:, 2]))
        lift_h = 1.2
        pos = np.array(p.pos)
        pos[corner, 1] = lift_h
        w = np.array(p.inv_mass)
        w[corner] = 0.0  # grasp = pin (inv-mass zeroing, flex_env.py:384-388)
        b = b._replace(state=b.state._replace(particles=p._replace(
            pos=jnp.asarray(pos), inv_mass=jnp.asarray(w))))
        settled = _settle(b, frames=50)
        # grasped corner holds its height exactly (kinematic)
        assert abs(settled[corner, 1] - lift_h) < 1e-5
        # far corner hangs well below the grasp (cloth drapes rather than
        # moving rigidly); it cannot hang lower than grasp - stretched diag
        diag = float(np.linalg.norm(pts[corner] - pts[far]))
        assert settled[far, 1] < lift_h - 0.45 * diag
        assert settled[far, 1] > lift_h - 2.2 * diag - 0.05
        # no tearing: nearest-neighbor stretch stays bounded
        os_ = b.spec.offset_springs
        rest = np.asarray(os_.rest)
        valid = np.asarray(os_.valid)
        n = settled.shape[0]
        worst = 0.0
        for f, o in enumerate(os_.offsets):
            m = valid[f, : n - o]
            if not m.any():
                continue
            d = np.linalg.norm(settled[: n - o] - settled[o:], axis=1)
            strain = (d[m] / np.maximum(rest[f, : n - o][m], 1e-9)).max()
            worst = max(worst, float(strain))
        assert worst < 2.2, worst
