"""Sweep the contact-kernel col-block width on the real scenes.

The block-sparse sweep runs at ~10% VPU utilization — per-block loop
overhead (dynamic VMEM slice + bounds + cond), not pair math, bounds it.
Wider col blocks (tile_j) cut loop trips proportionally for nearly-free
extra pair lanes. This measures whole-frame steps/s at the three material
design points for tile_j in {128, 256, 512}.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from adaptigraph_tpu.engine import rollout_steps
from adaptigraph_tpu.engine.state import SHAPE_BOX, SHAPE_PLANE, make_shapes
from adaptigraph_tpu.scenes.build import build_scene, MATERIAL_CAPS

print("backend:", jax.default_backend(), flush=True)

T = 50


def scene(material, seed=0):
    caps = MATERIAL_CAPS[material]
    shapes = make_shapes(
        [SHAPE_PLANE, SHAPE_BOX],
        [[0, 0, 0], [0.05, 0.4, 0.8]],
        [[0, 0, 0], [0, 0.4, 0]],
        [[0, 0, 0, 1], [0, 0, 0, 1]], m_max=caps.m)
    return build_scene(material, np.random.RandomState(seed), shapes=shapes,
                       caps=caps)


for material in ("rope", "granular", "cloth"):
    b = scene(material)
    st, spec = b.state, b.spec
    center = np.asarray(st.particles.pos)[: b.n_active].mean(0)
    xs = np.linspace(center[0] - 1.2, center[0] + 1.2, T, dtype=np.float32)
    pos_traj = np.tile(np.asarray(st.shapes.pos)[None], (T, 1, 1))
    pos_traj[:, 1, 0] = xs
    pos_traj[:, 1, 1] = 0.35
    pos_traj[:, 1, 2] = center[2]
    pos_traj = jnp.asarray(pos_traj)
    quat_traj = jnp.tile(st.shapes.quat[None], (T, 1, 1))
    rest_filter = bool(np.any(np.asarray(st.particles.self_collide)[: b.n_active]))

    n_active_shapes = int(np.asarray(st.shapes.valid).sum())
    for tj in (128, 256, 512):
        for fuse in (None, n_active_shapes):
            def run():
                final, _ = rollout_steps(st, spec, pos_traj, quat_traj,
                                         substeps=b.substeps,
                                         iterations=b.iterations,
                                         record=False,
                                         contact_mode="block",
                                         rest_filter=rest_filter,
                                         contact_tile_j=tj,
                                         n_shapes_active=fuse)
                return float(jnp.sum(final.particles.pos))

            run()
            best = 0.0
            for _ in range(3):
                t0 = time.time()
                run()
                best = max(best, T / (time.time() - t0))
            print(json.dumps({"scene": material, "tile_j": tj,
                              "fused_shapes": fuse, "n": int(b.n_active),
                              "steps_per_s": round(best, 1)}), flush=True)
