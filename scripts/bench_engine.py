"""Standalone engine microbenchmark: PBD steps/s at N particles on the
current default JAX device. Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_engine.py [N]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from adaptigraph_tpu.engine import (  # noqa: E402
    SHAPE_PLANE,
    SceneSpec,
    SceneState,
    SolverParams,
    rollout_steps,
)
from adaptigraph_tpu.engine.state import (  # noqa: E402
    empty_clusters,
    make_particles,
    make_shapes,
    make_springs,
)


def main(n=5000, t=100, substeps=2, iterations=4):
    print("devices", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    pos = rng.rand(n, 3).astype(np.float32) * np.array([4, 1, 4], np.float32) + np.array(
        [-2, 0.5, -2], np.float32)
    p = make_particles(pos, group=np.arange(n) % 500)
    shapes = make_shapes([SHAPE_PLANE], [[0, 0, 0]], [[0, 0, 0]], [[0, 0, 0, 1]], m_max=4)
    idx = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    springs = make_springs(idx, rest=0.05, stiffness=0.3)
    spec = SceneSpec(
        springs=springs,
        clusters=empty_clusters(2, 4),
        global_stiffness=jnp.float32(0.0),
        global_rest=jnp.zeros((0, 3)),
        rest_pos=jnp.zeros((n, 3)),
        params=SolverParams(),
    )
    st0 = SceneState(
        particles=p, shapes=shapes,
        cluster_rot=jnp.tile(jnp.array([0.0, 0, 0, 1.0]), (2, 1)),
        global_rot=jnp.array([0.0, 0, 0, 1.0]),
    )
    pos_traj = jnp.tile(st0.shapes.pos[None], (t, 1, 1))
    quat_traj = jnp.tile(st0.shapes.quat[None], (t, 1, 1))

    def sync(x):  # scalar device->host transfer as the sync point
        return float(jnp.sum(x))

    t1 = time.time()
    final, _ = rollout_steps(st0, spec, pos_traj, quat_traj, substeps=substeps,
                             iterations=iterations, record=False)
    s = sync(final.particles.pos)
    print(f"compile+first {t} steps: {time.time() - t1:.1f}s (sum={s:.2f})", flush=True)
    best = 0.0
    for trial in range(3):
        t1 = time.time()
        final, _ = rollout_steps(st0, spec, pos_traj, quat_traj, substeps=substeps,
                                 iterations=iterations, record=False)
        s = sync(final.particles.pos)
        rate = t / (time.time() - t1)
        best = max(best, rate)
        print(f"trial {trial}: {rate:.0f} steps/s @{n} particles (sum={s:.2f})", flush=True)
    y = np.asarray(final.particles.pos)[:, 1]
    print(f"min/max y: {y.min():.3f} {y.max():.3f} nan: {bool(np.isnan(y).any())}", flush=True)
    print(f"BEST {best:.0f} steps/s", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5000)
