"""Dense (Pallas) vs sparse (neighbor-list) solver paths must produce the
same trajectories when the neighbor cap is not binding."""

import numpy as np
import jax.numpy as jnp

from adaptigraph_tpu.engine import SHAPE_PLANE, SceneSpec, SceneState, SolverParams, xpbd_step
from adaptigraph_tpu.engine.state import (
    empty_clusters, empty_springs, make_particles, make_shapes)


def _scene(n=60, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.rand(n, 3).astype(np.float32) * 0.5 + np.array([0, 0.3, 0], np.float32)
    p = make_particles(pts, group=np.arange(n) % 10)
    shapes = make_shapes([SHAPE_PLANE], [[0, 0, 0]], [[0, 0, 0]], [[0, 0, 0, 1]],
                         m_max=2)
    spec = SceneSpec(
        springs=empty_springs(0), clusters=empty_clusters(0, 0),
        global_stiffness=jnp.float32(0.0), global_rest=jnp.zeros((0, 3)),
        rest_pos=jnp.zeros((n, 3)),
        params=SolverParams(radius=jnp.float32(0.08),
                            solid_rest_distance=jnp.float32(0.08),
                            gravity=jnp.float32(-10.0)))
    st = SceneState(particles=p, shapes=shapes,
                    cluster_rot=jnp.zeros((0, 4)), global_rot=jnp.array([0.0, 0, 0, 1]))
    return st, spec


def test_dense_and_sparse_trajectories_match():
    st_d, spec = _scene()
    st_s = st_d
    for _ in range(15):
        st_d = xpbd_step(st_d, spec, substeps=2, iterations=4, dense_contacts=True)
        st_s = xpbd_step(st_s, spec, substeps=2, iterations=4, dense_contacts=False,
                         neighbor_k=59)  # cap >= all possible neighbors
    np.testing.assert_allclose(np.asarray(st_d.particles.pos),
                               np.asarray(st_s.particles.pos), atol=5e-5)
