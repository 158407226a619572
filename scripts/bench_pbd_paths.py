"""Microbench: PBD step throughput per contact path at several N.

Run on the real TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_pbd_paths.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def make_case(n, layout="rope"):
    from adaptigraph_tpu.engine import (
        SHAPE_PLANE, SceneSpec, SceneState, SolverParams)
    from adaptigraph_tpu.engine.state import (
        empty_clusters, make_particles, make_shapes, make_springs)

    from adaptigraph_tpu.engine.cells import morton_order
    from adaptigraph_tpu.scenes.build import _cylinder_lattice

    rng = np.random.RandomState(0)
    if layout == "rope":
        # rope-lattice at exactly n particles: the honest 5k design point
        # (x-major order like the scene builder emits)
        disk = 13  # points per cross-section at rad 0.074 / spacing 0.03
        length = (n // disk + 1) * 0.03
        pos = _cylinder_lattice(length, 0.074, spacing=0.03)[:n]
        pos = pos + np.array([0, 0.5, 0], np.float32)
        n = len(pos)
    else:
        pos = rng.rand(n, 3).astype(np.float32) * np.array([4, 1, 4], np.float32) + \
            np.array([-2, 0.5, -2], np.float32)
        pos = pos[morton_order(pos)]
    p = make_particles(pos, group=np.arange(n) % 500)
    shapes = make_shapes([SHAPE_PLANE], [[0, 0, 0]], [[0, 0, 0]], [[0, 0, 0, 1]],
                         m_max=4)
    idx = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    springs = make_springs(idx, rest=0.05, stiffness=0.3)
    from adaptigraph_tpu.scenes.build import attach_incidence
    spec = SceneSpec(springs=springs, clusters=empty_clusters(2, 4),
                     global_stiffness=jnp.float32(0.0),
                     global_rest=jnp.zeros((0, 3)), rest_pos=jnp.zeros((n, 3)),
                     params=SolverParams())
    spec = attach_incidence(spec, n)
    st = SceneState(particles=p, shapes=shapes,
                    cluster_rot=jnp.tile(jnp.array([0.0, 0, 0, 1.0]), (2, 1)),
                    global_rot=jnp.array([0.0, 0, 0, 1.0]))
    return st, spec


def bench(n, mode, t=100, substeps=2, iterations=4, trials=3, neighbor_k=24,
          layout="rope"):
    st, spec = make_case(n, layout)
    pos_traj = jnp.tile(st.shapes.pos[None], (t, 1, 1))
    quat_traj = jnp.tile(st.shapes.quat[None], (t, 1, 1))

    from adaptigraph_tpu.engine.solver import xpbd_step
    from functools import partial

    @partial(jax.jit, static_argnames=("mode",))
    def run_scan(st, spec, pos_traj, quat_traj, mode):
        def body(s, tgt):
            s = s._replace(shapes=s.shapes.moved_to(*tgt))
            s = xpbd_step(s, spec, substeps, iterations, neighbor_k=neighbor_k,
                          contact_mode=mode)
            return s, None
        final, _ = jax.lax.scan(body, st, (pos_traj, quat_traj))
        return final

    def run():
        final = run_scan(st, spec, pos_traj, quat_traj, mode)
        return float(jnp.sum(final.particles.pos))

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    best = 0.0
    for _ in range(trials):
        t0 = time.time()
        run()
        best = max(best, t / (time.time() - t0))
    return best, compile_s


def bench_nbr_only(n, t=100, trials=3, k=24):
    from adaptigraph_tpu.engine.cells import cell_list_neighbors
    st, _ = make_case(n)
    pos = st.particles.pos
    act = st.particles.active

    @jax.jit
    def run_scan(pos, act):
        def body(p, _):
            idx, valid = cell_list_neighbors(p, 0.045, act, k=k)
            # fold result back so scan doesn't DCE
            p = p + jnp.sum(valid, axis=1, dtype=p.dtype)[:, None] * 0.0
            return p, None
        out, _ = jax.lax.scan(body, pos, None, length=t)
        return out

    float(jnp.sum(run_scan(pos, act)))
    best = 0.0
    for _ in range(trials):
        t0 = time.time()
        float(jnp.sum(run_scan(pos, act)))
        best = max(best, t / (time.time() - t0))
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    for layout in ("rope", "cloud"):
        for n in (5000, 16384, 35000):
            modes = ("block", "dense") if n <= 8192 else ("block",)
            for mode in modes:
                sps, comp = bench(n, mode, layout=layout)
                print(json.dumps({"case": f"pbd n={n} mode={mode} layout={layout}",
                                  "steps_per_s": round(sps, 1),
                                  "compile_s": round(comp, 1)}), flush=True)


if __name__ == "__main__":
    main()
