"""Per-pass iteration cost for any material scene, with jax.clear_caches()
between monkeypatched variants (xpbd_step's jit cache otherwise serves the
unstubbed trace for identical arguments)."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from scripts.bench_real_scenes import scene  # noqa: E402


def timed(mat, name, st, spec, substeps, iterations, reps, trials=3):
    from functools import partial
    from adaptigraph_tpu.engine import solver

    jax.clear_caches()

    @partial(jax.jit, static_argnames=())
    def run(stx):
        def body(s, _):
            s = s._replace(shapes=s.shapes.moved_to(s.shapes.pos, s.shapes.quat))
            s = solver.xpbd_step(s, spec, substeps, iterations,
                                 contact_mode="block")
            return s, None
        final, _ = jax.lax.scan(body, stx, None, length=reps)
        return final

    def sync():
        return float(jnp.sum(run(st).particles.pos))

    sync()
    best = 1e30
    for _ in range(trials):
        t0 = time.time()
        sync()
        best = min(best, (time.time() - t0) / reps)
    it = substeps * iterations
    print(json.dumps({"mat": mat, "variant": name,
                      "us_per_frame": round(best * 1e6, 1),
                      "us_per_iter": round(best * 1e6 / it, 2)}), flush=True)


def main(mats):
    from adaptigraph_tpu.engine import solver
    from adaptigraph_tpu.engine.state import empty_clusters

    print("backend:", jax.default_backend(), flush=True)
    stub = lambda pos, *a, **k: (jnp.zeros_like(pos), jnp.zeros(pos.shape[0]))
    for mat in mats:
        b = scene(mat)
        st, spec = b.state, b.spec
        ss, it = b.substeps, b.iterations
        reps = max(20, int(2.0 / (ss * it * 3e-4)))

        timed(mat, "full", st, spec, ss, it, reps)
        timed(mat, "no offset springs", st,
              spec._replace(offset_springs=None), ss, it, reps)
        if spec.clusters.member.shape[0] > 0:
            timed(mat, "no clusters", st._replace(cluster_rot=jnp.zeros((0, 4))),
                  spec._replace(clusters=empty_clusters(0, 0),
                                global_rest=jnp.zeros((0, 3))), ss, it, reps)

        orig_sweep = solver.block_sparse_contact_deltas
        solver.block_sparse_contact_deltas = stub
        timed(mat, "sweep stubbed", st, spec, ss, it, reps)
        solver.block_sparse_contact_deltas = orig_sweep

        orig_shape = solver.shape_contact_deltas
        solver.shape_contact_deltas = stub
        timed(mat, "shape stubbed", st, spec, ss, it, reps)
        solver.shape_contact_deltas = orig_shape


if __name__ == "__main__":
    main(sys.argv[1:] or ["rope", "cloth"])
