"""Bisect the cloth per-iteration cost by knocking out one pass at a time
(monkeypatched stubs; measurement-only script)."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from scripts.bench_real_scenes import scene  # noqa: E402


def timed(name, st, spec, substeps, iterations, reps=50, trials=3):
    from functools import partial
    from adaptigraph_tpu.engine import solver

    @partial(jax.jit, static_argnames=("ss", "it"))
    def run(stx, ss, it):
        def body(s, _):
            s = s._replace(shapes=s.shapes.moved_to(s.shapes.pos, s.shapes.quat))
            s = solver.xpbd_step(s, spec, ss, it, contact_mode="block")
            return s, None
        final, _ = jax.lax.scan(body, stx, None, length=reps)
        return final

    def sync():
        return float(jnp.sum(run(st, substeps, iterations).particles.pos))

    sync()
    best = 1e30
    for _ in range(trials):
        t0 = time.time()
        sync()
        best = min(best, (time.time() - t0) / reps)
    print(json.dumps({"variant": name, "us_per_frame": round(best * 1e6, 1),
                      "us_per_iter": round(best * 1e6 / (substeps * iterations), 2)}),
          flush=True)


def main():
    from adaptigraph_tpu.engine import solver

    print("backend:", jax.default_backend(), flush=True)
    b = scene("cloth")
    st, spec = b.state, b.spec

    timed("full 1x50", st, spec, 1, 50)
    timed("no offset springs 1x50", st, spec._replace(offset_springs=None), 1, 50)

    orig_sweep = solver.block_sparse_contact_deltas
    solver.block_sparse_contact_deltas = (
        lambda pos, *a, **k: (jnp.zeros_like(pos), jnp.zeros(pos.shape[0])))
    timed("no particle contacts 1x50", st, spec, 1, 50)
    solver.block_sparse_contact_deltas = orig_sweep

    orig_shape = solver.shape_contact_deltas
    solver.shape_contact_deltas = (
        lambda pos, *a, **k: (jnp.zeros_like(pos), jnp.zeros(pos.shape[0])))
    timed("no shape contacts 1x50", st, spec, 1, 50)
    solver.shape_contact_deltas = orig_shape

    solver.block_sparse_contact_deltas = (
        lambda pos, *a, **k: (jnp.zeros_like(pos), jnp.zeros(pos.shape[0])))
    solver.shape_contact_deltas = (
        lambda pos, *a, **k: (jnp.zeros_like(pos), jnp.zeros(pos.shape[0])))
    timed("springs only 1x50", st, spec, 1, 50)
    timed("nothing 1x50", st, spec._replace(offset_springs=None), 1, 50)
    solver.block_sparse_contact_deltas = orig_sweep
    solver.shape_contact_deltas = orig_shape


if __name__ == "__main__":
    main()
