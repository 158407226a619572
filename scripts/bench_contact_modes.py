"""Granular/cloth frame cost: block re-detect vs frozen-list sparse contacts."""

import json
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from adaptigraph_tpu.engine.solver import xpbd_step
from adaptigraph_tpu.scenes import build_scene


def bench(mat, mode, k=32, t=20, trials=3):
    b = build_scene(mat, np.random.RandomState(5))
    st, spec = b.state, b.spec

    @partial(jax.jit, static_argnames=("substeps", "iterations", "mode", "k"))
    def run_scan(st, spec, substeps, iterations, mode, k):
        def body(s, _):
            s = s._replace(shapes=s.shapes.moved_to(s.shapes.pos, s.shapes.quat))
            s = xpbd_step(s, spec, substeps, iterations, neighbor_k=k,
                          contact_mode=mode)
            return s, None
        final, _ = jax.lax.scan(body, st, None, length=t)
        return final

    def run():
        return float(jnp.sum(run_scan(st, spec, b.substeps, b.iterations,
                                      mode, k).particles.pos))

    run()
    best = 0.0
    for _ in range(trials):
        t0 = time.time()
        run()
        best = max(best, t / (time.time() - t0))
    print(json.dumps({"scene": mat, "mode": mode, "k": k,
                      "steps_per_s": round(best, 1)}), flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    bench("granular", "block")
    bench("granular", "sparse", k=32)
    bench("granular", "sparse", k=48)
    bench("cloth", "block")
    bench("cloth", "sparse", k=24)
