"""Isolate per-pass cost of the 5k rope-layout PBD frame on TPU."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from scripts.bench_pbd_paths import make_case  # noqa: E402


def bench_variant(name, springs=True, contacts=True, t=100, trials=3):
    from adaptigraph_tpu.engine.state import empty_springs
    from adaptigraph_tpu.engine.solver import xpbd_step
    from functools import partial

    st, spec = make_case(5000, "rope")
    if not springs:
        spec = spec._replace(springs=empty_springs(0))
    mode = "block" if contacts else "sparse"

    @partial(jax.jit, static_argnames=("mode",))
    def run_scan(st, spec, mode):
        def body(s, _):
            s = s._replace(shapes=s.shapes.moved_to(s.shapes.pos, s.shapes.quat))
            s = xpbd_step(s, spec, 2, 4, neighbor_k=2 if not contacts else 24,
                          contact_mode=mode)
            return s, None
        final, _ = jax.lax.scan(body, st, None, length=t)
        return final

    def run():
        return float(jnp.sum(run_scan(st, spec, mode).particles.pos))

    run()
    best = 0.0
    for _ in range(trials):
        t0 = time.time()
        run()
        best = max(best, t / (time.time() - t0))
    print(json.dumps({"variant": name, "steps_per_s": round(best, 1)}), flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    bench_variant("full (block contacts + springs)")
    bench_variant("no springs", springs=False)
    bench_variant("no contacts (sparse k=2 stub + springs)", contacts=False)
    bench_variant("neither", springs=False, contacts=False)
