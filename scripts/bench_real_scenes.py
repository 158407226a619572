"""Per-pass cost of REAL material scenes on TPU (block contact mode)."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def scene(mat):
    from adaptigraph_tpu.engine import SHAPE_PLANE
    from adaptigraph_tpu.engine.state import make_shapes
    from adaptigraph_tpu.scenes import build_scene
    from adaptigraph_tpu.scenes.build import MATERIAL_CAPS

    caps = MATERIAL_CAPS[mat]
    rng = np.random.RandomState(0)
    shapes = make_shapes([SHAPE_PLANE], [[0, 0, 0]], [[0, 0, 0]], [[0, 0, 0, 1]],
                         m_max=caps.m)
    return build_scene(mat, rng, shapes=shapes, caps=caps)


def bench(mat, variant="full", t=50, trials=3):
    from adaptigraph_tpu.engine.state import empty_clusters, empty_springs
    from adaptigraph_tpu.engine.solver import xpbd_step
    from functools import partial

    b = scene(mat)
    st, spec = b.state, b.spec
    ns_active = st.shapes.kind.shape[0] if variant == "fused_shapes" else None
    if variant == "no_clusters":
        spec = spec._replace(clusters=empty_clusters(0, 0),
                             global_rest=jnp.zeros((0, 3)))
        st = st._replace(cluster_rot=jnp.zeros((0, 4)))
    if variant == "no_springs":
        spec = spec._replace(springs=empty_springs(0))

    @partial(jax.jit, static_argnames=("substeps", "iterations"))
    def run_scan(st, spec, substeps, iterations):
        def body(s, _):
            s = s._replace(shapes=s.shapes.moved_to(s.shapes.pos, s.shapes.quat))
            s = xpbd_step(s, spec, substeps, iterations, contact_mode="block",
                          n_shapes_active=ns_active)
            return s, None
        final, _ = jax.lax.scan(body, st, None, length=t)
        return final

    def run():
        return float(jnp.sum(
            run_scan(st, spec, b.substeps, b.iterations).particles.pos))

    run()
    best = 0.0
    for _ in range(trials):
        t0 = time.time()
        run()
        best = max(best, t / (time.time() - t0))
    print(json.dumps({"scene": mat, "variant": variant, "n": int(b.n_active),
                      "sub_x_iter": f"{b.substeps}x{b.iterations}",
                      "steps_per_s": round(best, 1)}), flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    which = sys.argv[1:] or ["rope", "rope:fused_shapes", "granular",
                             "granular:fused_shapes", "cloth",
                             "cloth:fused_shapes"]
    for spec_s in which:
        mat, _, var = spec_s.partition(":")
        bench(mat, var or "full", t=50 if mat == "rope" else 20)
