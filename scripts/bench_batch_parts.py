"""Decompose the MULTI-ENV vmapped PBD frame cost on the real TPU.

VERDICT r3 weak #2: 4 vmapped envs deliver only 1.36x aggregate over one
env — something between "VPU saturated at 1 env" (expect ~1x) and
"dispatch-bound" (expect ~4x) serializes the batched program, and nobody
has measured WHERE. This script answers it with two sweeps on the REAL
bench rope scene (5120 particles, swept pusher, 2x4 schedule):

  1. env-scaling curve: whole-frame time for n_env in {1, 2, 4, 8} —
     linear growth = compute-bound at 1 env already; flat = dispatch bound.
  2. pass-level deltas at n_env=4: frame minus clusters / springs / global /
     with dense instead of block contacts — the pass whose REMOVAL restores
     scaling is the serializer.

Every measurement scans REPS frame invocations inside one program (the
~25-30 ms tunnel dispatch floor would otherwise dominate; CLAUDE.md).
"""

import json
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from adaptigraph_tpu.engine import xpbd_step
from adaptigraph_tpu.engine.state import (SHAPE_BOX, SHAPE_PLANE,
                                          empty_clusters, empty_springs,
                                          make_shapes)
from adaptigraph_tpu.scenes import build_scene
from adaptigraph_tpu.scenes.build import Caps

REPS = 100


def scan_time(name, body, x0, reps=REPS, trials=3):
    @jax.jit
    def run(x):
        def f(c, _):
            return body(c), None

        c, _ = jax.lax.scan(f, x, None, length=reps)
        return c

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf))

    sync(run(x0))
    best = 1e30
    for _ in range(trials):
        t0 = time.time()
        sync(run(x0))
        best = min(best, (time.time() - t0) / reps)
    print(json.dumps({"op": name, "us": round(best * 1e6, 1)}), flush=True)
    return best


def bench_scene(n=5120):
    caps = Caps(n=n, s=0, c=1024, k=640, m=2)
    shapes = make_shapes(
        [SHAPE_PLANE, SHAPE_BOX],
        [[0, 0, 0], [0.05, 0.4, 0.8]],
        [[0, 0, 0], [0, 0.4, 0]],
        [[0, 0, 0, 1], [0, 0, 0, 1]], m_max=caps.m)
    return build_scene("rope", np.random.RandomState(0), shapes=shapes,
                       caps=caps,
                       scene_overrides={"length": 6.0,
                                        "translation": np.zeros(3, np.float32),
                                        "z_rotation": 0.0,
                                        "y_rotation": 90.0})


def main():
    print("backend:", jax.default_backend(), flush=True)
    b = bench_scene()
    st, spec = b.state, b.spec

    def variant_spec(variant):
        sp = spec
        if variant == "no_clusters":
            sp = sp._replace(clusters=empty_clusters(0, 0), cluster_mm=None,
                             cluster_seg=None, cluster_inc=None)
        elif variant == "no_springs":
            sp = sp._replace(springs=empty_springs(0), spring_inc=None,
                             offset_springs=None)
        elif variant == "no_global":
            sp = sp._replace(global_rest=jnp.zeros((0, 3)))
        return sp

    @partial(jax.jit, static_argnames=("variant", "mode"))
    def frame1(stx, variant="full", mode="block"):
        stx = stx._replace(shapes=stx.shapes.moved_to(stx.shapes.pos,
                                                      stx.shapes.quat))
        return xpbd_step(stx, variant_spec(variant), b.substeps, b.iterations,
                         contact_mode=mode)

    def batched(n_env, variant="full", mode="block"):
        st_b = jax.tree.map(
            lambda x: jnp.tile(x[None], (n_env,) + (1,) * x.ndim), st)

        def body(sb):
            return jax.vmap(lambda s: frame1(s, variant=variant, mode=mode))(sb)

        return body, st_b

    # 1) env-scaling curve, full frame
    base = None
    for n_env in (1, 2, 4, 8):
        body, st_b = batched(n_env)
        t = scan_time(f"frame x{n_env} full", body, st_b)
        if n_env == 1:
            base = t
        else:
            print(json.dumps({"scaling": n_env,
                              "aggregate_x": round(n_env * base / t, 2)}),
                  flush=True)

    # 2) pass-level deltas at n_env=4
    for variant in ("no_clusters", "no_springs", "no_global"):
        body, st_b = batched(4, variant=variant)
        scan_time(f"frame x4 {variant}", body, st_b)
    for mode in ("dense", "sparse"):
        body, st_b = batched(4, mode=mode)
        scan_time(f"frame x4 contacts={mode}", body, st_b)
    # single-env reference for the same variants
    for variant in ("no_clusters", "no_springs"):
        body, st_b = batched(1, variant=variant)
        scan_time(f"frame x1 {variant}", body, st_b)


if __name__ == "__main__":
    main()
