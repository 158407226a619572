"""Isolate cluster-pass variants + global pass on the real TPU."""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from scripts.bench_frame_parts import scan_time
from adaptigraph_tpu.scenes import build_scene
from adaptigraph_tpu.engine.solver import (
    _cluster_deltas, _cluster_deltas_segments, _global_cluster_deltas)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(3)
    b = build_scene("rope", rng)
    spec, st = b.spec, b.state
    p0 = st.particles

    def glob(p):
        d, c, q = _global_cluster_deltas(p, p0.active, p0.inv_mass,
                                         spec.global_rest,
                                         spec.global_stiffness, st.global_rot)
        return p + 1e-6 * d

    scan_time("global cluster pass (rope)", glob, p0.pos, reps=500)

    g = build_scene("granular", np.random.RandomState(5))
    gs, gst = g.spec, g.state
    print("granular seg built:", gs.cluster_seg is not None, flush=True)

    def segp(p):
        d, c, q = _cluster_deltas_segments(p, gs.rest_pos, gs.clusters,
                                           gst.cluster_rot, gs.cluster_seg)
        return p + 1e-6 * d

    scan_time("granular seg cluster pass", segp, gst.particles.pos, reps=200)

    def gath(p):
        d, c, q = _cluster_deltas(p, gs.clusters, gst.cluster_rot,
                                  inc=gs.cluster_inc)
        return p + 1e-6 * d

    scan_time("granular gather cluster pass", gath, gst.particles.pos, reps=50)


if __name__ == "__main__":
    main()
