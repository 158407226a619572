"""Decompose the cloth (70x70 grid, 4x50) frame cost per pass on TPU.

Same scan-amortized methodology as bench_frame_parts.py: REPS invocations
inside one program so the ~25-30 ms axon dispatch floor is noise.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from scripts.bench_real_scenes import scene  # noqa: E402


def scan_time(name, body, x0, reps=1000, trials=3):
    from functools import partial

    @partial(jax.jit, static_argnames=())
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


def main():
    from functools import partial
    from adaptigraph_tpu.engine.solver import (_pad_tile, _pad_tile_mask,
                                               _spring_deltas_offset,
                                               xpbd_step)
    from adaptigraph_tpu.engine.collisions import shape_contact_deltas
    from adaptigraph_tpu.engine.pallas_kernels import (
        block_sparse_contact_deltas, refine_overlap_blocks,
        tile_overlap_blocks)

    print("backend:", jax.default_backend(), flush=True)
    b = scene("cloth")
    st, spec = b.state, b.spec
    prm = spec.params
    p = st.particles
    n = p.pos.shape[0]
    print(json.dumps({"n": int(n), "n_active": int(b.n_active),
                      "m_shapes": int(st.shapes.pos.shape[0]),
                      "families": len(spec.offset_springs.offsets)
                      if spec.offset_springs is not None else 0}), flush=True)

    @partial(jax.jit, static_argnames=("ss", "it"))
    def frame(stx, ss, it):
        stx = stx._replace(shapes=stx.shapes.moved_to(stx.shapes.pos,
                                                      stx.shapes.quat))
        return xpbd_step(stx, spec, ss, it, contact_mode="block")

    scan_time("frame 4x50", lambda s: frame(s, 4, 50), st, reps=20)
    scan_time("frame 4x1", lambda s: frame(s, 4, 1), st, reps=100)
    scan_time("frame 1x1", lambda s: frame(s, 1, 1), st, reps=100)
    scan_time("frame 1x50", lambda s: frame(s, 1, 50), st, reps=50)

    # individual passes at the cloth design point
    scan_time("offset springs",
              lambda pos: pos + 1e-6 * _spring_deltas_offset(
                  pos, p.inv_mass, spec.offset_springs)[0],
              p.pos)
    s_vel = (st.shapes.pos - st.shapes.prev_pos) / prm.dt
    scan_time("shape contacts",
              lambda pos: pos + 1e-6 * shape_contact_deltas(
                  pos, pos, st.shapes, st.shapes.pos, st.shapes.quat, s_vel,
                  prm.collision_distance, prm.shape_collision_margin,
                  prm.dynamic_friction, prm.dt / 4)[0],
              p.pos)

    bidx, bcnt, _ = tile_overlap_blocks(_pad_tile(p.pos), _pad_tile_mask(p.active),
                                        prm.radius * 1.5)
    keep = jnp.maximum(prm.radius * 1.5, prm.solid_rest_distance * 1.25)
    ridx, rcnt = refine_overlap_blocks(
        p.pos, p.pos, p.group, p.inv_mass, p.self_collide, p.active,
        spec.rest_pos, keep, prm.collide_filter_dist, bidx, bcnt)
    import numpy as np
    print(json.dumps({"blocks_aabb": int(np.sum(np.asarray(bcnt))),
                      "blocks_refined": int(np.sum(np.asarray(rcnt)))}),
          flush=True)
    scan_time("contact sweep (refined)",
              lambda pos: pos + 1e-6 * block_sparse_contact_deltas(
                  pos, pos, p.group, p.inv_mass, p.self_collide, p.active,
                  spec.rest_pos, prm.solid_rest_distance,
                  prm.particle_friction, prm.collide_filter_dist,
                  ridx, rcnt)[0],
              p.pos)
    scan_time("contact sweep (aabb)",
              lambda pos: pos + 1e-6 * block_sparse_contact_deltas(
                  pos, pos, p.group, p.inv_mass, p.self_collide, p.active,
                  spec.rest_pos, prm.solid_rest_distance,
                  prm.particle_friction, prm.collide_filter_dist,
                  bidx, bcnt)[0],
              p.pos)


if __name__ == "__main__":
    main()
