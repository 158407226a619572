"""Separate cloth per-frame fixed cost (blocks+refine) from per-iteration
cost, with program totals >> the ~27 ms axon dispatch floor."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from scripts.bench_real_scenes import scene  # noqa: E402


def timed(name, jfn, x, n_inner, min_total=0.5, trials=3):
    def sync():
        out = jfn(x)
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf))

    sync()
    t0 = time.time()
    sync()
    per = time.time() - t0
    calls = max(1, int(min_total / max(per, 1e-5)))
    best = 1e30
    for _ in range(trials):
        t0 = time.time()
        for _ in range(calls):
            sync()
        best = min(best, (time.time() - t0) / calls)
    print(json.dumps({"variant": name,
                      "us_each": round(best * 1e6 / n_inner, 2),
                      "program_ms": round(best * 1e3, 1)}), flush=True)


def main():
    from functools import partial
    from adaptigraph_tpu.engine import solver
    from adaptigraph_tpu.engine.solver import _pad_tile, _pad_tile_mask
    from adaptigraph_tpu.engine.pallas_kernels import (
        refine_overlap_blocks, tile_overlap_blocks)

    print("backend:", jax.default_backend(), flush=True)
    b = scene("cloth")
    st, spec = b.state, b.spec
    prm = spec.params
    p = st.particles

    # per-frame parts, REPS=1000 inside one program
    pp = _pad_tile(p.pos)
    pa = _pad_tile_mask(p.active)

    @jax.jit
    def blocks_scan(x):
        def f(c, _):
            bidx, bcnt, _ = tile_overlap_blocks(c, pa, prm.radius * 1.5)
            return c + 1e-9 * bcnt[0], None
        c, _ = jax.lax.scan(f, x, None, length=1000)
        return c
    timed("tile_overlap_blocks", blocks_scan, pp, 1000)

    bidx, bcnt, _ = tile_overlap_blocks(pp, pa, prm.radius * 1.5)

    @jax.jit
    def refine_scan(x):
        def f(c, _):
            ridx, rcnt = refine_overlap_blocks(
                c, c, p.group, p.inv_mass, p.self_collide, p.active,
                spec.rest_pos, prm.radius * 1.5, prm.collide_filter_dist,
                bidx, bcnt)
            return c + 1e-9 * rcnt[0], None
        c, _ = jax.lax.scan(f, x, None, length=1000)
        return c
    timed("refine_overlap_blocks", refine_scan, p.pos, 1000)

    # stubbed frames: contact + shape stubs, no springs
    orig_sweep = solver.block_sparse_contact_deltas
    orig_shape = solver.shape_contact_deltas
    solver.block_sparse_contact_deltas = (
        lambda pos, *a, **k: (jnp.zeros_like(pos), jnp.zeros(pos.shape[0])))
    solver.shape_contact_deltas = (
        lambda pos, *a, **k: (jnp.zeros_like(pos), jnp.zeros(pos.shape[0])))
    spec_ns = spec._replace(offset_springs=None)

    for ss, it, reps in [(1, 1, 500), (1, 10, 300), (1, 50, 100), (4, 50, 50)]:
        @partial(jax.jit, static_argnames=())
        def run(stx, ss=ss, it=it, reps=reps):
            def body(s, _):
                s = s._replace(shapes=s.shapes.moved_to(s.shapes.pos,
                                                        s.shapes.quat))
                s = solver.xpbd_step(s, spec_ns, ss, it, contact_mode="block")
                return s, None
            final, _ = jax.lax.scan(body, stx, None, length=reps)
            return final
        timed(f"stub frame {ss}x{it}", run, st, reps)

    solver.block_sparse_contact_deltas = orig_sweep
    solver.shape_contact_deltas = orig_shape


if __name__ == "__main__":
    main()
