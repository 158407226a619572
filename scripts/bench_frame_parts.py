"""Decompose the 5k rope-layout PBD frame cost op-by-op on the real TPU.

Every measurement scans REPS=1000 invocations inside ONE program so the
axon tunnel latency (~25-30 ms/dispatch) is amortized to noise.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import os

import numpy as np
import jax

if os.environ.get("ADAPTIGRAPH_FORCE_CPU"):
    # the axon sitecustomize overrides JAX_PLATFORMS (CLAUDE.md); this is
    # the only reliable way to keep a profile run off the (single-tenant)
    # TPU while a campaign holds it
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from scripts.bench_pbd_paths import make_case  # noqa: E402

REPS = 1000


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


def main():
    from functools import partial
    from adaptigraph_tpu.engine.solver import (
        _spring_deltas, _spring_deltas_gather, xpbd_step)
    from adaptigraph_tpu.engine.collisions import shape_contact_deltas
    from adaptigraph_tpu.engine.pallas_kernels import (
        block_sparse_contact_deltas, tile_overlap_blocks)
    from adaptigraph_tpu.engine.state import empty_springs

    print("backend:", jax.default_backend(), flush=True)
    st, spec = make_case(5000, "rope")
    p = st.particles
    n = p.pos.shape[0]
    pos = p.pos

    # ---- whole frames (REPS=100: frames are ~ms each) ----
    def frame(mode_spec, substeps, iterations):
        @partial(jax.jit, static_argnames=("ss", "it"))
        def f(stx, ss, it):
            stx = stx._replace(shapes=stx.shapes.moved_to(stx.shapes.pos,
                                                          stx.shapes.quat))
            return xpbd_step(stx, mode_spec, ss, it, contact_mode="block")
        return lambda stx: f(stx, substeps, iterations)

    scan_time("frame 2x4 (full)", frame(spec, 2, 4), st, reps=200)
    scan_time("frame 2x4 (no springs)",
              frame(spec._replace(springs=empty_springs(0), spring_inc=None), 2, 4),
              st, reps=200)
    scan_time("frame 2x1 (full)", frame(spec, 2, 1), st, reps=200)
    scan_time("frame 1x1 (full)", frame(spec, 1, 1), st, reps=200)

    # ---- individual passes ----
    pad = -(-n // 128) * 128
    pos_pad = jnp.pad(pos, ((0, pad - n), (0, 0)))
    act_pad = jnp.pad(p.active, (0, pad - n))
    bidx, bcnt, _ = tile_overlap_blocks(pos_pad, act_pad, 0.045)

    scan_time("block contact kernel", lambda x: block_sparse_contact_deltas(
        x, x, p.group, p.inv_mass, p.self_collide, p.active, spec.rest_pos,
        0.03, 0.25, 0.0, bidx, bcnt)[0] * 1e-6 + x, pos)
    scan_time("tile_overlap_blocks", lambda x: x + 1e-6 * tile_overlap_blocks(
        x[:pad] if x.shape[0] >= pad else jnp.pad(x, ((0, pad - x.shape[0]), (0, 0))),
        act_pad, 0.045)[0].astype(jnp.float32).sum(), pos_pad)
    if spec.offset_springs is not None:
        from adaptigraph_tpu.engine.solver import _spring_deltas_offset
        scan_time("spring pass offset-family", lambda x: _spring_deltas_offset(
            x, p.inv_mass, spec.offset_springs)[0] * 1e-6 + x, pos)
    if spec.springs.idx.shape[0] > 0:
        scan_time("spring pass scatter", lambda x: _spring_deltas(
            x, p.inv_mass, spec.springs)[0] * 1e-6 + x, pos)
    if spec.spring_inc is not None:
        scan_time("spring pass gather-inc", lambda x: _spring_deltas_gather(
            x, p.inv_mass, spec.springs, spec.spring_inc)[0] * 1e-6 + x, pos)
    svel = jnp.zeros_like(st.shapes.pos)
    scan_time("shape contact pass", lambda x: shape_contact_deltas(
        x, x, st.shapes, st.shapes.pos, st.shapes.quat, svel,
        0.015, 0.0, 0.1, 1 / 120)[0] * 1e-6 + x, pos)
    # plain gather and scatter at N=5k for reference
    idx = jnp.asarray(np.random.RandomState(1).randint(0, n, n).astype(np.int32))
    scan_time("bare gather (N,3)", lambda x: x[idx] * 1e-6 + x, pos)
    scan_time("bare scatter-add (N,3)", lambda x: jnp.zeros_like(x).at[idx].add(x)
              * 1e-6 + x, pos)

    real_case()


def real_case():
    """Decompose the REAL bench scene (bench.bench_pbd: build_scene rope at
    5120 particles, ball-cover clusters + global cluster + floor + pusher,
    2x4 schedule) — the simplified case above has springs only."""
    from functools import partial

    from adaptigraph_tpu.engine import xpbd_step
    from adaptigraph_tpu.engine.pallas_kernels import (
        pack_contact_tables, refine_overlap_blocks_packed, tile_overlap_blocks,
        update_contact_tables)
    from adaptigraph_tpu.engine.solver import (
        _cluster_deltas_matmul, _global_cluster_deltas, _pad_tile,
        _pad_tile_mask)
    from adaptigraph_tpu.engine.state import (SHAPE_BOX, SHAPE_PLANE,
                                              empty_clusters, make_shapes)
    from adaptigraph_tpu.scenes import build_scene
    from adaptigraph_tpu.scenes.build import Caps

    print("--- real bench scene (5120-particle rope) ---", flush=True)
    caps = Caps(n=5120, s=0, c=1024, k=640, m=2)
    shapes = make_shapes(
        [SHAPE_PLANE, SHAPE_BOX],
        [[0, 0, 0], [0.05, 0.4, 0.8]],
        [[0, 0, 0], [0, 0.4, 0]],
        [[0, 0, 0, 1], [0, 0, 0, 1]], m_max=caps.m)
    b = build_scene("rope", np.random.RandomState(0), shapes=shapes,
                    caps=caps,
                    scene_overrides={"length": 6.0,
                                     "translation": np.zeros(3, np.float32),
                                     "z_rotation": 0.0, "y_rotation": 90.0})
    st, spec = b.state, b.spec
    p = st.particles
    n = p.pos.shape[0]
    pos = p.pos
    prm = spec.params

    @partial(jax.jit, static_argnames=("variant",))
    def frame(stx, variant="full"):
        sp = spec
        if variant == "no_clusters":
            sp = sp._replace(clusters=empty_clusters(0, 0), cluster_mm=None,
                             cluster_seg=None, cluster_inc=None)
        elif variant == "no_global":
            sp = sp._replace(global_rest=jnp.zeros((0, 3)))
        stx = stx._replace(shapes=stx.shapes.moved_to(stx.shapes.pos,
                                                      stx.shapes.quat))
        return xpbd_step(stx, sp, b.substeps, b.iterations,
                         contact_mode="block")

    for v in ("full", "no_clusters", "no_global"):
        scan_time(f"REAL frame 2x4 {v}",
                  lambda stx, v=v: frame(stx, variant=v), st, reps=200)

    # per-frame block-structure build (tables + AABB + refine), as xpbd_step
    # does it once per frame
    def block_build(x):
        tables = pack_contact_tables(x, x, p.group, p.inv_mass,
                                     p.self_collide, p.active, spec.rest_pos)
        bi, bc, _ = tile_overlap_blocks(_pad_tile(x), _pad_tile_mask(p.active),
                                        prm.radius * 1.5, max_blocks=40)
        bi, bc = refine_overlap_blocks_packed(
            n, *tables, prm.solid_rest_distance * 1.05,
            prm.collide_filter_dist, bi, bc)
        return x + 1e-6 * (bc.astype(jnp.float32).sum())

    scan_time("REAL block build (tables+AABB+refine)", block_build, pos,
              reps=200)
    if spec.cluster_mm is not None:
        scan_time("REAL cluster matmul pass", lambda x: _cluster_deltas_matmul(
            x, spec.rest_pos, spec.clusters, st.cluster_rot,
            spec.cluster_mm)[0] * 1e-6 + x, pos)
    if spec.global_rest.shape[0] > 0:
        scan_time("REAL global cluster pass",
                  lambda x: _global_cluster_deltas(
                      x, p.active, p.inv_mass, spec.global_rest,
                      spec.global_stiffness, st.global_rot)[0] * 1e-6 + x,
                  pos)

    # ---- per-ITERATION parts at the real design point (x8 per 2x4 frame):
    # the residual frame time after the r4 trim/hoist is unattributed
    # (VERDICT r3 #5); measure each op the fori_loop body actually runs ----
    from adaptigraph_tpu.engine.pallas_kernels import (
        block_sparse_contact_deltas_packed, update_contact_tables)
    from adaptigraph_tpu.engine.solver import _spring_deltas_offset

    tables0 = pack_contact_tables(pos, pos, p.group, p.inv_mass,
                                  p.self_collide, p.active, spec.rest_pos)
    bi0, bc0, _ = tile_overlap_blocks(_pad_tile(pos), _pad_tile_mask(p.active),
                                      prm.radius * 1.5, max_blocks=40)
    bi0, bc0 = refine_overlap_blocks_packed(
        n, *tables0, prm.solid_rest_distance * 1.05,
        prm.collide_filter_dist, bi0, bc0)

    def upd_tables(x):
        r, c = update_contact_tables(*tables0, x)
        return x + 1e-6 * (r[0, 0] + c[0, 0])

    scan_time("REAL update_contact_tables(pos)", upd_tables, pos)

    def sweep_only(x):
        r, c = update_contact_tables(*tables0, x)
        d, cnt = block_sparse_contact_deltas_packed(
            n, r, c, prm.solid_rest_distance, prm.particle_friction,
            prm.collide_filter_dist, bi0, bc0)
        return x + 1e-6 * d

    scan_time("REAL update+sweep (refined blocks)", sweep_only, pos)

    if spec.offset_springs is not None and len(spec.offset_springs.offsets):
        def springs_only(x):
            d, cnt = _spring_deltas_offset(x, p.inv_mass, spec.offset_springs)
            return x + 1e-6 * d

        scan_time("REAL offset-spring pass", springs_only, pos)

    def integrate_only(x):
        vel = (x - pos) / 0.016 + jnp.array([0.0, 1.0, 0.0]) * (-9.8 * 0.016)
        speed = jnp.linalg.norm(vel, axis=-1, keepdims=True)
        vel = vel * jnp.minimum(1.0, prm.max_speed / (speed + 1e-8))
        return x + vel * 1e-6

    scan_time("REAL integrate-ish overhead", integrate_only, pos)



if __name__ == "__main__" and not ("--tiles" in sys.argv
                                   or "--batch" in sys.argv):
    main()


def tile_probe():
    from adaptigraph_tpu.engine.pallas_kernels import (
        block_sparse_contact_deltas, tile_overlap_blocks)
    print("backend:", jax.default_backend(), flush=True)
    st, spec = make_case(5000, "rope")
    p = st.particles
    pos = p.pos
    for tile in (32, 64, 128):
        pad = -(-pos.shape[0] // tile) * tile
        pos_pad = jnp.pad(pos, ((0, pad - pos.shape[0]), (0, 0)))
        act_pad = jnp.pad(p.active, (0, pad - pos.shape[0]))
        bidx, bcnt, ovf = tile_overlap_blocks(pos_pad, act_pad, 0.045, tile=tile)
        print("tile", tile, "mean blocks/row:",
              round(float(jnp.mean(bcnt.astype(jnp.float32))), 2),
              "overflow:", int(ovf), flush=True)
        scan_time(f"block kernel tile={tile}",
                  lambda x, t=tile, bi=bidx, bc=bcnt: block_sparse_contact_deltas(
                      x, x, p.group, p.inv_mass, p.self_collide, p.active,
                      spec.rest_pos, 0.03, 0.25, 0.0, bi, bc, tile=t)[0]
                  * 1e-6 + x, pos)


def batch_scaling():
    """Explain the 4-env vmapped aggregate (VERDICT r3 weak #2 / next #4):
    time the REAL bench scene's full frame and each major pass vmapped over
    n_env in {1, 2, 4, 8} (state batched, spec shared — exactly
    bench.bench_pbd_batch's configuration). A pass whose time grows ~n_env
    is throughput-bound (TPU Pallas grids run sequentially; more envs =
    proportionally more grid steps); one whose time is ~flat is
    latency/overhead-bound and batching amortizes it."""
    from functools import partial

    from adaptigraph_tpu.engine import xpbd_step
    from adaptigraph_tpu.engine.pallas_kernels import (
        pack_contact_tables, refine_overlap_blocks_packed, tile_overlap_blocks)
    from adaptigraph_tpu.engine.solver import (
        _cluster_deltas_matmul, _global_cluster_deltas, _pad_tile,
        _pad_tile_mask)
    from adaptigraph_tpu.engine.collisions import shape_contact_deltas
    from adaptigraph_tpu.engine.state import SHAPE_BOX, SHAPE_PLANE, make_shapes
    from adaptigraph_tpu.scenes import build_scene
    from adaptigraph_tpu.scenes.build import Caps

    print("--- batched scaling, real bench scene ---", flush=True)
    print("backend:", jax.default_backend(), flush=True)
    caps = Caps(n=5120, s=0, c=1024, k=640, m=2)
    shapes = make_shapes(
        [SHAPE_PLANE, SHAPE_BOX],
        [[0, 0, 0], [0.05, 0.4, 0.8]],
        [[0, 0, 0], [0, 0.4, 0]],
        [[0, 0, 0, 1], [0, 0, 0, 1]], m_max=caps.m)
    b = build_scene("rope", np.random.RandomState(0), shapes=shapes,
                    caps=caps,
                    scene_overrides={"length": 6.0,
                                     "translation": np.zeros(3, np.float32),
                                     "z_rotation": 0.0, "y_rotation": 90.0})
    st, spec = b.state, b.spec
    p = st.particles
    n = p.pos.shape[0]
    prm = spec.params

    def frame_one(stx):
        stx = stx._replace(shapes=stx.shapes.moved_to(stx.shapes.pos,
                                                      stx.shapes.quat))
        return xpbd_step(stx, spec, b.substeps, b.iterations,
                         contact_mode="block")

    def block_build_one(x):
        tables = pack_contact_tables(x, x, p.group, p.inv_mass,
                                     p.self_collide, p.active, spec.rest_pos)
        bi, bc, _ = tile_overlap_blocks(_pad_tile(x), _pad_tile_mask(p.active),
                                        prm.radius * 1.5, max_blocks=40)
        bi, bc = refine_overlap_blocks_packed(
            n, *tables, prm.solid_rest_distance * 1.05,
            prm.collide_filter_dist, bi, bc)
        return x + 1e-6 * (bc.astype(jnp.float32).sum())

    def sweep_one(x):
        from adaptigraph_tpu.engine.pallas_kernels import (
            block_sparse_contact_deltas)
        bi, bc, _ = tile_overlap_blocks(_pad_tile(x), _pad_tile_mask(p.active),
                                        prm.radius * 1.5, max_blocks=40)
        return block_sparse_contact_deltas(
            x, x, p.group, p.inv_mass, p.self_collide, p.active, spec.rest_pos,
            prm.solid_rest_distance, prm.dynamic_friction, 0.0, bi, bc,
        )[0] * 1e-6 + x

    def cluster_one(x):
        return _cluster_deltas_matmul(x, spec.rest_pos, spec.clusters,
                                      st.cluster_rot, spec.cluster_mm)[0] \
            * 1e-6 + x

    def global_one(x):
        return _global_cluster_deltas(x, p.active, p.inv_mass,
                                      spec.global_rest, spec.global_stiffness,
                                      st.global_rot)[0] * 1e-6 + x

    svel = jnp.zeros_like(st.shapes.pos)

    def shape_one(x):
        return shape_contact_deltas(
            x, x, st.shapes, st.shapes.pos, st.shapes.quat, svel,
            0.015, 0.0, 0.1, 1 / 120)[0] * 1e-6 + x

    passes = [("frame 2x4", frame_one, st, 100),
              ("block build", block_build_one, p.pos, 200),
              ("contact sweep+AABB", sweep_one, p.pos, 200),
              ("shape contacts", shape_one, p.pos, 200)]
    if spec.cluster_mm is not None:
        passes.insert(3, ("cluster matmul", cluster_one, p.pos, 200))
    if spec.global_rest.shape[0] > 0:
        passes.insert(4, ("global cluster", global_one, p.pos, 200))
    import os
    scale = float(os.environ.get("ADAPTIGRAPH_PROF_REPS_SCALE", "1"))
    envs = tuple(int(e) for e in os.environ.get(
        "ADAPTIGRAPH_PROF_ENVS", "1,2,4,8").split(","))
    passes = [(nm, fn, x0, max(2, int(r * scale))) for nm, fn, x0, r in passes]
    base = {}
    for n_env in envs:
        for name, fn, x0, reps in passes:
            xb = jax.tree.map(
                lambda a: jnp.tile(a[None], (n_env,) + (1,) * a.ndim), x0)
            t = scan_time(f"E={n_env} {name}", jax.vmap(fn), xb, reps=reps)
            if n_env == 1:
                base[name] = t
            elif name in base:
                print(f"    scale vs E=1: {t / base[name]:.2f}x "
                      f"(linear would be {n_env}.0x)", flush=True)


if __name__ == "__main__" and "--batch" in sys.argv:
    batch_scaling()
    sys.exit(0)

if __name__ == "__main__" and "--tiles" in sys.argv:
    tile_probe()
    sys.exit(0)
