"""Batched multi-env episode generation: vmap over environments.

The reference fans episode generation out over OS processes
(mp.Pool(n_worker), src/sim/data_gen/data_gen.py:142-158) — one CUDA
context each. On TPU the engine step is a pure function of (state, spec),
so B episodes run in lockstep as ONE vmapped program: scenes are built
host-side per seed (same material -> same pytree shapes), stacked, and the
whole chunk scan vmaps over the leading env axis. One chip simulates the
whole worker pool's load per dispatch; across hosts, split the seed range.

Batched episodes keep SINGLE-ENV SEMANTICS: each env's push is planned by
`SimEnv.plan_push` (same waypoints, gripper gap/attach schedule, IK-tracked
arm links), the vmapped scan body is the same one the single env runs,
captures use the same contact-gated cadence (`SimEnv._capture_push`), and
invalid pushes retry per env (up to 10 like data_gen.py:86-94) with the
other envs holding a parked no-op — the same "state keeps settling between
attempts" behavior the reference's sequential retry produces. The validity
gate itself uses the reference's rendered color-difference rule.

Usage:
  python -m adaptigraph_tpu.sim.batch_env --config data_gen/rope \
      --n-episode 8 --batch 4 --out data/sim_data
"""

from __future__ import annotations

import argparse
import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from adaptigraph_tpu.engine import xpbd_step
from adaptigraph_tpu.sim.env import CHUNK, SimEnv
from adaptigraph_tpu.sim.episode_io import save_property_params, store_data
from adaptigraph_tpu.utils import load_config

MAX_RETRY = 10  # data_gen.py:86-94


class BatchSimEnv:
    """B SimEnv instances advanced in lockstep by vmapped chunk scans."""

    def __init__(self, config, batch: int):
        self.batch = batch
        self.envs = [SimEnv(config) for _ in range(batch)]
        for e in self.envs:
            # vmapped settle/push stacks env states: per-scene capacity
            # bucketing would give ragged shapes across the batch
            e.bucket_caps = False
        self._vmapped = None

    def reset(self, seeds):
        for env, seed in zip(self.envs, seeds):
            env.reset(seed=int(seed), save_data=False, settle=False)
        e0 = self.envs[0]
        self.substeps, self.iterations = e0.substeps, e0.iterations
        self._align_incidence()
        self._align_cluster_mm()
        self.states = jax.tree.map(lambda *x: jnp.stack(x),
                                   *[e.state for e in self.envs])
        self.specs = jax.tree.map(lambda *x: jnp.stack(x),
                                  *[e.spec for e in self.envs])
        if self._vmapped is None:
            self._compile()
        # settle every env in ONE vmapped program (the single env settles
        # per reset, flex_env.py:246-247): a parked no-op push covers
        # exactly ceil(settle_steps / CHUNK) chunks
        self.run_pushes([None] * self.batch)
        for env in self.envs:
            env.finish_reset(save_data=False)

    def _align_incidence(self):
        """Incidence tables are degree-sized per scene (max constraint
        overlap varies with the sampled physics); rebuild every env's tables
        at the batch-wide max degree so specs stack into one vmapped
        pytree."""
        from adaptigraph_tpu.engine.state import (
            build_cluster_incidence, build_spring_incidence)

        specs = [e.spec for e in self.envs]
        d_c = max((s.cluster_inc.idx.shape[1] for s in specs
                   if s.cluster_inc is not None), default=0)
        d_s = max((s.spring_inc.idx.shape[1] for s in specs
                   if s.spring_inc is not None), default=0)
        for env in self.envs:
            s = env.spec
            n = s.rest_pos.shape[0]
            if s.cluster_inc is not None and s.cluster_inc.idx.shape[1] != d_c:
                s = s._replace(cluster_inc=build_cluster_incidence(
                    s.clusters, n, d_max=d_c))
            if s.spring_inc is not None and s.spring_inc.idx.shape[1] != d_s:
                s = s._replace(spring_inc=build_spring_incidence(
                    s.springs, n, d_max=d_s))
            env.spec = s

    def _align_cluster_mm(self):
        """Membership-matrix passes are trimmed per scene to the valid-row
        prefix (state.trim_cluster_matmul); re-pad every env's to the
        batch-wide max width so specs stack into one vmapped pytree (inert
        zero rows — exact)."""
        from adaptigraph_tpu.engine.state import pad_cluster_matmul

        widths = [e.spec.cluster_mm.matrix.shape[0] for e in self.envs
                  if e.spec.cluster_mm is not None]
        if not widths:
            return
        ct = max(widths)
        for env in self.envs:
            if (env.spec.cluster_mm is not None
                    and env.spec.cluster_mm.matrix.shape[0] != ct):
                env.spec = env.spec._replace(
                    cluster_mm=pad_cluster_matmul(env.spec.cluster_mm, ct))

    def _compile(self):
        e0 = self.envs[0]
        substeps, iterations = self.substeps, self.iterations
        rest_filter = e0.rest_filter
        tool_slot0, n_tool = e0.tool_slot0, e0.n_tool
        arm_slot0, n_arm = e0.arm_slot0, e0.n_arm

        def one_step(st, inp, spec, attach_idx, attach_rel, has_attach,
                     tables0):
            # identical body to SimEnv._compile_push's one_step
            eef, rot, gap, att_on, lp, lq = inp
            tp, tq = e0._tool_pose_arrays(eef, rot, gap)
            new_pos = st.shapes.pos.at[tool_slot0: tool_slot0 + n_tool].set(tp)
            new_quat = st.shapes.quat.at[tool_slot0: tool_slot0 + n_tool].set(tq)
            if n_arm:
                new_pos = new_pos.at[arm_slot0: arm_slot0 + n_arm].set(lp)
                new_quat = new_quat.at[arm_slot0: arm_slot0 + n_arm].set(lq)
            st = st._replace(shapes=st.shapes.moved_to(new_pos, new_quat))
            if has_attach:
                p = st.particles
                on = att_on > 0
                apos = eef[None, :] + (rot @ attach_rel.T).T
                cur = p.pos[attach_idx]
                tgt = jnp.where(on, apos, cur)
                pos2 = p.pos.at[attach_idx].set(tgt)
                w2 = p.inv_mass.at[attach_idx].set(
                    jnp.where(on, 0.0, p.inv_mass[attach_idx]))
                st = st._replace(particles=p._replace(pos=pos2, inv_mass=w2))
            st = xpbd_step(st, spec, substeps, iterations,
                           rest_filter=rest_filter,
                           n_shapes_active=e0.n_shapes_fused,
                           packed_tables=tables0)
            return st, None

        def make_run_group(has_attach: bool):
            def run_group(state, spec, eefs, rots, gaps, atts, lps, lqs,
                          attach_idx, attach_rel):
                tables0 = None
                if not has_attach:
                    # mode/tile thresholds live in solver.pack_tables_for —
                    # one source of truth with xpbd_step (ADVICE r4 #3)
                    from adaptigraph_tpu.engine.solver import pack_tables_for
                    tables0 = pack_tables_for(state.particles, spec)

                def one_chunk(st, inp):
                    st, _ = jax.lax.scan(
                        lambda s, i: one_step(s, i, spec, attach_idx,
                                              attach_rel, has_attach, tables0),
                        st, inp)
                    return st, st.particles.pos

                st, rec = jax.lax.scan(one_chunk, state,
                                       (eefs, rots, gaps, atts, lps, lqs))
                p = st.particles.pos
                bad = (jnp.isnan(p[:, 0]).any()
                       | (jnp.abs(jnp.where(st.particles.active[:, None],
                                            p, 0.0)).max() > 1e3)
                       | (jnp.asarray(st.contact_overflow, jnp.int32)
                          > jnp.asarray(state.contact_overflow, jnp.int32)))
                return st, rec, bad

            return run_group

        self._vmapped = {True: jax.jit(jax.vmap(make_run_group(True))),
                         False: jax.jit(jax.vmap(make_run_group(False)))}

    def run_pushes(self, actions, group: int | None = None):
        """Execute one push per env (lockstep). actions: (B, 4) in the action
        frame; None entries hold the env still (parked no-op). Returns
        (pos_rec (B, C, N, 3), plans, nan_flags (B,)). Chunk-group size
        defaults to the material's SimEnv.chunk_group (cloth runs 200 solver
        iterations/frame — an 8-chunk x B-env program crashed the remote
        worker)."""
        b = self.batch
        e0 = self.envs[0]
        group = group or max(1, e0.chunk_group)
        plans = []
        for env, act in zip(self.envs, actions):
            if act is None:
                # parked no-op: tool far above the workspace, zero contact
                plan = env.plan_push(np.array([3.9, 3.9, 3.95, 3.95]))
                plan["eef"] = plan["eef"] + np.array([0, 19.0, 0], np.float32)
                # a parked env must not grasp anything
                plan["attach_active"] = np.zeros_like(plan["attach_active"])
                plan["gap"] = np.full_like(plan["gap"], 0.4)
                if plan["link_pos"] is not None:
                    plan["link_pos"] = np.tile(env._rest_link_pos[None],
                                               (len(plan["eef"]), 1, 1))
                    plan["link_quat"] = np.tile(env._rest_link_quat[None],
                                                (len(plan["eef"]), 1, 1))
                plan["t_push"] = 0
                plans.append(plan)
            else:
                plans.append(env.plan_push(act))
        n_active = min(max(-(-(p["t_push"] + e0.settle_steps) // CHUNK)
                           for p in plans), e0.max_chunks)
        total = n_active * CHUNK
        n_arm = e0.n_arm

        def stack(key, shape_tail):
            out = []
            for p in plans:
                a = p[key]
                if a is None:
                    a = np.zeros((total,) + shape_tail, np.float32)
                out.append(a[:total])
            return np.stack(out)

        eefs = stack("eef", (3,)).reshape(b, n_active, CHUNK, 3)
        rots = stack("rot", (3, 3)).reshape(b, n_active, CHUNK, 3, 3)
        gaps = stack("gap", ()).reshape(b, n_active, CHUNK)
        atts = stack("attach_active", ()).reshape(b, n_active, CHUNK)
        lps = stack("link_pos", (n_arm, 3)).reshape(b, n_active, CHUNK, n_arm, 3)
        lqs = stack("link_quat", (n_arm, 4)).reshape(b, n_active, CHUNK, n_arm, 4)
        aidx = np.stack([p["attach_idx"] for p in plans])
        arel = np.stack([p["attach_rel"] for p in plans])

        recs = []
        nan_any = np.zeros(b, bool)
        # static host-side fact: only grasp pushes mutate inv_mass mid-scan
        has_attach = bool(atts.any())
        for lo in range(0, n_active, group):
            hi = min(lo + group, n_active)
            self.states, rec, nan = self._vmapped[has_attach](
                self.states, self.specs, jnp.array(eefs[:, lo:hi]),
                jnp.array(rots[:, lo:hi]), jnp.array(gaps[:, lo:hi]),
                jnp.array(atts[:, lo:hi]), jnp.array(lps[:, lo:hi]),
                jnp.array(lqs[:, lo:hi]), jnp.array(aidx), jnp.array(arel))
            recs.append(np.asarray(rec))
            nan_any |= np.asarray(nan)
        pos_rec = np.concatenate(recs, axis=1)  # (B, n_active, N, 3)

        # per-env bookkeeping mirroring SimEnv._push_fn + gripper restore
        for i, env in enumerate(self.envs):
            env.state = jax.tree.map(lambda x: x[i], self.states)
            # commit IK state only for pushes that actually executed (a
            # parked no-op overrides link poses to the rest pose, so its
            # planned q never happens in the sim)
            if actions[i] is not None and plans[i].get("q_final") is not None:
                env._q_cur = plans[i]["q_final"]
            if env.gripper and actions[i] is not None:
                w = env.state.particles.inv_mass.at[jnp.array(aidx[i])].set(
                    jnp.array(env._inv_mass0[aidx[i]]))
                env.state = env.state._replace(
                    particles=env.state.particles._replace(inv_mass=w))
            env._gap_rec = gaps[i, :, -1]
            env._link_rec = (lps[i, :, -1], lqs[i, :, -1])
            env._pad_recs = (eefs[i, :, -1], rots[i, :, -1])
        return pos_rec, plans, nan_any

    GATE_RES = 180  # validity-gate render resolution (mean-diff threshold
    #                 is resolution-robust; full-res gating at B envs OOMs)
    GATE_GROUP = 4  # envs per gate-render device program

    def render_all(self):
        """One capture-view frame per env for the color-diff validity gate,
        rendered GATE_GROUP envs per device program at GATE_RES (per-env
        full-res dispatches at tunnel latency would dominate)."""
        from adaptigraph_tpu.sim.env import _fwd_from_angle
        from adaptigraph_tpu.sim.render import render_frames_batch

        e0 = self.envs[0]
        res = self.GATE_RES
        scale = res / float(e0.screen[1])
        intr = np.asarray(e0.camera.intrinsics(), np.float32) * scale
        cam_pos, ang = e0.camera.single_view(e0.camera_view)
        fwd = _fwd_from_angle(ang)
        shapes0 = jax.tree.map(lambda x: x[0], self.states.shapes)
        out = []
        for lo in range(0, self.batch, self.GATE_GROUP):
            hi = min(lo + self.GATE_GROUP, self.batch)
            imgs = render_frames_batch(
                self.states.particles.pos[lo:hi], jnp.asarray(e0.colors),
                self.states.particles.active[lo:hi], shapes0,
                self.states.shapes.pos[lo:hi], self.states.shapes.quat[lo:hi],
                jnp.asarray(np.asarray(cam_pos, np.float32))[None],
                jnp.asarray(fwd)[None], jnp.asarray(intr),
                width=res, height=res, cloth_dims=e0._cloth_dims)
            out.append(np.asarray(imgs)[:, 0])
        return np.concatenate(out)

    def capture(self, i, pos_rec, plans, data):
        """Contact-gated capture for env i — the same cadence rule as the
        single env (SimEnv._capture_push at n_active-chunk scale)."""
        env = self.envs[i]
        eef_rec, rot_rec = env._pad_recs
        n_c = pos_rec.shape[1]
        pads = env.max_chunks - n_c
        pr = np.concatenate([pos_rec[i], np.repeat(pos_rec[i, -1:], pads, 0)]) \
            if pads else pos_rec[i]
        er = np.concatenate([eef_rec, np.repeat(eef_rec[-1:], pads, 0)]) \
            if pads else eef_rec
        rr = np.concatenate([rot_rec, np.repeat(rot_rec[-1:], pads, 0)]) \
            if pads else rot_rec
        env._gap_rec = np.concatenate(
            [env._gap_rec, np.repeat(env._gap_rec[-1:], pads, 0)]) \
            if pads else env._gap_rec
        lp, lq = env._link_rec
        if pads:
            env._link_rec = (np.concatenate([lp, np.repeat(lp[-1:], pads, 0)]),
                             np.concatenate([lq, np.repeat(lq[-1:], pads, 0)]))
        env._capture_push(data, pr, er, rr, plans[i]["t_push"])


def color_diff_valid(env, img_before, img_after, thresh=0.01):
    """The reference's action-validity gate: mean image change across the
    capture view (data_gen.py:86-94's color_diff rule). The reference
    thresholds mean |diff| of 0-255 pyflex images at color_threshold=0.01
    (config data_gen/*.yaml:38); our renderer emits RGB in [0,1], so
    quantize to the uint8 scale before comparing."""
    a = (np.clip(img_after[..., :3], 0.0, 1.0) * 255).astype(np.uint8)
    b = (np.clip(img_before[..., :3], 0.0, 1.0) * 255).astype(np.uint8)
    d = np.abs(a.astype(np.float32) - b.astype(np.float32))
    return float(d.mean()) > thresh


def generate_batch(config, seeds, out_dir, n_timestep=None):
    """Generate len(seeds) episodes in lockstep batches with per-env retry."""
    d = config["dataset"]
    obj = d["obj"]
    n_timestep = n_timestep or int(d["n_timestep"])
    benv = BatchSimEnv(config, batch=len(seeds))
    benv.reset(seeds)
    t0 = time.time()
    all_data = [([], [], []) for _ in seeds]
    grasp_state = [None] * len(seeds)  # cloth boundary bookkeeping
    for i, env in enumerate(benv.envs):
        epi_dir = os.path.join(out_dir, obj, f"{int(seeds[i]):06}")
        os.makedirs(epi_dir, exist_ok=True)
        save_property_params(epi_dir, env.get_property_params())
        env._store(all_data[i], store_tool_pose=env._parked_tool_pose())
        store_data(os.path.join(epi_dir, "00.h5"), all_data[i], np.zeros(4))
    cam_dir = os.path.join(out_dir, obj, "cameras")
    os.makedirs(cam_dir, exist_ok=True)
    np.save(os.path.join(cam_dir, "intrinsic.npy"), benv.envs[0].cam_intrinsic_params)
    np.save(os.path.join(cam_dir, "extrinsic.npy"), benv.envs[0].cam_extrinsic_matrix)

    def sample(i):
        env = benv.envs[i]
        if obj == "cloth":
            init = grasp_state[i] is None
            bp, bd = (None, None) if init else grasp_state[i]
            act, bp, bd = env.sample_grasp_actions_corner(init, bp, bd)
            grasp_state[i] = (bp, bd)
            return act
        return env.sample_action()

    thresh = float(d.get("color_threshold", 0.01))
    # an env that exhausts MAX_RETRY is stuck for the REST of the episode
    # (the reference breaks the episode on stuck, data_gen.py:88-106) —
    # otherwise a skipped timestep leaves a gap in the contiguous
    # 01..NN.h5 numbering that preprocess walks
    stuck = [False] * len(seeds)
    for t in range(n_timestep):
        pending = [i for i in range(len(seeds)) if not stuck[i]]
        if not pending:
            print(f"push {t + 1}/{n_timestep}: all envs stuck, stopping",
                  flush=True)
            break
        stored = [False] * len(seeds)
        before = benv.render_all()
        for attempt in range(MAX_RETRY):
            if not pending:
                break
            actions = [sample(i) if i in pending else None
                       for i in range(len(seeds))]
            pos_rec, plans, nan_any = benv.run_pushes(actions)
            after_all = benv.render_all()
            next_pending = []
            for i in pending:
                if actions[i] is None or nan_any[i]:
                    next_pending.append(i)
                    continue
                if not color_diff_valid(benv.envs[i], before[i], after_all[i],
                                        thresh=thresh):
                    next_pending.append(i)  # retry with a fresh action
                    continue
                data = ([], [], [])
                benv.envs[i]._eef_prev = None
                benv.capture(i, pos_rec, plans, data)
                epi_dir = os.path.join(out_dir, obj, f"{int(seeds[i]):06}")
                store_data(os.path.join(epi_dir, f"{t + 1:02}.h5"), data,
                           actions[i])
                stored[i] = True
            pending = next_pending
        for i in pending:
            stuck[i] = True
            print(f"episode {int(seeds[i])} stuck at timestep {t} "
                  f"(no valid push after {MAX_RETRY} attempts)", flush=True)
        print(f"push {t + 1}/{n_timestep}: {sum(stored)}/{len(seeds)} valid "
              f"({time.time() - t0:.0f}s)", flush=True)
    return benv


def main():
    from adaptigraph_tpu.utils import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default="data_gen/rope")
    ap.add_argument("--n-episode", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--base", type=int, default=0)
    ap.add_argument("--out", type=str, default="data/sim_data")
    ap.add_argument("--screen", type=int, default=0,
                    help="override screenWidth/Height (0 = keep config)")
    ap.add_argument("--seeds", type=str, default="",
                    help="comma-separated explicit episode seeds (overrides "
                         "--base/--n-episode; batched in --batch groups). "
                         "Lets a campaign batch non-contiguous seeds chosen "
                         "by particle bucket (small buckets run ~5-10x "
                         "faster and equal-bucket seeds share one compile)")
    args = ap.parse_args()
    config = load_config(args.config)
    if args.screen:
        config["dataset"]["screenWidth"] = args.screen
        config["dataset"]["screenHeight"] = args.screen
    if args.seeds:
        seed_list = [int(s) for s in args.seeds.split(",") if s.strip()]
        groups = [seed_list[i:i + args.batch]
                  for i in range(0, len(seed_list), args.batch)]
    else:
        groups = [list(range(lo, min(lo + args.batch,
                                     args.base + args.n_episode)))
                  for lo in range(args.base, args.base + args.n_episode,
                                  args.batch)]
    for seeds in groups:
        try:
            generate_batch(config, seeds, args.out)
        except Exception as e:  # e.g. remote TPU worker crash/restart —
            # skip the batch, give the worker time to come back, continue
            # the campaign (episodes are independent; settle-only dirs are
            # skipped by preprocess)
            import traceback

            traceback.print_exc()
            print(f"batch {seeds} failed ({e}); waiting for worker recovery",
                  flush=True)
            time.sleep(120)


if __name__ == "__main__":
    main()
