"""Batched multi-env episode generation: vmap over environments.

The reference fans episode generation out over OS processes
(mp.Pool(n_worker), src/sim/data_gen/data_gen.py:142-158) — one CUDA
context each. On TPU the engine step is a pure function of (state, spec),
so B episodes run in lockstep as ONE vmapped program: scenes are built
host-side per seed (same material -> same pytree shapes), stacked, and the
whole chunk scan vmaps over the leading env axis. One chip simulates the
whole worker pool's load per dispatch; across hosts, split the seed range.

Differences from the single-env driver, by design:
  * the action-validity gate uses particle displacement (the direct signal)
    instead of the rendered color difference (its proxy, data_gen.py:86-94),
    so validity needs no renders; invalid pushes are skipped per-env rather
    than retried in lockstep;
  * captures land on CHUNK boundaries exactly like SimEnv.

Usage:
  python -m adaptigraph_tpu.sim.batch_env --config data_gen/rope \
      --n-episode 8 --batch 4 --out data/sim_data
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from adaptigraph_tpu.engine import xpbd_step
from adaptigraph_tpu.sim.env import CHUNK, SimEnv
from adaptigraph_tpu.sim.episode_io import save_property_params, store_data
from adaptigraph_tpu.utils import load_config


class BatchSimEnv:
    """B SimEnv instances advanced in lockstep by vmapped chunk scans."""

    def __init__(self, config, batch: int):
        self.batch = batch
        self.envs = [SimEnv(config) for _ in range(batch)]
        self._vmapped = None

    def reset(self, seeds):
        for env, seed in zip(self.envs, seeds):
            env.reset(seed=int(seed), save_data=False)
        e0 = self.envs[0]
        self.substeps, self.iterations = e0.substeps, e0.iterations
        self.states = jax.tree.map(lambda *x: jnp.stack(x),
                                   *[e.state for e in self.envs])
        self.specs = jax.tree.map(lambda *x: jnp.stack(x),
                                  *[e.spec for e in self.envs])
        if self._vmapped is None:
            self._compile()

    def _compile(self):
        e0 = self.envs[0]
        substeps, iterations = self.substeps, self.iterations
        tool_slot0, n_tool = e0.tool_slot0, e0.n_tool

        def one_step(st, inp, spec):
            eef, rot = inp
            tp, tq = e0._tool_pose_arrays(eef, rot, jnp.float32(0.4))
            new_pos = st.shapes.pos.at[tool_slot0: tool_slot0 + n_tool].set(tp)
            new_quat = st.shapes.quat.at[tool_slot0: tool_slot0 + n_tool].set(tq)
            st = st._replace(shapes=st.shapes.moved_to(new_pos, new_quat))
            st = xpbd_step(st, spec, substeps, iterations)
            return st, None

        def run_group(state, spec, eefs, rots):
            def one_chunk(st, inp):
                st, _ = jax.lax.scan(lambda s, i: one_step(s, i, spec), st, inp)
                return st, st.particles.pos

            st, rec = jax.lax.scan(one_chunk, state, (eefs, rots))
            return st, rec

        self._vmapped = jax.jit(jax.vmap(run_group, in_axes=(0, 0, 0, 0)))

    def run_pushes(self, actions, group: int = 8):
        """Execute one push per env (lockstep). actions: (B, 4) in the action
        frame; None entries hold the env still. Returns per-env chunk-boundary
        particle records + eef poses."""
        b = self.batch
        e0 = self.envs[0]
        trajs, rots, n_chunks = [], [], []
        for env, act in zip(self.envs, actions):
            if act is None:
                act = np.array([3.9, 3.9, 3.95, 3.95])  # far corner no-op
            eef_flex, rot_traj, t_push = _build_traj(env, act)
            trajs.append(eef_flex)
            rots.append(rot_traj)
            n_chunks.append(-(-(t_push + env.settle_steps) // CHUNK))
        n_active = min(max(n_chunks), e0.max_chunks)
        total = n_active * CHUNK
        eefs = np.stack([_pad_traj(t, total) for t in trajs])
        rotm = np.stack([_pad_traj(r, total) for r in rots])
        eefs = eefs.reshape(b, n_active, CHUNK, 3)
        rotm = rotm.reshape(b, n_active, CHUNK, 3, 3)

        recs = []
        for lo in range(0, n_active, group):
            hi = min(lo + group, n_active)
            self.states, rec = self._vmapped(
                self.states, self.specs, jnp.array(eefs[:, lo:hi]),
                jnp.array(rotm[:, lo:hi]))
            recs.append(np.asarray(rec))
        pos_rec = np.concatenate(recs, axis=1)  # (B, n_active, N, 3)
        eef_rec = eefs[:, :, -1]
        rot_rec = rotm[:, :, -1]
        # push states back into the per-env objects
        for i, env in enumerate(self.envs):
            env.state = jax.tree.map(lambda x: x[i], self.states)
        return pos_rec, eef_rec, rot_rec


def _build_traj(env: SimEnv, action):
    """Waypoint-interpolated eef trajectory for one push (SimEnv.step logic)."""
    h = env.wkspace_height + env.stick_len
    s = np.array([action[0], action[1], h])
    e = np.array([action[2], action[3], h])
    d = s[:2] - e[:2]
    pusher_angle = np.pi / 2 if d[0] == 0 else np.arctan(d[1] / d[0])
    wps = [s + [0, 0, 0.2], s, e, e + [0, 0, 0.2]]
    pts = []
    for i_p in range(len(wps) - 1):
        a, b = wps[i_p], wps[i_p + 1]
        steps = int(np.linalg.norm(b - a) / env.speed) + 1
        for i in range(steps):
            pts.append(a + (b - a) * i / steps)
    traj = np.array(pts, np.float32)
    t_push = len(traj)
    eef_flex = np.stack([traj[:, 0], traj[:, 2], -traj[:, 1]], 1)
    from adaptigraph_tpu.sim.robot import pusher_orientation

    rot = np.asarray(pusher_orientation(jnp.float32(pusher_angle)))
    rot_traj = np.tile(rot[None], (t_push, 1, 1)).astype(np.float32)
    return eef_flex, rot_traj, t_push


def _pad_traj(t, total):
    if len(t) >= total:
        return t[:total]
    return np.concatenate([t, np.tile(t[-1:], (total - len(t),) + (1,) * (t.ndim - 1))])


def generate_batch(config, seeds, out_dir, n_timestep=None, render_every_capture=True):
    """Generate len(seeds) episodes in lockstep batches."""
    d = config["dataset"]
    obj = d["obj"]
    n_timestep = n_timestep or int(d["n_timestep"])
    benv = BatchSimEnv(config, batch=len(seeds))
    benv.reset(seeds)
    t0 = time.time()
    # per-env episode recorders
    all_data = [([], [], []) for _ in seeds]
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

    for t in range(n_timestep):
        actions = [env.sample_action() for env in benv.envs]
        pos_rec, eef_rec, rot_rec = benv.run_pushes(actions)
        for i, env in enumerate(benv.envs):
            if actions[i] is None:
                continue
            before = pos_rec[i, 0][: env.n_active]
            after = pos_rec[i, -1][: env.n_active]
            moved = np.linalg.norm(after - before, axis=1).max()
            if moved < 0.02:  # displacement validity gate
                continue
            data = ([], [], [])
            env._eef_prev = None
            n_c = pos_rec.shape[1]
            for ci in range(n_c):
                if (ci + 1) % max(1, env.contact_interval // CHUNK) == 0 or ci == n_c - 1:
                    env._store(data, particles=pos_rec[i, ci],
                               store_tool_pose=(jnp.array(eef_rec[i, ci]),
                                                jnp.array(rot_rec[i, ci])))
            epi_dir = os.path.join(out_dir, obj, f"{int(seeds[i]):06}")
            store_data(os.path.join(epi_dir, f"{t + 1:02}.h5"), data, actions[i])
        print(f"push {t + 1}/{n_timestep} done ({time.time() - t0:.0f}s)", flush=True)
    return benv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default="data_gen/rope")
    ap.add_argument("--n-episode", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--base", type=int, default=0)
    ap.add_argument("--out", type=str, default="data/sim_data")
    args = ap.parse_args()
    config = load_config(args.config)
    for lo in range(args.base, args.base + args.n_episode, args.batch):
        seeds = list(range(lo, min(lo + args.batch, args.base + args.n_episode)))
        generate_batch(config, seeds, args.out)


if __name__ == "__main__":
    main()
