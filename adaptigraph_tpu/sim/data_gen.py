"""Episode generation driver.

Mirrors the reference data_gen flow (src/sim/data_gen/data_gen.py): per
episode — seed with the episode index (:27), reset, up to n_timestep pushes
each retried <=10x until the rendered image changes by color_threshold
(:64-105), h5 per push + property_params.pkl + camera params for the base
episode (:43-57).

Parallelism: instead of mp.Pool OS processes (:142-158) episodes run
sequentially per host process here (the engine itself is one fused device
program per push); scale-out across TPU hosts is a `--base/--n-episode`
range split, and multi-env vmap batching is the planned on-device fan-out.

Usage:
  python -m adaptigraph_tpu.sim.data_gen --config data_gen/rope --save \
      --base 0 --n-episode 5 [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from adaptigraph_tpu.sim.env import SimEnv
from adaptigraph_tpu.sim.episode_io import store_data, save_property_params
from adaptigraph_tpu.utils import load_config


_RESUME_FILE = "resume_state.npz"


def _save_resume_state(env: SimEnv, epi_dir: str, t_next: int):
    """Checkpoint the full dynamic scene state after a stored push so a
    killed process (remote-worker hang + watchdog) resumes the episode at
    push granularity instead of regenerating it from settle. ~1 MB/scene."""
    st = env.state
    extra = {}
    if st.cluster_rest is not None:
        extra["cl_rest"] = np.asarray(st.cluster_rest)
    np.savez(os.path.join(epi_dir, _RESUME_FILE), t_next=t_next,
             pos=np.asarray(st.particles.pos), vel=np.asarray(st.particles.vel),
             inv_mass=np.asarray(st.particles.inv_mass),
             s_pos=np.asarray(st.shapes.pos), s_quat=np.asarray(st.shapes.quat),
             s_ppos=np.asarray(st.shapes.prev_pos),
             s_pquat=np.asarray(st.shapes.prev_quat),
             cl_rot=np.asarray(st.cluster_rot), gl_rot=np.asarray(st.global_rot),
             sampled_idx=np.asarray(env.sampled_idx), **extra)


def _load_resume_state(env: SimEnv, epi_dir: str) -> int:
    """Restore a `_save_resume_state` checkpoint into a freshly-reset env
    (same seed => same scene build). Returns the next push index."""
    z = np.load(os.path.join(epi_dir, _RESUME_FILE))
    st = env.state
    if z["pos"].shape != tuple(st.particles.pos.shape):
        # checkpoint written under different capacity caps (e.g. before
        # per-scene bucketing) — unusable; restart the episode from settle
        return 0
    p = st.particles._replace(pos=np.asarray(z["pos"]),
                              vel=np.asarray(z["vel"]),
                              inv_mass=np.asarray(z["inv_mass"]))
    sh = st.shapes._replace(pos=np.asarray(z["s_pos"]),
                            quat=np.asarray(z["s_quat"]),
                            prev_pos=np.asarray(z["s_ppos"]),
                            prev_quat=np.asarray(z["s_pquat"]))
    env.state = st._replace(particles=p, shapes=sh,
                            cluster_rot=np.asarray(z["cl_rot"]),
                            global_rot=np.asarray(z["gl_rot"]),
                            cluster_rest=(np.asarray(z["cl_rest"])
                                          if "cl_rest" in z else None))
    env.sampled_idx = np.asarray(z["sampled_idx"])
    env._eef_prev = None
    return int(z["t_next"])


def gen_episode(config, idx_episode: int, save_data: bool, data_dir: str,
                env: SimEnv | None = None, resume: bool = False):
    t0 = time.time()
    d = config["dataset"]
    obj = d["obj"]
    n_timestep = int(d["n_timestep"])
    color_threshold = float(d.get("color_threshold", 0.01))

    epi_dir = os.path.join(data_dir, obj, f"{idx_episode:06}")
    if save_data:
        os.makedirs(epi_dir, exist_ok=True)

    env = env or SimEnv(config)
    t_start = 0
    resumable = (resume and save_data
                 and os.path.exists(os.path.join(epi_dir, _RESUME_FILE))
                 and os.path.exists(os.path.join(epi_dir, "00.h5")))
    if resumable:
        # rebuild the scene (same seed), skip the settle sim, restore the
        # checkpointed post-push state
        env.reset(seed=idx_episode, save_data=False, settle=False)
        env.finish_reset(save_data=False)
        t_start = _load_resume_state(env, epi_dir)
        props = env.get_property_params()
        print(f"Episode {idx_episode} RESUME at push {t_start}", flush=True)
        data = None
    else:
        data = env.reset(seed=idx_episode, save_data=save_data)
        props = env.get_property_params()
    print(f"Episode {idx_episode} physics params: {props}")

    actions = np.zeros((n_timestep, 4))
    if save_data and not resumable:
        store_data(os.path.join(epi_dir, f"{0:02}.h5"), data, actions[0])
        save_property_params(epi_dir, props)
        if idx_episode == int(d.get("base", 0)):
            cam_dir = os.path.join(data_dir, obj, "cameras")
            os.makedirs(cam_dir, exist_ok=True)
            np.save(os.path.join(cam_dir, "intrinsic.npy"), env.cam_intrinsic_params)
            np.save(os.path.join(cam_dir, "extrinsic.npy"), env.cam_extrinsic_matrix)

    img = env.render()
    last_img = img.copy()
    stuck = False
    boundary_points = boundary = None
    for t in range(t_start, n_timestep):
        data = ([], [], [])
        for k in range(10):
            if obj == "cloth":
                if t == 0 and k == 0:
                    u, boundary_points, boundary = env.sample_action(init=True)
                else:
                    u, boundary_points, boundary = env.sample_action(
                        boundary_points=boundary_points, boundary=boundary)
            else:
                u = env.sample_action()
            if u is None:
                stuck = True
                print(f"Episode {idx_episode} timestep {t}: no valid action found")
                break
            out = env.step(u, save_data, data)
            if out is None:  # NaN explosion guard (flex_env.py:379-381)
                stuck = True
                break
            img, data = out
            color_diff = float(np.mean(np.abs(img[..., :3] - last_img[..., :3])))
            if color_diff < color_threshold:
                data = ([], [], [])
                if k == 9:
                    stuck = True
                    print(f"episode {idx_episode} stuck at timestep {t}")
            else:
                break
        if stuck:
            break
        actions[t] = u
        last_img = img.copy()
        if save_data:
            store_data(os.path.join(epi_dir, f"{t + 1:02}.h5"), data, actions[t])
            _save_resume_state(env, epi_dir, t + 1)
            print(f"episode {idx_episode} timestep {t} done "
                  f"({len(data[1])} captured frames)", flush=True)
    print(f"Episode {idx_episode} time: {time.time() - t0:.1f}s", flush=True)
    return env


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default="data_gen/rope")
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--base", type=int, default=None)
    ap.add_argument("--n-episode", type=int, default=None)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    config = load_config(args.config)
    d = config["dataset"]
    base = args.base if args.base is not None else int(d.get("base", 0))
    n_episode = args.n_episode if args.n_episode is not None else int(d["n_episode"])
    data_dir = args.out or d["folder"]
    os.makedirs(data_dir, exist_ok=True)

    env = None
    for epi in range(base, base + n_episode):
        env = gen_episode(config, epi, args.save, data_dir, env=env)


if __name__ == "__main__":
    main()
