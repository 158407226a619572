"""Closed-loop planning with online physics-parameter adaptation.

Port of the reference's planning app (src/planning/plan.py:62-339):
perceive -> MPPI over the full sampled-action population -> execute ->
re-perceive -> log the interaction -> refine the physics-parameter estimate.

Differences by design:
  * the environment is pluggable: `--env sim` closes the loop against the
    on-device particle engine (SimEnv) with perception running on rendered
    frames — the framework's hardware-free acceptance path; `--env real`
    plugs the real_world layer (xArm6 + RealSense) behind the same API.
  * the 20 000-sample population is ONE vmapped rollout per MPPI iteration
    (no 500-sample chunk loop; planner.py here vs plan.py:241-247).
  * --resume restarts from saved interaction_*.npz (plan.py:114-126).

Planning frame: x right, y up, z = negated flex-z (the action frame of
SimEnv.sample_action and the reference's real-world table frame x10).

Usage:
  python -m adaptigraph_tpu.planning.plan --task-config planning/rope \
      --env sim [--use-ppo] [--n-actions 10] [--n-sample 1024]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from adaptigraph_tpu.dynamics.dataset import DynDataset
from adaptigraph_tpu.dynamics.train import init_model, load_checkpoint
from adaptigraph_tpu.planning.actions import decode_action_single
from adaptigraph_tpu.ops import box_loss, chamfer as chamfer_loss
from adaptigraph_tpu.planning.costs import PENALTIES, chunked_cost
from adaptigraph_tpu.planning.forward_dynamics import make_batched_dynamics
from adaptigraph_tpu.planning.perception import PerceptionModule
from adaptigraph_tpu.planning.physics_optimizer import PhysicsParamOnlineOptimizer
from adaptigraph_tpu.planning.planner import Planner
from adaptigraph_tpu.utils import load_config


def _planner_mesh(n_sample):
    """1-D data mesh over all visible devices when the population divides
    evenly; None (single-program) otherwise."""
    n_dev = len(jax.devices())
    if n_dev > 1 and n_sample % n_dev == 0:
        from adaptigraph_tpu.parallel.mesh import make_mesh

        return make_mesh(n_dev)
    return None


def flex_to_plan(points):
    """World (flex) -> planning frame: negate z."""
    out = np.asarray(points).copy()
    out[..., 2] *= -1
    return out


class SimPlanEnv:
    """SimEnv wrapped behind the planning-environment interface
    (RealEnv.get_obs/step duals, real_env.py:127-240)."""

    units = "sim"  # get_obs depths are in sim units (see plan() scaling)

    def __init__(self, data_gen_config, seed=0):
        from adaptigraph_tpu.sim.env import SimEnv

        self.env = SimEnv(data_gen_config)
        self.env.reset(seed=seed)
        self.cam_intr = self.env.cam_intrinsic_params
        self.cam_extr = self.env.cam_extrinsic_matrix

    def get_obs(self):
        # Render the perception frames WITHOUT the tool/arm shapes: the
        # reference excludes them SEMANTICALLY (GroundingDINO+SAM prompted
        # with obj_list, perception.py:68-148); the sim double of that
        # ground-truth segmentation is to hide them from the observation
        # render — otherwise the depth segmenter keeps the arm/pusher points
        # (everything above the table) and the perceived state is
        # contaminated (r4: state_real y up to 2.2 vs rope at ~0.6, flat
        # 3.0-chamfer PPO landscape).
        env = self.env
        shapes = env.state.shapes
        far = jnp.asarray([1e3, -1e2, 1e3], dtype=shapes.pos.dtype)
        pos = shapes.pos.at[env.tool_slot0: env.tool_slot0 + env.n_tool].set(far)
        if getattr(env, "n_arm", 0):
            pos = pos.at[env.arm_slot0: env.arm_slot0 + env.n_arm].set(far)
        # the robot side-table is furniture the semantic segmenter would
        # also reject; its right face sits exactly on the workspace-crop
        # boundary (x = -wkspace_width) and leaks through. Slot recorded by
        # SimEnv._build_shapes, mirroring tool_slot0/arm_slot0 (ADVICE r4 #4)
        pos = pos.at[env.table_slot].set(far)
        shapes_obs = shapes._replace(pos=pos, prev_pos=pos)
        imgs = env._render_multiview(np.asarray(env.state.particles.pos),
                                     shapes=shapes_obs)
        colors = imgs[:, :, :, :3]
        depths = imgs[:, :, :, 4]
        return colors, depths

    def step(self, action4):
        return self.env.step(np.asarray(action4), save_data=False)


def plan(task_config, env, save_dir, use_ppo=False, n_actions=None, n_sample=None,
         n_update_iter=2, ckpt="best", resume=False, seed=0,
         reward_mode="target"):
    os.makedirs(save_dir, exist_ok=True)
    tc = task_config
    material = tc["material"]
    sim_real_ratio = float(tc["sim_real_ratio"])

    # model + checkpoint
    dyn_config = load_config(tc["config"])
    dataset = DynDataset(dyn_config["dataset_config"], dyn_config["material_config"],
                         "valid")
    model, params0 = init_model(dyn_config, dataset)
    ckpt_dir = os.path.join(dyn_config["train_config"]["out_dir"],
                            dyn_config["dataset_config"]["data_name"], "checkpoints")
    params = load_checkpoint(ckpt_dir, ckpt, params0)

    # env-native units: SimPlanEnv perceives in sim units, RealEnv in table
    # meters. Real states scale by sim_real_ratio before planning (the
    # reference's perception.py:335-337 conversion), and the perception
    # geometry params switch to meter scale (workspace = task bbox).
    units = getattr(env, "units", "sim")
    if units == "real":
        bb = np.asarray(tc["bbox"], np.float32).reshape(2, 3)  # rows: min, max
        ws = np.stack([np.minimum(bb[0], bb[1]), np.maximum(bb[0], bb[1])], axis=1)
        perception = PerceptionModule(
            tc, table_height=float(tc.get("table_height", 0.0)),
            voxel=0.002, workspace=ws)
        state_scale = sim_real_ratio
    else:
        perception = PerceptionModule(tc)
        state_scale = 1.0
    ppm = PhysicsParamOnlineOptimizer(tc, model, params, material, save_dir)
    rollout = make_batched_dynamics(model, tc)

    # reward: target box/pcd in planning-frame sim units; 'change' mode
    # (random_interact.py:26-55) maximizes chamfer from the CURRENT state,
    # threaded through the evaluator as the `target` argument so one jitted
    # program serves every action
    target_pcd = box_flat = None
    if reward_mode == "target":
        if tc["target_type"] == "box":
            box = np.asarray(tc["target"], np.float32).reshape(2, 2) * sim_real_ratio
            box_flat = jnp.asarray(box.reshape(2, 2), jnp.float32)
        else:
            target_pcd = jnp.asarray(np.load(tc["target"]) * sim_real_ratio,
                                     jnp.float32)
    penalty_fn = PENALTIES[tc["penalty_type"]]
    bbox = np.asarray(tc["bbox"], np.float32)
    bbox_plan = jnp.asarray(
        [[bbox[0] * sim_real_ratio, bbox[3] * sim_real_ratio],
         [bbox[2] * sim_real_ratio, bbox[5] * sim_real_ratio]])

    n_actions = n_actions or int(tc["n_actions"])
    n_sample = n_sample or int(tc["n_sample"])
    max_nobj = int(tc["max_nobj"])

    # population shards across all visible chips (one SPMD program replaces
    # the reference's sequential 500-sample chunks, plan.py:241-247); every
    # array the rollout/evaluate closures capture must live on the same mesh
    mesh = _planner_mesh(n_sample)

    def _rep(tree):
        """Replicate a pytree (or array) onto the planner mesh."""
        if mesh is None:
            return jax.tree.map(jnp.asarray, tree)
        from adaptigraph_tpu.parallel.mesh import replicate

        return replicate(tree, mesh)

    params = _rep(params)
    bbox_plan = _rep(bbox_plan)
    if target_pcd is not None:
        target_pcd = _rep(target_pcd)

    # ONE jitted reward evaluator for the whole run. The target (recorded
    # pcd for 'target'/pcd mode, the current state for 'change' mode) is an
    # ARGUMENT, not a closure capture, so every action reuses the same
    # compiled program; the sample axis is lax.map-chunked by n_sample_chunk
    # (a 20k-population pcd chamfer is an ~18 GB block otherwise — r5f
    # rope-acceptance compile OOM)
    n_chunk = int(tc.get("n_sample_chunk", 0) or 0)
    _tgt_type = tc.get("target_type")

    def _eval_core(state_seqs, act_seqs, state_pad, obj_mask, target, tmask):
        if reward_mode == "target" and _tgt_type == "box":
            def err(flat, mflat):
                return box_loss(flat, box_flat)
        elif reward_mode == "change":
            def err(flat, mflat):
                return -chamfer_loss(flat, target[None], x_mask=mflat,
                                     y_mask=tmask[None])
        else:
            def err(flat, mflat):
                return chamfer_loss(flat, target[None], x_mask=mflat)
        return chunked_cost(state_seqs, act_seqs, state_pad, err, penalty_fn,
                            bbox_plan, obj_mask=obj_mask, n_chunk=n_chunk)

    eval_jit = jax.jit(_eval_core)

    start_i = 0
    if resume:
        import glob

        start_i = len(glob.glob(os.path.join(save_dir, "interaction_*.npz")))

    key = jax.random.PRNGKey(seed)
    stats = []
    for i in range(start_i, n_actions):
        colors, depths, intrs, extrs = _observe(env)
        state_cur_raw, _ = perception.get_state_cur(colors, depths, intrs, extrs)
        state_cur = flex_to_plan(state_cur_raw * state_scale)
        nobj = min(len(state_cur), max_nobj)
        state_pad = np.zeros((max_nobj, 3), np.float32)
        state_pad[:nobj] = state_cur[:nobj]
        obj_mask = np.zeros(max_nobj, bool)
        obj_mask[:nobj] = True

        phys = _rep(ppm.physics_param[material])

        state_pad_d = _rep(state_pad)
        obj_mask_d = _rep(obj_mask)
        if reward_mode == "change":
            # exploration objective: maximize chamfer from the CURRENT
            # state (random_interact.py:26-55)
            target_d, tmask_d = state_pad_d, obj_mask_d
        elif _tgt_type == "pcd":
            target_d, tmask_d = target_pcd, None
        else:  # box target reads box_flat inside _eval_core; dummy arg
            target_d, tmask_d = state_pad_d, None

        def model_rollout(sc, act_seqs):
            return rollout(params, state_pad_d, obj_mask_d, act_seqs, phys)

        def evaluate(state_seqs, act_seqs, state_cur=None, **kw):
            return eval_jit(state_seqs, act_seqs, state_pad_d, obj_mask_d,
                            target_d, tmask_d)

        planner = Planner({
            "action_dim": 4,
            "model_rollout_fn": model_rollout,
            "evaluate_traj_fn": evaluate,
            "n_sample": n_sample,
            "n_look_ahead": int(tc["n_look_ahead"]),
            "n_update_iter": n_update_iter,
            "reward_weight": float(tc["reward_weight"]),
            "action_lower_lim": np.asarray(tc["action_lower_lim"], np.float32),
            "action_upper_lim": np.asarray(tc["action_upper_lim"], np.float32),
            "planner_type": "MPPI",
            "noise_level": float(tc["noise_level"]),
            "push_length": float(tc["push_length"]),
            "mesh": mesh,
        })
        key, sub = jax.random.split(key)
        init_act = jnp.tile(
            jnp.asarray([[-1.0, 0.0, 0.0, float(tc["action_lower_lim"][3])]],
                        jnp.float32), (int(tc["n_look_ahead"]), 1))
        res = planner.trajectory_optimization(state_pad_d, init_act, key=sub)
        act = np.asarray(res["act_seq"][0])
        state_pred = np.asarray(res["best_model_output"]["state_seqs"][0, -1])
        reward = float(res["best_eval_output"]["reward_seqs"][0])
        # the reward self-normalizes per population (error_weight = 2/max),
        # so on the bsz=1 best-action re-eval it is pinned at ~-2.0 and
        # carries no signal (r4 stats.txt all -2.0); the PREDICTED final
        # error is the cross-action-comparable quantity — log it
        err_pred = float(res["best_eval_output"]["error_seqs"][0])
        print(f"action {i}: act {np.round(act, 3)} reward {reward:.4f} "
              f"pred_error {err_pred:.4f}", flush=True)

        # planning overlay (plan_utils.py:104-281): init/pred/target/arrows
        try:
            from adaptigraph_tpu.utils.visualize import overlay_plan

            tgt_pcd = tgt_box = None
            if reward_mode == "target" and tc["target_type"] == "box":
                tgt_box = np.asarray(tc["target"], np.float32) * sim_real_ratio
            elif reward_mode == "target":
                tgt_pcd = np.load(tc["target"]) * sim_real_ratio
            vis = overlay_plan(
                colors[0], state_cur[:nobj], state_pred[:nobj], act,
                intrs[0], extrs[0], target_state=tgt_pcd, target_box=tgt_box,
                push_length=float(tc["push_length"]),
                adj_thresh=float(tc["adj_thresh"]), topk=int(tc["topk"]),
                units=units, sim_real_ratio=sim_real_ratio)
            import cv2

            cv2.imwrite(os.path.join(save_dir, f"rgb_vis_{i}.png"),
                        vis[..., ::-1])
        except Exception as e:  # viz must never kill the control loop
            print(f"overlay failed: {e}", flush=True)

        xs, zs, xe, ze = decode_action_single(act, float(tc["push_length"]))
        env.step(np.array([xs, zs, xe, ze]))

        colors, depths, intrs, extrs = _observe(env)
        state_real_raw, _ = perception.get_state_cur(colors, depths, intrs, extrs)
        state_real = flex_to_plan(state_real_raw * state_scale)

        ppm.log_interaction(i, act, state_cur[:nobj], state_pred[:nobj], state_real)
        sr = jnp.asarray(state_real)[None]  # (1, n_real, 3), unpadded
        if reward_mode == "target" and _tgt_type == "box":
            err_fin = float(box_loss(sr, box_flat)[0])
        elif reward_mode == "change":
            err_fin = float(-chamfer_loss(sr, target_d[None],
                                          y_mask=tmask_d[None])[0])
        else:
            err_fin = float(chamfer_loss(sr, target_d[None])[0])
        # columns: action index, best reward, REAL final error, PREDICTED
        # final error — consumers index [:, 2]; the pred column diagnoses
        # model-vs-reality divergence per action (VERDICT r4 #3)
        stats.append((i, reward, err_fin, err_pred))
        # incremental save: a timeout/watchdog kill mid-run still leaves the
        # acceptance artifact for the actions that completed
        np.savetxt(os.path.join(save_dir, "stats.txt"), np.asarray(stats))
        print(f"action {i}: final error {err_fin:.4f}", flush=True)

        if use_ppo:
            ppm.optimize(i, iterations=int(os.environ.get("PPO_ITERS", 50)))

    np.savetxt(os.path.join(save_dir, "stats.txt"), np.asarray(stats))
    return stats


def _observe(env):
    colors, depths = env.get_obs()
    return colors, depths, env.cam_intr, env.cam_extr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task-config", type=str, default="planning/rope")
    ap.add_argument("--env", type=str, default="sim", choices=["sim", "real"])
    ap.add_argument("--use-ppo", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--n-actions", type=int, default=None)
    ap.add_argument("--n-sample", type=int, default=None)
    ap.add_argument("--name", type=str, default="dump/plan")
    ap.add_argument("--ckpt", type=str, default="best")
    ap.add_argument("--capture-goal", type=str, default=None, metavar="OUT_NPY",
                    help="capture the target pcd from live frames and exit "
                         "(reference construct_goal_from_perception)")
    args = ap.parse_args()

    tc = load_config(args.task_config)["task_config"]
    if args.env == "sim":
        dg = load_config(f"data_gen/{tc['material']}")
        env = SimPlanEnv(dg)
    else:
        from adaptigraph_tpu.planning.real_world.real_env import RealEnv

        env = RealEnv(task_config=tc)
        env.start()
    if args.capture_goal:
        from adaptigraph_tpu.planning.perception import capture_goal

        pts = capture_goal(env, PerceptionModule(tc), args.capture_goal)
        print(f"captured goal pcd: {len(pts)} points -> {args.capture_goal}")
        return
    plan(tc, env, args.name, use_ppo=args.use_ppo, n_actions=args.n_actions,
         n_sample=args.n_sample, ckpt=args.ckpt, resume=args.resume)


if __name__ == "__main__":
    main()
