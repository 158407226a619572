"""Exploration for property estimation: plan pushes that CHANGE the state.

Port of src/planning/random_interact.py (:26-55 reward, :58-295 loop): the
same closed loop as plan.py but the reward is the NEGATED-target objective —
maximize chamfer distance to the current state (state change) subject to the
same collision/workspace penalties — so the physics-parameter optimizer sees
informative interactions.

Usage:
  python -m adaptigraph_tpu.planning.random_interact --task-config \
      planning/granular --env sim --n-actions 5
"""

from __future__ import annotations

import argparse

from adaptigraph_tpu.planning import plan as plan_mod
from adaptigraph_tpu.utils import load_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task-config", type=str, default="planning/granular")
    ap.add_argument("--env", type=str, default="sim", choices=["sim", "real"])
    ap.add_argument("--n-actions", type=int, default=5)
    ap.add_argument("--n-sample", type=int, default=None)
    ap.add_argument("--name", type=str, default="dump/random_interact")
    ap.add_argument("--ckpt", type=str, default="latest")
    args = ap.parse_args()

    tc = load_config(args.task_config)["task_config"]
    if args.env == "sim":
        dg = load_config(f"data_gen/{tc['material']}")
        env = plan_mod.SimPlanEnv(dg)
    else:
        from adaptigraph_tpu.planning.real_world.real_env import RealEnv

        env = RealEnv(task_config=tc)
        env.start()
    plan_mod.plan(tc, env, args.name, use_ppo=True, n_actions=args.n_actions,
                  n_sample=args.n_sample, ckpt=args.ckpt, reward_mode="change")


if __name__ == "__main__":
    main()
