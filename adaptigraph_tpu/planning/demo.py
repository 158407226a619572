"""Offline physics-parameter estimation demo.

Port of src/planning/demo/demo_granular_1.py: run the physics-param online
optimizer against a directory of pre-recorded interaction_*.npz logs (no
robot, no simulator) — the reference's end-to-end acceptance test whose
shipped coffee-bean interactions estimate granularity ~0.04 (README.md:258).

The same flow works on interactions produced by the sim-in-the-loop planner
(adaptigraph_tpu.planning.plan --env sim), which is how this framework
generates its own demo fixtures.

Usage:
  python -m adaptigraph_tpu.planning.demo --task-config planning/granular \
      --name dump/demo_granular [--iterations 50]
"""

from __future__ import annotations

import argparse
import glob
import os

from adaptigraph_tpu.dynamics.dataset import DynDataset
from adaptigraph_tpu.dynamics.train import init_model, load_checkpoint
from adaptigraph_tpu.planning.physics_optimizer import PhysicsParamOnlineOptimizer
from adaptigraph_tpu.utils import load_config


def run_demo(task_config, save_dir, iterations=50, ckpt="latest"):
    dyn_config = load_config(task_config["config"])
    dataset = DynDataset(dyn_config["dataset_config"], dyn_config["material_config"],
                         "valid")
    model, params0 = init_model(dyn_config, dataset)
    ckpt_dir = os.path.join(dyn_config["train_config"]["out_dir"],
                            dyn_config["dataset_config"]["data_name"], "checkpoints")
    params = load_checkpoint(ckpt_dir, ckpt, params0)

    ppm = PhysicsParamOnlineOptimizer(task_config, model, params,
                                      task_config["material"], save_dir)
    n = len(glob.glob(os.path.join(save_dir, "interaction_*.npz")))
    assert n > 0, f"no interaction_*.npz logs in {save_dir}"
    est, err, err0 = ppm.optimize(n - 1, iterations=iterations)
    print(f"estimated {task_config['material']} physics param: {est} "
          f"(error {err:.5f}, init {err0:.5f})")
    return est


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--task-config", type=str, default="planning/granular")
    ap.add_argument("--name", type=str, default="dump/demo_granular")
    ap.add_argument("--iterations", type=int, default=50)
    ap.add_argument("--ckpt", type=str, default="latest")
    args = ap.parse_args()
    tc = load_config(args.task_config)["task_config"]
    run_demo(tc, args.name, iterations=args.iterations, ckpt=args.ckpt)
