"""Probe the physics-param replay-error landscape over logged interactions.

Loads data/plan_<mat>/interaction_*.npz (written by plan.py's closed loop)
plus the material checkpoint, then sweeps dynamics_error over a parameter
grid — the 1-D objective gp_minimize_ei sees (physics_optimizer.py). Use to
diagnose PPO recovery failures offline: a flat or bound-monotone curve means
the model replay carries no parameter signal for these interactions.

Usage: ADAPTIGRAPH_FORCE_CPU=1 python scripts/ppo_landscape.py rope [n_grid]
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

if os.environ.get("ADAPTIGRAPH_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

from adaptigraph_tpu.utils import enable_compile_cache, load_config

enable_compile_cache()

MAT = sys.argv[1] if len(sys.argv) > 1 else "rope"
N_GRID = int(sys.argv[2]) if len(sys.argv) > 2 else 15
SAVE = os.environ.get("PLAN_SAVE_DIR", f"/root/repo/data/plan_{MAT}")
LOG_DIR = os.environ.get("PLAN_LOG_DIR", "/root/repo/data/log")

tc = load_config(f"planning/{MAT}")["task_config"]
dyn = load_config(f"dynamics/{MAT}")
dyn["dataset_config"]["data_dir"] = "/root/repo/data/sim_data"
dyn["dataset_config"]["prep_data_dir"] = "/root/repo/data/preprocess"
dyn["dataset_config"]["ratio"] = {"train": [0, 0.75], "valid": [0.75, 1]}
dyn["train_config"]["out_dir"] = LOG_DIR

from adaptigraph_tpu.dynamics.dataset import DynDataset
from adaptigraph_tpu.dynamics.train import init_model, load_checkpoint
from adaptigraph_tpu.planning.physics_optimizer import PhysicsParamOnlineOptimizer

dataset = DynDataset(dyn["dataset_config"], dyn["material_config"], "valid")
model, params0 = init_model(dyn, dataset)
ckpt_dir = os.path.join(LOG_DIR, dyn["dataset_config"]["data_name"], "checkpoints")
params = load_checkpoint(ckpt_dir, "best", params0)

ppm = PhysicsParamOnlineOptimizer(tc, model, params, MAT, SAVE)
acts, inits, reals = ppm._load_interactions()
print(f"{len(acts)} interactions from {SAVE}")
true = None
tp_path = os.path.join(SAVE, "true_param.json")
if os.path.exists(tp_path):
    import json

    true = json.load(open(tp_path))["true_param"]
    print(f"true param: {true}")

grid = np.linspace(-0.2, 1.2, N_GRID)
errs = [ppm.dynamics_error(np.array([g], np.float32), acts, inits, reals)
        for g in grid]
for g, e in zip(grid, errs):
    mark = " <-- true" if true and abs(g - true[0]) < (grid[1] - grid[0]) / 2 else ""
    print(f"param {g:+.3f}  error {e:.5f}{mark}")
best = grid[int(np.argmin(errs))]
print(f"argmin {best:+.3f}  spread {max(errs) - min(errs):.5f} "
      f"(rel {(max(errs) - min(errs)) / (min(errs) + 1e-9):.3f})")
