"""Closed-loop sim planning at real scale with the trained rope model."""
import sys, os, time
sys.path.insert(0, '/root/repo')
import numpy as np
from adaptigraph_tpu.utils import load_config
from adaptigraph_tpu.planning.plan import SimPlanEnv, plan
import adaptigraph_tpu.planning.plan as plan_mod

t0 = time.time()
tc = load_config('planning/rope')['task_config']
tc['n_sample'] = 512
tc['n_actions'] = 2
tc['target_type'] = 'box'
tc['target'] = [-0.15, 0.15, -0.05, 0.25]
tc['max_nobj'] = 100
tc['max_nR'] = 1000
tc['adj_thresh'] = 0.5
tc['action_lower_lim'] = [-4.0, -4.0, -3.14, 5]
tc['action_upper_lim'] = [4.0, 4.0, 3.14, 10]

dyn = load_config('dynamics/rope')
dyn['dataset_config']['data_dir'] = '/root/repo/data/sim_data'
dyn['dataset_config']['prep_data_dir'] = '/root/repo/data/preprocess'
dyn['dataset_config']['ratio'] = {'train': [0, 0.75], 'valid': [0.75, 1]}
dyn['train_config']['out_dir'] = '/root/repo/data/log'

orig = plan_mod.load_config
plan_mod.load_config = lambda name: dyn if name == tc['config'] else orig(name)

dg = load_config('data_gen/rope')
dg['dataset']['screenWidth'] = 360
dg['dataset']['screenHeight'] = 360
print(f"[{time.time()-t0:.0f}s] building env", flush=True)
env = SimPlanEnv(dg, seed=11)
print(f"[{time.time()-t0:.0f}s] env ready; planning", flush=True)
os.environ['PPO_ITERS'] = '12'
stats = plan(tc, env, '/root/repo/data/plan_rope', use_ppo=True,
             n_actions=2, n_sample=512, n_update_iter=2)
print(f"[{time.time()-t0:.0f}s] DONE stats={stats}", flush=True)
