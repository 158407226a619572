"""Generate real-scale rope episodes on TPU for training/eval."""
import sys, time, os
sys.path.insert(0, '/root/repo')
import numpy as np
from adaptigraph_tpu.utils import load_config
from adaptigraph_tpu.sim.data_gen import gen_episode

n_epi = int(sys.argv[1]) if len(sys.argv) > 1 else 3
out = sys.argv[2] if len(sys.argv) > 2 else '/root/repo/data/sim_data'
cfg = load_config('data_gen/rope')
cfg['dataset']['screenWidth'] = 360
cfg['dataset']['screenHeight'] = 360
cfg['dataset']['n_timestep'] = 3
env = None
for epi in range(n_epi):
    t0 = time.time()
    env = gen_episode(cfg, epi, True, out, env=env)
    print(f"EPISODE {epi} done in {time.time()-t0:.0f}s", flush=True)
print("ALL DONE", flush=True)
