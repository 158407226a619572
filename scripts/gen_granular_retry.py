"""Granular real-scale episode — validation data for the granular pipeline.
Episode index 2 samples a small 5x5-granule scene (kind to the remote worker)."""
import sys, time
sys.path.insert(0, '/root/repo')
from adaptigraph_tpu.utils import load_config
from adaptigraph_tpu.sim.data_gen import gen_episode

t0 = time.time()
cfg = load_config('data_gen/granular')
cfg['dataset']['screenWidth'] = 360
cfg['dataset']['screenHeight'] = 360
cfg['dataset']['n_timestep'] = 1
cfg['dataset']['robot_speed_inv'] = 150
gen_episode(cfg, 2, True, '/root/repo/data/sim_data')
print(f"GRANULAR EPISODE done in {time.time()-t0:.0f}s", flush=True)
