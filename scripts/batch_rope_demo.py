"""Throughput demo: 4 rope episodes generated in lockstep via BatchSimEnv
(the vmapped replacement for the reference's mp.Pool worker fan-out)."""
import sys, time
sys.path.insert(0, '/root/repo')
from adaptigraph_tpu.utils import load_config
from adaptigraph_tpu.sim.batch_env import generate_batch

t0 = time.time()
cfg = load_config('data_gen/rope')
cfg['dataset']['screenWidth'] = 360
cfg['dataset']['screenHeight'] = 360
cfg['dataset']['n_timestep'] = 2
generate_batch(cfg, [100, 101, 102, 103], '/root/repo/data/sim_data')
print(f"BATCH OF 4 EPISODES in {time.time()-t0:.0f}s "
      f"({(time.time()-t0)/4:.0f}s amortized per episode)", flush=True)
