"""Retry: one cloth + one granular real-scale episode."""
import sys, time
sys.path.insert(0, '/root/repo')
from adaptigraph_tpu.utils import load_config
from adaptigraph_tpu.sim.data_gen import gen_episode

for mat, speed in (('cloth', 60), ('granular', 150)):
    t0 = time.time()
    cfg = load_config(f'data_gen/{mat}')
    cfg['dataset']['screenWidth'] = 360
    cfg['dataset']['screenHeight'] = 360
    cfg['dataset']['n_timestep'] = 1
    cfg['dataset']['robot_speed_inv'] = speed
    try:
        gen_episode(cfg, 0, True, '/root/repo/data/sim_data')
        print(f"{mat.upper()} EPISODE done in {time.time()-t0:.0f}s", flush=True)
    except Exception as e:
        import traceback; traceback.print_exc()
        print(f"{mat.upper()} FAILED after {time.time()-t0:.0f}s: {e}", flush=True)
print("ALL DONE", flush=True)
