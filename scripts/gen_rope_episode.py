"""End-to-end verification: generate one real rope episode on the TPU."""
import sys, time, os
sys.path.insert(0, '/root/repo')
import numpy as np
from adaptigraph_tpu.utils import load_config
from adaptigraph_tpu.sim.data_gen import gen_episode

t0 = time.time()
cfg = load_config('data_gen/rope')
cfg['dataset']['screenWidth'] = 360
cfg['dataset']['screenHeight'] = 360
cfg['dataset']['n_timestep'] = 2
out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/simdata'
gen_episode(cfg, 0, True, out)
print(f"TOTAL {time.time()-t0:.0f}s", flush=True)
# inspect the h5s
from adaptigraph_tpu.sim.episode_io import load_data
for f in sorted(os.listdir(os.path.join(out, 'rope', '000000'))):
    if f.endswith('.h5'):
        d = load_data(os.path.join(out, 'rope', '000000', f))
        print(f, 'T=', d['info']['timestamp'], 'N=', d['info']['n_particles'],
              'pos range y', d['positions'][...,1].min().round(3), d['positions'][...,1].max().round(3),
              'depth nonzero frac', (d['observations']['depth']['cam_0'] > 0).mean().round(3), flush=True)
