"""Standalone rollout evaluation at the reference's 100-step horizon.

Same config overrides as train_material.py but rollout-only: used to
re-evaluate an EXISTING checkpoint after rollout.py logic changes (r5: the
episode-wide pair walk, reference rollout.py:207-239 / graph.py:374-390)
without paying a retraining slot. VERDICT r4 #7 wants rope error_median.txt
over >=60 steps from >=50 pushes.

Usage: rollout_material.py [material] [ckpt] [steps]
"""
import sys, time, os
sys.path.insert(0, '/root/repo')
import numpy as np

from adaptigraph_tpu.utils import load_config, enable_compile_cache

MATERIAL = sys.argv[1] if len(sys.argv) > 1 else 'rope'
CKPT = sys.argv[2] if len(sys.argv) > 2 else 'best'
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 100

cfg = load_config(f'dynamics/{MATERIAL}')
cfg['dataset_config']['data_dir'] = '/root/repo/data/sim_data'
cfg['dataset_config']['prep_data_dir'] = '/root/repo/data/preprocess'
cfg['dataset_config']['ratio'] = {'train': [0, 0.75], 'valid': [0.75, 1]}
import glob as _glob
_eps = [d for d in _glob.glob(f'/root/repo/data/sim_data/{MATERIAL}/0*')
        if len(_glob.glob(d + '/0*.h5')) > 1]
if len(_eps) < 4:
    cfg['dataset_config']['ratio'] = {'train': [0, 1], 'valid': [0, 1]}
elif len(_eps) < 40:
    # match train_material.py's mid-sized split (no train/valid overlap)
    cfg['dataset_config']['ratio'] = {'train': [0, 0.7], 'valid': [0.7, 1]}
cfg['train_config']['out_dir'] = '/root/repo/data/log'
cfg['rollout_config']['out_dir'] = '/root/repo/data/rollout'

t0 = time.time()
if not os.path.exists(f'/root/repo/data/preprocess/{MATERIAL}/positions.pkl'):
    from adaptigraph_tpu.dynamics.preprocess import preprocess
    preprocess(cfg)
    print(f"[{time.time()-t0:.0f}s] preprocess done", flush=True)

enable_compile_cache()
from adaptigraph_tpu.dynamics.rollout import rollout

errors = rollout(cfg, ckpt=CKPT, rollout_steps=STEPS)
finals = [e[-1] for e in errors if e]
lens = [len(e) for e in errors if e]
print(f"[{time.time()-t0:.0f}s] rollout: {len(errors)} pushes, "
      f"mean final err {np.mean(finals):.4f}, "
      f"horizon max {max(lens) if lens else 0} median {int(np.median(lens)) if lens else 0}",
      flush=True)
