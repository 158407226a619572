import os, sys, time
os.environ.setdefault('JAX_PLATFORMS','cpu')
sys.path.insert(0, '/root/repo')
import numpy as np
t0=time.time()
from adaptigraph_tpu.scenes import build_scene
print(f"[{time.time()-t0:.1f}s] import", flush=True)
for mat in ['rope','cloth','granular']:
    t1=time.time()
    rng = np.random.RandomState(3)
    b = build_scene(mat, rng)
    pts = np.asarray(b.state.particles.pos)[:b.n_active]
    print(f"[{time.time()-t1:.1f}s]", mat, 'n_active', b.n_active,
          'clusters', int(np.asarray(b.spec.clusters.valid).sum()),
          'maxmem', int(np.asarray(b.spec.clusters.member_valid).sum(1).max()),
          'springs', int(np.asarray(b.spec.springs.valid).sum()),
          'bbox', np.round(pts.min(0),2), np.round(pts.max(0),2),
          'pinned', int((np.asarray(b.state.particles.inv_mass)[:b.n_active]==0).sum()),
          'sub/it', b.substeps, b.iterations, flush=True)
