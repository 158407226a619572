"""Microbench: Pallas dense contact kernel vs sparse path, in-program."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from adaptigraph_tpu.engine.pallas_kernels import dense_contact_deltas
from adaptigraph_tpu.engine.neighbors import neighbor_list_tiled
from adaptigraph_tpu.engine.solver import _particle_contact_deltas, precompute_contact_static

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
REPS = 100
rng = np.random.RandomState(0)
pos = jnp.array(rng.rand(N, 3).astype(np.float32) * 2)
group = jnp.array(np.arange(N) % 500, jnp.int32)
inv_mass = jnp.ones(N)
sc = jnp.zeros(N, bool)
active = jnp.ones(N, bool)
rest_pos = jnp.zeros((N, 3))

def scan_time(name, body):
    @jax.jit
    def run(p):
        def f(c, _):
            return c + body(c) * 1e-9, None
        c, _ = jax.lax.scan(f, p, None, length=REPS)
        return c
    r = run(pos); s = float(jnp.sum(r))
    t0 = time.time(); r = run(pos); s = float(jnp.sum(r))
    print(f"{name}: {(time.time()-t0)/REPS*1000:.3f} ms/iter (s={s:.1f})", flush=True)

scan_time("dense pallas contact", lambda p: dense_contact_deltas(
    p, p, group, inv_mass, sc, active, rest_pos, 0.045, 0.25, 0.0)[0])

idx, valid = neighbor_list_tiled(pos, 0.0675, active, k=24, tile=1024)
eligible, share = precompute_contact_static(inv_mass, group, sc, active, idx, valid)
pj_prev = pos[idx]
scan_time("sparse gather contact", lambda p: _particle_contact_deltas(
    p, pos, idx, eligible, share, 0.045, 0.25, pj_prev=pj_prev)[0])

scan_time("neighbor build (per frame)", lambda p: neighbor_list_tiled(
    p, 0.0675, active, k=24, tile=1024)[0].astype(jnp.float32)[:, :3])
