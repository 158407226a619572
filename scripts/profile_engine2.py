"""In-program profiling: scan each stage 100x inside one jit to amortize
dispatch/tunnel overhead."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from adaptigraph_tpu.engine.neighbors import neighbor_list, neighbor_list_tiled
from adaptigraph_tpu.engine.solver import _spring_deltas, _particle_contact_deltas, _cluster_deltas
from adaptigraph_tpu.engine.state import make_springs, make_clusters
from adaptigraph_tpu.engine.collisions import shape_contact_deltas
from adaptigraph_tpu.engine.state import make_shapes, SHAPE_PLANE

N = 5000
REPS = 100
rng = np.random.RandomState(0)
pos0 = jnp.array(rng.rand(N, 3).astype(np.float32) * 2)
active = jnp.ones(N, dtype=bool)
inv_mass = jnp.ones(N)
group = jnp.array(np.arange(N) % 500)
sc = jnp.zeros(N, dtype=bool)

def scan_time(name, body):
    @jax.jit
    def run(p):
        def f(carry, _):
            out = body(carry)
            return carry + out * 1e-9, None  # keep dependency
        c, _ = jax.lax.scan(f, p, None, length=REPS)
        return c
    r = run(pos0); r.block_until_ready(); s = float(jnp.sum(r))
    t0 = time.time(); r = run(pos0); s = float(jnp.sum(r)); dt = time.time() - t0
    print(f"{name}: {dt/REPS*1000:.3f} ms/iter (s={s:.1f})", flush=True)

scan_time("dense neighbor", lambda p: neighbor_list(p, 0.045, active, k=24)[1].sum() * jnp.ones(3))
scan_time("tiled neighbor", lambda p: neighbor_list_tiled(p, 0.045, active, k=24, tile=1024)[1].sum() * jnp.ones(3))

idx, valid = neighbor_list_tiled(pos0, 0.045, active, k=24, tile=1024)
scan_time("contacts", lambda p: _particle_contact_deltas(p, p, inv_mass, group, sc, idx, valid, 0.03, 0.25)[0][0])

sidx = np.stack([np.arange(N - 1), np.arange(1, N)], 1)
springs = make_springs(sidx, rest=0.05, stiffness=0.3)
scan_time("springs", lambda p: _spring_deltas(p, inv_mass, springs)[0][0])

members = [list(range(i, min(i + 30, N))) for i in range(0, N, 20)]
clusters = make_clusters(members, np.asarray(pos0), 0.5, c_max=256, k_max=32)
rot = jnp.tile(jnp.array([0.0, 0, 0, 1.0]), (256, 1))
scan_time("clusters 256x32", lambda p: _cluster_deltas(p, clusters, rot)[0][0])

shapes = make_shapes([SHAPE_PLANE], [[0, 0, 0]], [[0, 0, 0]], [[0, 0, 0, 1]], m_max=4)
svel = jnp.zeros((4, 3))
scan_time("shape contacts", lambda p: shape_contact_deltas(p, p, shapes, shapes.pos, shapes.quat, svel, 0.015, 0.0, 0.3, 1/120)[0][0])
