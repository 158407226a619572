"""Microbenchmark individual engine stages to find the bottleneck."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from adaptigraph_tpu.engine.neighbors import neighbor_list, neighbor_list_tiled
from adaptigraph_tpu.engine.solver import _spring_deltas, _particle_contact_deltas
from adaptigraph_tpu.engine.state import make_springs

N = 5000
rng = np.random.RandomState(0)
pos = jnp.array(rng.rand(N, 3).astype(np.float32) * 2)
active = jnp.ones(N, dtype=bool)

def timeit(name, f, *args, reps=20):
    out = f(*args); jax.tree.map(lambda x: x.block_until_ready(), out)
    s = float(jnp.sum(jax.tree.leaves(out)[0]))  # force transfer
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    s = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1000:.2f} ms  (s={s:.1f})", flush=True)
    return out

nl = jax.jit(lambda p: neighbor_list(p, 0.045, active, k=24))
idx, valid = timeit("neighbor_list k=24 dense", nl, pos)

nlt = jax.jit(lambda p: neighbor_list_tiled(p, 0.045, active, k=24, tile=1024))
timeit("neighbor_list tiled", nlt, pos)

# top_k alone on (N, N)
d2 = jnp.sum((pos[:, None] - pos[None]) ** 2, -1)
tk = jax.jit(lambda d: jax.lax.top_k(-d, 24))
timeit("top_k(N,N) alone", tk, d2)

# distance matrix alone
dm = jax.jit(lambda p: jnp.sum((p[:, None] - p[None]) ** 2, -1))
timeit("dist matrix alone", dm, pos)

# contacts from fixed neighbor list
group = jnp.array(np.arange(N) % 500)
sc = jnp.zeros(N, dtype=bool)
inv_mass = jnp.ones(N)
con = jax.jit(lambda p: _particle_contact_deltas(p, p, inv_mass, group, sc, idx, valid, 0.03, 0.25))
timeit("particle contacts", con, pos)

# springs
sidx = np.stack([np.arange(N - 1), np.arange(1, N)], 1)
springs = make_springs(sidx, rest=0.05, stiffness=0.3)
spr = jax.jit(lambda p: _spring_deltas(p, inv_mass, springs))
timeit("springs scatter", spr, pos)
