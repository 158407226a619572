"""Microbench: what do 5k-row gathers/scatters actually cost on this TPU?

Isolates the spring-pass building blocks to find the true bottleneck:
row gathers pos[idx] with tiny (3-float) rows, scatter-add, padded-row
variants, and the full spring pass formulations.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=8, inner=100):
    # scan the op `inner` times inside one program so dispatch amortizes
    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(*a, c)
            return out, None
        c0 = jnp.zeros((), jnp.float32)
        c, _ = jax.lax.scan(body, c0, None, length=inner)
        return c

    float(run(*args))  # compile
    best = 1e30
    for _ in range(iters):
        t0 = time.time()
        float(run(*args))
        best = min(best, (time.time() - t0) / inner)
    print(json.dumps({"op": name, "us": round(best * 1e6, 1)}), flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    n, s = 5120, 5120
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    pos8 = jnp.concatenate([pos, jnp.zeros((n, 5))], axis=1)  # padded rows
    pos128 = jnp.concatenate([pos, jnp.zeros((n, 125))], axis=1)
    idx = jnp.asarray(rng.randint(0, n, size=s).astype(np.int32))
    idx_sorted = jnp.sort(idx)
    vals = jnp.asarray(rng.rand(s, 3).astype(np.float32))

    timeit("gather rows (S,3) random idx", lambda p, i, c: jnp.sum(p[i]) + c, pos, idx)
    timeit("gather rows (S,3) sorted idx", lambda p, i, c: jnp.sum(p[i]) + c, pos,
           idx_sorted)
    timeit("gather rows (S,8) random idx", lambda p, i, c: jnp.sum(p[i]) + c, pos8, idx)
    timeit("gather rows (S,128) random idx", lambda p, i, c: jnp.sum(p[i]) + c,
           pos128, idx)
    timeit("take_along_axis cols (3,S)", lambda p, i, c: jnp.sum(
        jnp.take_along_axis(p, jnp.tile(i[None], (3, 1)), axis=1)) + c, pos.T, idx)
    timeit("scatter-add (S,3)->(N,3)", lambda v, i, c: jnp.sum(
        jnp.zeros((n, 3)).at[i].add(v)) + c, vals, idx)
    timeit("scatter-add sorted", lambda v, i, c: jnp.sum(
        jnp.zeros((n, 3)).at[i].add(v, indices_are_sorted=True)) + c, vals, idx_sorted)
    timeit("segment_sum sorted", lambda v, i, c: jnp.sum(
        jax.ops.segment_sum(v, i, num_segments=n, indices_are_sorted=True)) + c,
        vals, idx_sorted)

    # full spring pass variants at rope-bench scale
    from adaptigraph_tpu.engine.state import make_springs, build_spring_incidence
    from adaptigraph_tpu.engine.solver import _spring_deltas, _spring_deltas_gather

    sidx = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    springs = make_springs(sidx, rest=0.05, stiffness=0.3)
    inc = build_spring_incidence(springs, n)
    inv_mass = jnp.ones((n,))
    timeit("spring pass scatter", lambda p, c: jnp.sum(
        _spring_deltas(p + c, inv_mass, springs)[0]), pos)
    timeit("spring pass gather-incidence", lambda p, c: jnp.sum(
        _spring_deltas_gather(p + c, inv_mass, springs, inc)[0]), pos)


if __name__ == "__main__" and "--scaling" not in sys.argv:
    main()


def scaling():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    for n in (512, 2048, 8192, 32768, 131072):
        pos = jnp.asarray(rng.rand(n, 3).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, n, size=n).astype(np.int32))
        timeit(f"gather rows n={n}", lambda p, i, c: jnp.sum(p[i]) + c, pos, idx)
    # big-K member gather like the rope cluster pass (C=384, K=640 from N=3072)
    pos = jnp.asarray(rng.rand(3072, 3).astype(np.float32))
    member = jnp.asarray(rng.randint(0, 3072, size=(384, 640)).astype(np.int32))
    timeit("gather (384,640,3) member table", lambda p, m, c: jnp.sum(p[m]) + c,
           pos, member)


if __name__ == "__main__" and "--scaling" in sys.argv:
    scaling()
    sys.exit(0)
