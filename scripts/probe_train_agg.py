"""Probe: time one fused K-step train chunk in 'matmul' vs 'slotted'
aggregation on the live backend and print the winner.

The two modes are mathematically identical for training (same valid edge
set, permutation-invariant message passing, shared parameters —
tests/test_dynamics.py::TestSlottedTraining); which is faster on the TPU
depends on how XLA lowers the per-sample edge argsort vs top_k slots, so we
measure instead of guessing (round-3 lesson: the fused-shape and
component-split "wins" both lost whole-frame).

Prints one line: AGG_WINNER=<mode> <matmul_s> <slotted_s>
Exit 0 always (a probe failure must not sink the final phase).
"""
import sys
import time
import types

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from adaptigraph_tpu.dynamics.model import DynamicsPredictor, ModelConfig
    from adaptigraph_tpu.dynamics.train import make_train_chunk
    from adaptigraph_tpu.parallel.mesh import make_mesh

    import os

    # synthetic device-resident dataset at rope-campaign scale
    # (PROBE_SMALL=1 shrinks everything for CPU smoke tests)
    small = os.environ.get("PROBE_SMALL") == "1"
    e, t_max, n_raw, n_eef = (4, 12, 200, 1) if small else (16, 40, 2000, 1)
    rng = np.random.RandomState(0)
    common = {
        "obj": jnp.asarray(rng.randn(e, t_max, n_raw, 3).astype(np.float32) * 0.3),
        "eef": jnp.asarray(rng.randn(e, t_max, n_eef, 3).astype(np.float32) * 0.3),
        "nobj": jnp.full((e,), n_raw, jnp.int32),
        "phys": jnp.full((e, 1), 0.5, jnp.float32),
    }
    n_his, n_future, t_w = 4, 3, 7
    pair_rows = []
    for epi in range(e):
        for t0 in range(t_max - t_w):
            pair_rows.append([epi] + list(range(t0, t0 + t_w)))
    pairs = jnp.asarray(np.array(pair_rows, np.int32))

    ds = types.SimpleNamespace(
        n_his=n_his, n_future=n_future, max_nobj=100, max_nR=1000,
        fps_radius_range=(0.05, 0.1), adj_radius_range=(0.5, 0.5), topk=10,
        connect_tool_all=False, state_noise=0.003, phys_noise=0.01,
        augment=True)

    K, B = (2, 8) if small else (8, 128)
    idxs = jnp.asarray(
        np.random.RandomState(1).randint(0, len(pair_rows), (K, B)), jnp.int32)
    key = jax.random.PRNGKey(0)
    mesh = make_mesh()

    times = {}
    for mode in ("matmul", "slotted", "slotmm"):
      try:
        cfg = ModelConfig(n_his=n_his, nf=150, pstep=3, aggregation=mode)
        model = DynamicsPredictor(cfg)
        # init params via a tiny graph of the right dims
        from adaptigraph_tpu.ops import build_edges_slotted

        n = ds.max_nobj + n_eef
        st = jnp.zeros((n_his, n, 3))
        eset = build_edges_slotted(st[-1], 0.5, jnp.ones(n, bool),
                                   jnp.zeros(n, bool).at[ds.max_nobj:].set(True),
                                   topk=ds.topk)
        params = model.init(jax.random.PRNGKey(1), st, jnp.zeros((n, 2)),
                            eset.receivers, eset.senders, eset.valid,
                            jnp.ones((ds.max_nobj, 1)), jnp.array([0.5]),
                            action=jnp.zeros((n, 3)))["params"]
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        chunk, _ = make_train_chunk(model, n_future, opt, ds, common, pairs, mesh)
        p, o, losses = chunk(params, opt_state, idxs, key)
        float(jnp.sum(losses))  # compile + sync
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            p, o, losses = chunk(p, o, idxs, key)
            float(jnp.sum(losses))
        times[mode] = (time.time() - t0) / reps
        print(f"{mode}: {times[mode]:.3f}s per {K}-step chunk", flush=True)
      except Exception as exc:  # noqa: broad — one bad mode must not sink the probe
        print(f"{mode}: FAILED ({exc})", flush=True)

    if not times:
        raise RuntimeError("all aggregation modes failed")
    winner = min(times, key=times.get)
    print("AGG_WINNER=%s %s" % (winner, " ".join(
        f"{m}={t:.3f}" for m, t in times.items())), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # noqa: broad — probe must not sink the phase
        print(f"probe failed: {exc}", flush=True)
        print("AGG_WINNER=matmul nan nan", flush=True)
