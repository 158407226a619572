"""Benchmark driver: one JSON line for the round's headline metric.

Headline = combined PBD + GNN rollout throughput at the north-star design
point (BASELINE.json): XPBD sim steps/s at 5000 particles (rope solver
schedule: 2 substeps x 4 iterations) plus batched GNN planning-rollout
steps/s per chip (max_nobj=100 graphs, reference model scale). Baseline
target: 10 000 combined steps/s on one chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def bench_pbd(n=5000, t=100, substeps=2, iterations=4, trials=3):
    from adaptigraph_tpu.engine import (
        SHAPE_PLANE, SceneSpec, SceneState, SolverParams, rollout_steps)
    from adaptigraph_tpu.engine.state import (
        empty_clusters, make_particles, make_shapes, make_springs)

    rng = np.random.RandomState(0)
    pos = rng.rand(n, 3).astype(np.float32) * np.array([4, 1, 4], np.float32) + \
        np.array([-2, 0.5, -2], np.float32)
    p = make_particles(pos, group=np.arange(n) % 500)
    shapes = make_shapes([SHAPE_PLANE], [[0, 0, 0]], [[0, 0, 0]], [[0, 0, 0, 1]],
                         m_max=4)
    idx = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    springs = make_springs(idx, rest=0.05, stiffness=0.3)
    spec = SceneSpec(springs=springs, clusters=empty_clusters(2, 4),
                     global_stiffness=jnp.float32(0.0),
                     global_rest=jnp.zeros((0, 3)), rest_pos=jnp.zeros((n, 3)),
                     params=SolverParams())
    st = SceneState(particles=p, shapes=shapes,
                    cluster_rot=jnp.tile(jnp.array([0.0, 0, 0, 1.0]), (2, 1)),
                    global_rot=jnp.array([0.0, 0, 0, 1.0]))
    pos_traj = jnp.tile(st.shapes.pos[None], (t, 1, 1))
    quat_traj = jnp.tile(st.shapes.quat[None], (t, 1, 1))

    def run():
        final, _ = rollout_steps(st, spec, pos_traj, quat_traj, substeps=substeps,
                                 iterations=iterations, record=False)
        return float(jnp.sum(final.particles.pos))  # host sync

    run()
    best = 0.0
    for _ in range(trials):
        t0 = time.time()
        run()
        best = max(best, t / (time.time() - t0))
    return best


def bench_gnn(batch=512, steps=20, trials=3):
    """Batched single-step GNN rollout throughput: graph steps/s =
    batch * steps / wall. f32 with matmul aggregation measured fastest
    (bf16 relayouts cost more than they save at nf=150)."""
    from adaptigraph_tpu.dynamics.model import DynamicsPredictor, ModelConfig
    from adaptigraph_tpu.dynamics.train import make_apply
    from adaptigraph_tpu.ops import build_edges

    cfg = ModelConfig(n_his=4, nf=150, pstep=3)
    model = DynamicsPredictor(cfg)
    n_obj, n_eef = 100, 1
    n = n_obj + n_eef
    key = jax.random.PRNGKey(0)
    state = jax.random.normal(key, (4, n, 3)) * 0.3
    attrs = jnp.zeros((n, 2)).at[:n_obj, 0].set(1.0).at[n_obj:, 1].set(1.0)
    sm = jnp.ones(n, bool)
    em = jnp.zeros(n, bool).at[n_obj:].set(True)
    e = build_edges(state[-1], 0.5, sm, em, topk=10, max_edges=1000)
    action = jnp.zeros((n, 3))
    params = model.init(jax.random.PRNGKey(1), state, attrs, e.receivers, e.senders,
                        e.valid, jnp.ones((n_obj, 1)), jnp.array([0.5]),
                        action=action)["params"]
    apply = make_apply(model)

    g = {"state": state, "attrs": attrs, "recv": e.receivers, "send": e.senders,
         "edge_valid": e.valid, "p_instance": jnp.ones((n_obj, 1)),
         "physics_param": jnp.array([0.5]), "action": action,
         "obj_mask": jnp.ones(n_obj, bool)}
    gb = jax.tree.map(lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), g)

    @jax.jit
    def rollout(params, gb):
        def body(st, _):
            pred, _ = jax.vmap(apply, in_axes=(None, 0))(params, dict(gb, state=st))
            nxt = st[:, -1].at[:, :n_obj].set(pred)
            st = jnp.concatenate([st[:, 1:], nxt[:, None]], axis=1)
            return st, None

        st, _ = jax.lax.scan(body, gb["state"], None, length=steps)
        return st

    out = rollout(params, gb)
    float(jnp.sum(out))
    best = 0.0
    for _ in range(trials):
        t0 = time.time()
        out = rollout(params, gb)
        s = float(jnp.sum(out))
        best = max(best, batch * steps / (time.time() - t0))
    return best


def main():
    backend = jax.default_backend()
    pbd = bench_pbd()
    gnn = bench_gnn()
    combined = pbd + gnn
    print(json.dumps({
        "metric": "combined PBD+GNN rollout steps/s (5k-particle XPBD + "
                  "batched 100-node GNN) per chip",
        "value": round(combined, 1),
        "unit": "steps/s",
        "vs_baseline": round(combined / 10000.0, 4),
        "pbd_steps_per_s": round(pbd, 1),
        "gnn_graph_steps_per_s": round(gnn, 1),
        "backend": backend,
    }))


if __name__ == "__main__":
    main()
