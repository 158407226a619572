"""GNN throughput levers on the real TPU (VERDICT r1 next #9):
compute dtype (f32 vs bf16), batch size, and matmul-vs-segment aggregation
at dataset scale (100 nodes / 1000 edges) and planning scale (200 nodes /
2000 edges, the plan.py state size). Prints one JSON line per config.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def bench(batch, steps, n_obj, max_edges, dtype, aggregation, trials=3):
    from adaptigraph_tpu.dynamics.model import DynamicsPredictor, ModelConfig
    from adaptigraph_tpu.dynamics.train import make_apply
    from adaptigraph_tpu.ops import build_edges, build_edges_batch

    cfg = ModelConfig(n_his=4, nf=150, pstep=3, compute_dtype=dtype,
                      aggregation=aggregation)
    model = DynamicsPredictor(cfg)
    n = n_obj + 1
    key = jax.random.PRNGKey(0)
    state = jax.random.normal(key, (4, n, 3)) * 0.3
    attrs = jnp.zeros((n, 2)).at[:n_obj, 0].set(1.0).at[n_obj:, 1].set(1.0)
    sm = jnp.ones(n, bool)
    em = jnp.zeros(n, bool).at[n_obj:].set(True)
    e = build_edges(state[-1], 0.5, sm, em, topk=10, max_edges=max_edges)
    action = jnp.zeros((n, 3))
    params = model.init(jax.random.PRNGKey(1), state, attrs, e.receivers,
                        e.senders, e.valid, jnp.ones((n_obj, 1)),
                        jnp.array([0.5]), action=action)["params"]
    apply = make_apply(model)

    g = {"state": state, "attrs": attrs, "recv": e.receivers, "send": e.senders,
         "edge_valid": e.valid, "p_instance": jnp.ones((n_obj, 1)),
         "physics_param": jnp.array([0.5]), "action": action,
         "obj_mask": jnp.ones(n_obj, bool)}
    gb = jax.tree.map(lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), g)
    sm_b = jnp.tile(sm[None], (batch, 1))
    em_b = jnp.tile(em[None], (batch, 1))

    @jax.jit
    def rollout(params, gb):
        def body(carry, _):
            st, recv, send, ev = carry
            pred, _ = jax.vmap(apply, in_axes=(None, 0))(
                params, dict(gb, state=st, recv=recv, send=send, edge_valid=ev))
            nxt = st[:, -1].at[:, :n_obj].set(pred)
            eb = build_edges_batch(nxt, 0.5, sm_b, em_b, topk=10,
                                   max_edges=max_edges)
            st = jnp.concatenate([st[:, 1:], nxt[:, None]], axis=1)
            return (st, eb.receivers, eb.senders, eb.valid), None

        carry = (gb["state"], gb["recv"], gb["send"], gb["edge_valid"])
        (st, _, _, _), _ = jax.lax.scan(body, carry, None, length=steps)
        return st

    compiled = rollout.lower(params, gb).compile()
    try:
        flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops = float("nan")
    out = rollout(params, gb)
    float(jnp.sum(out))
    best = 0.0
    for _ in range(trials):
        t0 = time.time()
        out = rollout(params, gb)
        float(jnp.sum(out))
        best = max(best, batch * steps / (time.time() - t0))
    peak = 197e12 if dtype == jnp.bfloat16 else 98.5e12  # v5e bf16/f32 peak
    mfu = flops * best / (batch * steps) / peak if flops == flops else None
    print(json.dumps({
        "batch": batch, "n_obj": n_obj, "max_edges": max_edges,
        "dtype": "bf16" if dtype == jnp.bfloat16 else "f32",
        "agg": aggregation,
        "graph_steps_per_s": round(best, 1),
        "mfu": round(mfu, 4) if mfu is not None else None,
    }), flush=True)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    # dataset scale: 100 nodes, 1000 edges
    for dtype in (jnp.float32, jnp.bfloat16):
        for agg in ("matmul", "segment"):
            for batch in (512, 2048):
                bench(batch, 10, 100, 1000, dtype, agg)
    # planning scale: 200 nodes, 2000 edges (plan.py state size)
    for dtype in (jnp.float32, jnp.bfloat16):
        for agg in ("matmul", "segment"):
            bench(1024, 10, 200, 2000, dtype, agg)


if __name__ == "__main__":
    main()
