"""Mesh/sharding layout tests on the 8-device forced-host CPU mesh.

The reference has no distributed backend (single GPU + mp.Pool,
SURVEY.md §2.2); these validate the rebuild's scaling substrate
(adaptigraph_tpu.parallel.mesh): the same jitted train step must produce
the same loss under 1-D data-parallel and 2-D data x model tensor-parallel
placements, with XLA deriving all collectives from input shardings.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from adaptigraph_tpu.parallel.mesh import (
    make_mesh, make_mesh_2d, replicate, shard_batch, shard_params_model)


def _tiny_model_batch():
    from __graft_entry__ import _toy_graph_batch
    from adaptigraph_tpu.dynamics.model import DynamicsPredictor, ModelConfig

    cfg = ModelConfig(n_his=4, nf=16, pstep=2)
    model = DynamicsPredictor(cfg)
    b, n_obj, n_eef = 8, 20, 1
    batch = _toy_graph_batch(b, n_obj, n_eef, 4, 100, jax.random.PRNGKey(0))
    batch["state_future"] = jnp.tile(batch["state"][:, -1, :n_obj][:, None],
                                     (1, 3, 1, 1))
    batch["eef_future"] = jnp.zeros((b, 2, n_obj + n_eef, 3))
    batch["action_future"] = jnp.zeros((b, 2, n_obj + n_eef, 3))
    g0 = jax.tree.map(lambda x: x[0], batch)
    params = model.init(jax.random.PRNGKey(1), g0["state"], g0["attrs"],
                        g0["recv"], g0["send"], g0["edge_valid"],
                        g0["p_instance"], g0["physics_param"],
                        action=g0["action"])["params"]
    return model, params, batch


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_2d_mesh_matches_data_parallel_loss():
    from adaptigraph_tpu.dynamics.train import make_train_step

    model, params, batch = _tiny_model_batch()
    opt = optax.adam(1e-3)
    train_step, _ = make_train_step(model, 3, opt)

    mesh1 = make_mesh(8)
    _, _, loss1 = train_step(replicate(params, mesh1),
                             replicate(opt.init(params), mesh1),
                             shard_batch(batch, mesh1))

    mesh2 = make_mesh_2d(4, 2)
    params_tp = shard_params_model(params, mesh2)
    _, _, loss2 = train_step(params_tp, opt.init(params_tp),
                             shard_batch(batch, mesh2))
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert abs(float(loss1) - float(loss2)) < 1e-2 + 0.05 * abs(float(loss1))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_shard_params_model_layout():
    _, params, _ = _tiny_model_batch()
    mesh2 = make_mesh_2d(4, 2)
    sharded = shard_params_model(params, mesh2)
    kinds = {"col": 0, "repl": 0}

    def visit(x):
        spec = x.sharding.spec
        if x.ndim == 2 and x.shape[1] % 2 == 0:
            assert spec == jax.sharding.PartitionSpec(None, "model"), spec
            kinds["col"] += 1
        elif x.ndim == 2:
            kinds["repl"] += 1

    jax.tree.map(visit, sharded)
    assert kinds["col"] > 0  # the MLP kernels actually went column-parallel
