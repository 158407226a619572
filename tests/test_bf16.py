"""bfloat16 compute path: MXU-friendly model forward stays close to f32."""

import numpy as np
import jax
import jax.numpy as jnp

from adaptigraph_tpu.dynamics.model import DynamicsPredictor, ModelConfig
from tests.test_dynamics import _toy_graph, _apply


def test_bf16_forward_close_to_f32():
    g = _toy_graph(jax.random.PRNGKey(0))
    cfg32 = ModelConfig(n_his=4, nf=64, pstep=2)
    m32 = DynamicsPredictor(cfg32)
    params = m32.init(jax.random.PRNGKey(1), g["state"], g["attrs"], g["recv"],
                      g["send"], g["edge_valid"], g["p_instance"],
                      g["physics_param"], action=g["action"])["params"]
    p32, mo32 = _apply(m32, params, g)

    cfg16 = ModelConfig(n_his=4, nf=64, pstep=2, compute_dtype=jnp.bfloat16)
    m16 = DynamicsPredictor(cfg16)
    p16, mo16 = _apply(m16, params, g)  # same params, bf16 compute

    assert p16.dtype == jnp.float32  # outputs cast back
    # motions are small; bf16 relative error ~1e-2 of the motion scale
    scale = np.abs(np.asarray(mo32)).max() + 1e-6
    rel = np.abs(np.asarray(mo16) - np.asarray(mo32)).max() / scale
    assert rel < 0.05
