"""Device-mesh utilities: the framework's scaling substrate.

The reference has no model/data parallelism (single GPU + mp.Pool episode
fan-out, SURVEY.md §2.2). Here every batch axis — training batches, MPPI
sample populations, multi-env episode generation — shards over a 1-D
'data' mesh via NamedSharding; params and scene specs replicate. XLA
inserts the psum for gradient reduction automatically from the sharding
annotations (pjit model), so the same code runs on 1 chip, a v5p pod
slice, or the CPU-mesh test harness unchanged.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2d(n_data: int, n_model: int,
                 axes: tuple[str, str] = ("data", "model")) -> Mesh:
    """2-D (data x model) mesh. Lay the model axis along the FASTEST-varying
    device dimension: on real slices adjacent device ids share the closest
    ICI links, and the model axis carries the latency-sensitive per-layer
    collectives (all-gather / reduce-scatter of activations), while the
    data axis only reduces gradients once per step."""
    devs = jax.devices()
    need = n_data * n_model
    assert len(devs) >= need, f"need {need} devices, have {len(devs)}"
    return Mesh(np.array(devs[:need]).reshape(n_data, n_model), axes)


def shard_params_model(params, mesh: Mesh, axis: str = "model"):
    """Tensor-parallel placement for MLP parameter trees: 2-D kernels
    (in, out) shard their OUTPUT features along `axis`, matching 1-D
    biases shard along `axis`, everything else replicates. XLA propagates
    the activation sharding through the matmul and inserts the collectives
    (scaling-book Megatron layout: column-parallel linear; consecutive
    layers alternate via compiler-chosen resharding). Leaves whose feature
    dim does not divide the axis size replicate — correctness never
    depends on divisibility."""
    n = mesh.shape[axis]

    def put(x):
        if hasattr(x, "ndim") and x.ndim == 2 and x.shape[1] % n == 0:
            return jax.device_put(x, NamedSharding(mesh, P(None, axis)))
        if hasattr(x, "ndim") and x.ndim == 1 and x.shape[0] % n == 0 \
                and x.shape[0] > 0:
            return jax.device_put(x, NamedSharding(mesh, P(axis)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, params)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Shard every leaf's leading dimension across the mesh. Leading dims
    not divisible by the mesh size fall back to replication."""
    n = mesh.devices.size

    def put(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, NamedSharding(mesh, P(axis)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
