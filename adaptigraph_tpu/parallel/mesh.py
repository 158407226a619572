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
