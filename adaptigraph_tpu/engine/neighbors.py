"""Particle neighbor search.

The NvFlex solver's hash-grid neighbor find (closed source; invoked inside
NvFlexUpdateSolver, see SURVEY.md §3.5) becomes a fixed-K neighbor list.

Two strategies:
  * `neighbor_list` — dense masked top-k. One (N, N) distance computation
    (difference form for N<=2048 tiles, accurate) + `lax.top_k`. For the
    particle counts of the reference scenes (hundreds to a few thousand)
    this is MXU/VPU-bound and far faster than pointer-chasing a hash grid
    on TPU.
  * `neighbor_list_tiled` — same result computed in (TILE, N) row blocks via
    `lax.map`, bounding peak memory to O(TILE*N) so 20k-50k particles fit
    comfortably in HBM/VMEM. This is the scalable path the Pallas kernel
    will later fuse.

Both return (idx (N, K) int32, valid (N, K) bool) with self and inactive
particles excluded; pairs beyond `radius` are invalid.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = 1e10


def _row_block_neighbors(pos_block, pos_all, row_ids, active_all, radius, k):
    """Top-k nearest for a block of query rows. pos_block: (T, 3)."""
    diff = pos_block[:, None, :] - pos_all[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)  # (T, N)
    n = pos_all.shape[0]
    col_ids = jnp.arange(n)[None, :]
    invalid = (~active_all)[None, :] | (col_ids == row_ids[:, None])
    d2 = jnp.where(invalid, _BIG, d2)
    keff = min(k, n)
    neg, idx = jax.lax.top_k(-d2, keff)
    valid = (-neg) < radius * radius
    if keff < k:  # tiny scenes: pad the neighbor axis to the requested K
        t = pos_block.shape[0]
        idx = jnp.concatenate([idx, jnp.zeros((t, k - keff), idx.dtype)], axis=1)
        valid = jnp.concatenate([valid, jnp.zeros((t, k - keff), bool)], axis=1)
    return idx.astype(jnp.int32), valid


@partial(jax.jit, static_argnames=("k",))
def neighbor_list(pos, radius, active, k: int = 32):
    """Dense fixed-K neighbor list.

    Args:
      pos: (N, 3) positions. radius: scalar cutoff. active: (N,) mask.
      k: static neighbor cap (FleX maxParticleNeighbors analogue).
    Returns: (idx, valid) each (N, K).
    """
    n = pos.shape[0]
    row_ids = jnp.arange(n)
    idx, valid = _row_block_neighbors(pos, pos, row_ids, active, radius, k)
    valid = valid & active[:, None]
    idx = jnp.where(valid, idx, 0)
    return idx, valid


@partial(jax.jit, static_argnames=("k", "tile"))
def neighbor_list_tiled(pos, radius, active, k: int = 32, tile: int = 1024):
    """Memory-bounded variant: processes rows in `tile`-sized blocks so the
    distance matrix never exceeds (tile, N)."""
    n = pos.shape[0]
    pad = (-n) % tile
    pos_p = jnp.pad(pos, ((0, pad), (0, 0)))
    act_p = jnp.pad(active, (0, pad))
    rows = jnp.arange(n + pad).reshape(-1, tile)

    def block(r):
        return _row_block_neighbors(pos_p[r], pos, r, active, radius, k)

    idx, valid = jax.lax.map(block, rows)
    idx = idx.reshape(-1, k)[:n]
    valid = valid.reshape(-1, k)[:n] & act_p[:n, None]
    idx = jnp.where(valid, idx, 0)
    return idx, valid
