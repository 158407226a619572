"""Spatial-hash cell-list neighbor search — the scalable O(N·K) pipeline.

The NvFlex solver finds neighbors with a GPU hash grid inside
NvFlexUpdateSolver (closed source; SURVEY.md §3.5 "hash-grid neighbors").
This is the TPU-native equivalent, replacing the O(N²) masked top-k in
engine/neighbors.py above a few thousand particles:

  1. bin: cell coords = floor(pos / cell_size); hash each cell into a
     power-of-two table (no scene bounds needed — aliased cells only add
     distance-filtered false candidates);
  2. bucket: one `argsort` over hashes groups co-cell particles; each
     particle's rank within its cell comes from a `searchsorted`, and a
     single scatter builds a dense (table, bucket) -> particle index map;
  3. query: gather the 27-cell stencil's buckets (27·B candidates/row),
     dedup stencil cells that alias to the same hash (sorted-row compare),
     distance-filter, and `top_k` down to the fixed K neighbor list.

Everything is fixed-shape: table size, bucket depth, stencil, and K are
static, so the whole build is one fused XLA program — one sort + a few
gathers per outer sim frame, instead of an O(N²) sweep per solver
iteration. Output contract matches neighbors.neighbor_list:
(idx (N, K) int32, valid (N, K) bool), self/inactive excluded, pairs
beyond `radius` invalid.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e10
# 3x3x3 stencil offsets, precomputed host-side
_STENCIL = np.array([(dx, dy, dz)
                     for dx in (-1, 0, 1)
                     for dy in (-1, 0, 1)
                     for dz in (-1, 0, 1)], dtype=np.int32)  # (27, 3)
_P1, _P2, _P3 = 73856093, 19349663, 83492791  # classic spatial-hash primes


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 1).bit_length()


def _hash_cells(cell, table_size):
    """cell: (..., 3) int32 -> hash in [0, table_size). table_size pow2."""
    h = (cell[..., 0] * _P1) ^ (cell[..., 1] * _P2) ^ (cell[..., 2] * _P3)
    return h & (table_size - 1)


@partial(jax.jit, static_argnames=("k", "bucket_size", "table_size"))
def cell_list_neighbors(pos, radius, active, k: int = 24, bucket_size: int = 8,
                        table_size: int | None = None):
    """Fixed-K neighbor list via a hashed cell grid.

    Args:
      pos: (N, 3) positions. radius: scalar search cutoff (the cell edge).
      active: (N,) mask. k: static neighbor cap.
      bucket_size: static max particles stored per cell (overflow drops the
        extras — size it ≥ the densest packing: ~5 at rest for cell edge
        1.5x the particle spacing, so 8 leaves headroom; see
        cell_bucket_overflow for a diagnostic).
      table_size: hash table rows (power of two; default ≥ 2N).

    Returns: (idx (N, K) int32, valid (N, K) bool).
    """
    n = pos.shape[0]
    # 4N rows keeps the chance of two occupied cells aliasing (which merges
    # their buckets and can overflow `bucket_size`) low; 8 B/row is cheap
    table = table_size or _next_pow2(4 * n)
    inv_cell = 1.0 / radius
    cell = jnp.floor(pos * inv_cell).astype(jnp.int32)  # (N, 3)
    h = jnp.where(active, _hash_cells(cell, table), table)  # inactive -> trash row

    # ---- build the (table+1, B) bucket map with one sort ----
    order = jnp.argsort(h)  # (N,) particle ids grouped by cell hash
    h_sorted = h[order]
    first = jnp.searchsorted(h_sorted, h_sorted, side="left")
    rank = jnp.arange(n, dtype=first.dtype) - first  # rank within the cell
    in_bucket = (rank < bucket_size) & (h_sorted < table)
    row = jnp.where(in_bucket, h_sorted, table)
    slot = jnp.clip(rank, 0, bucket_size - 1)
    buckets = jnp.full((table + 1, bucket_size), n, dtype=jnp.int32)
    buckets = buckets.at[row, slot].set(jnp.where(in_bucket, order, n))

    # ---- query the 27-cell stencil ----
    stencil = jnp.asarray(_STENCIL)  # (27, 3)
    h27 = _hash_cells(cell[:, None, :] + stencil[None], table)  # (N, 27)
    # two stencil cells may alias to the same hash row: visiting the row
    # twice would duplicate every pair, so dedup per row via a sorted pass
    h27s = jnp.sort(h27, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((n, 1), bool), h27s[:, 1:] == h27s[:, :-1]], axis=1)
    cand = buckets[h27s]  # (N, 27, B)
    cand = jnp.where(dup[..., None], n, cand).reshape(n, 27 * bucket_size)

    # ---- distance filter + top-k ----
    cand_ok = cand < n
    cand_safe = jnp.where(cand_ok, cand, 0)
    d = pos[:, None, :] - pos[cand_safe]  # (N, 27B, 3)
    d2 = jnp.sum(d * d, axis=-1)
    me = jnp.arange(n, dtype=cand.dtype)[:, None]
    eligible = cand_ok & (cand_safe != me) & (d2 < radius * radius)
    d2 = jnp.where(eligible, d2, _BIG)
    keff = min(k, cand.shape[1])
    neg, col = jax.lax.top_k(-d2, keff)
    idx = jnp.take_along_axis(cand_safe, col, axis=1)
    valid = (-neg) < _BIG * 0.5
    if keff < k:
        idx = jnp.concatenate([idx, jnp.zeros((n, k - keff), idx.dtype)], axis=1)
        valid = jnp.concatenate([valid, jnp.zeros((n, k - keff), bool)], axis=1)
    valid = valid & active[:, None]
    idx = jnp.where(valid, idx, 0)
    return idx.astype(jnp.int32), valid


def morton_order(pos, cell: float = 0.05):
    """Host-side (numpy) Morton/Z-order permutation of a point cloud.

    Scene builders emit spatially coherent particle orders (chains, grids)
    which the block-sparse contact sweep's tile-AABB culling
    (pallas_kernels.tile_overlap_blocks) relies on; use this to pre-sort
    arbitrary clouds at scene-build time. Returns the permutation indices —
    remember to remap spring/cluster indices through it."""
    p = np.asarray(pos)
    q = np.floor((p - p.min(axis=0)) / cell).astype(np.uint64)
    q = np.minimum(q, (1 << 21) - 1)

    def spread(x):
        x &= 0x1FFFFF
        x = (x | (x << 32)) & 0x1F00000000FFFF
        x = (x | (x << 16)) & 0x1F0000FF0000FF
        x = (x | (x << 8)) & 0x100F00F00F00F00F
        x = (x | (x << 4)) & 0x10C30C30C30C30C3
        x = (x | (x << 2)) & 0x1249249249249249
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    return np.argsort(code, kind="stable")


@partial(jax.jit, static_argnames=("bucket_size", "table_size"))
def cell_bucket_overflow(pos, radius, active, bucket_size: int = 8,
                         table_size: int | None = None):
    """Diagnostic: how many active particles fail to fit their cell bucket
    (those silently lose *being found by* the stencil; they still find their
    own neighbors). Keep this 0 by sizing bucket_size to the scene."""
    n = pos.shape[0]
    table = table_size or _next_pow2(4 * n)
    cell = jnp.floor(pos / radius).astype(jnp.int32)
    h = jnp.where(active, _hash_cells(cell, table), table)
    h_sorted = jnp.sort(h)
    first = jnp.searchsorted(h_sorted, h_sorted, side="left")
    rank = jnp.arange(n) - first
    return jnp.sum((rank >= bucket_size) & (h_sorted < table))
