"""Farthest-point sampling as fixed-shape `lax.scan` kernels.

Replaces the reference's DGL ``farthest_point_sampler`` + radius-stop
``fps_rad_idx`` combination (src/dynamics/dataset/graph.py:8-36,
src/dynamics/utils.py:10-24, src/sim/utils.py:95-133). FPS is inherently
sequential; on TPU we express it as a scan whose body is one masked argmax +
one distance update over all N points — each step is a single fused VPU pass,
so K samples cost K bandwidth-bound sweeps and the whole thing jits, vmaps,
and differentiates away cleanly.

All functions are fixed-shape: invalid inputs are masked, and radius-stop
sampling returns a (max_n,) index buffer plus a validity mask instead of a
variable-length list.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = 1e10


@partial(jax.jit, static_argnames=("n_samples",))
def farthest_point_sampling(points, n_samples: int, start_idx=0, valid=None):
    """Classic FPS returning exactly `n_samples` indices.

    Args:
      points: (N, D) point cloud.
      n_samples: static sample count (<= N).
      start_idx: scalar index of the first sample.
      valid: optional (N,) bool mask; invalid points are never selected.

    Returns:
      idx: (n_samples,) int32 indices; maxdist: (n_samples,) the farthest
      remaining distance *before* each selection (maxdist[0] = +inf), which
      radius-stop variants use to derive validity.
    """
    points = jnp.asarray(points, dtype=jnp.float32)
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    start_idx = jnp.asarray(start_idx, dtype=jnp.int32)

    d0 = jnp.linalg.norm(points - points[start_idx], axis=-1)
    d0 = jnp.where(valid, d0, -_BIG)

    def body(carry, _):
        dist = carry
        nxt = jnp.argmax(dist)
        far = dist[nxt]
        d_new = jnp.linalg.norm(points - points[nxt], axis=-1)
        dist = jnp.minimum(dist, jnp.where(valid, d_new, -_BIG))
        return dist, (nxt, far)

    _, (rest_idx, rest_far) = jax.lax.scan(body, d0, None, length=n_samples - 1)
    idx = jnp.concatenate([start_idx[None], rest_idx.astype(jnp.int32)])
    maxdist = jnp.concatenate([jnp.array([jnp.inf], dtype=jnp.float32), rest_far])
    return idx, maxdist


@partial(jax.jit, static_argnames=("max_n",))
def fps_radius(points, radius, max_n: int, start_idx=0, valid=None):
    """Radius-stop FPS: sample until the farthest remaining point is within
    `radius` of the sampled set (reference fps_rad_idx semantics), fixed-shape.

    Returns (idx (max_n,), keep (max_n,) bool): keep[i] is True iff sample i
    would have been emitted by the variable-length reference loop.
    """
    idx, maxdist = farthest_point_sampling(points, max_n, start_idx, valid)
    # reference loop: while dist.max() > radius → the i-th extra sample exists
    # iff the farthest distance before selecting it exceeded the radius.
    keep = maxdist > jnp.asarray(radius, dtype=jnp.float32)
    return idx, keep


@partial(jax.jit, static_argnames=("max_n",))
def fps_subsample(points, max_n: int, radius, key, valid=None):
    """The full reference recipe (src/dynamics/dataset/graph.py:8-36):
    random-start FPS to `max_n`, then radius-stop FPS (new random start) over
    the downsampled set; composition of index maps.

    Args:
      points: (N, 3) raw particle positions (N >= max_n for faithful behavior;
        smaller clouds are handled by the valid mask).
      max_n: static cap (the reference max_nobj).
      radius: radius-stop threshold (scalar, may be traced).
      key: PRNG key driving both random starts.
      valid: optional (N,) mask over raw points.

    Returns:
      idx: (max_n,) indices into `points`; keep: (max_n,) validity mask.
      Invalid slots alias the first valid sample so gathered positions stay
      finite (callers zero them out via the mask when padding).
    """
    points = jnp.asarray(points, dtype=jnp.float32)
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    k1, k2 = jax.random.split(jnp.asarray(key))

    # stage 1: random-start FPS to max_n over the raw cloud
    nvalid = jnp.sum(valid)
    r1 = jax.random.randint(k1, (), 0, jnp.maximum(nvalid, 1))
    # map the draw onto the r1-th valid index
    order = jnp.argsort(~valid)  # valid indices first, stable
    start1 = order[r1]
    idx1, _ = farthest_point_sampling(points, max_n, start1, valid)
    sub = points[idx1]
    sub_valid = valid[idx1]
    # stage-1 duplicates appear when nvalid < max_n; mask them out of stage 2
    stage1_keep = jnp.arange(max_n) < jnp.minimum(nvalid, max_n)
    sub_valid = sub_valid & stage1_keep

    # stage 2: radius-stop FPS with a fresh random start over the subset
    n2 = jnp.sum(sub_valid)
    r2 = jax.random.randint(k2, (), 0, jnp.maximum(n2, 1))
    order2 = jnp.argsort(~sub_valid)
    start2 = order2[r2]
    idx2, keep = fps_radius(sub, radius, max_n, start2, sub_valid)
    keep = keep & sub_valid[idx2]

    final_idx = idx1[idx2]
    # compact: move kept samples to the front preserving selection order
    pos = jnp.argsort(~keep, stable=True)
    final_idx = final_idx[pos]
    keep = keep[pos]
    final_idx = jnp.where(keep, final_idx, final_idx[0])
    return final_idx, keep
