"""Point-set distances used for evaluation and planning costs.

Reference: src/dynamics/gnn/loss.py (ChamferLoss :4, EarthMoverLoss :25,
HausdorffLoss :63) and src/planning/losses.py (chamfer :4, mean_chamfer :12,
box_loss :26). The torch versions materialize (B, M, N, D) broadcasts and use
scipy's Hungarian solver on host; here every distance matrix is computed with
one fused (B, M, N) reduction and EMD is on-device Sinkhorn so planning
rewards never leave the TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = 1e10


def _pairwise_dist(x, y):
    """(..., N, M) Euclidean distances between x (..., N, D) and y (..., M, D).

    Direct difference form: for the graph sizes in play (N, M <= a few
    hundred) the (N, M, 3) intermediate is tiny, and it avoids the
    catastrophic cancellation of the |x|^2+|y|^2-2xy matmul trick that the
    min-reductions downstream would amplify.
    """
    diff = x[..., :, None, :] - y[..., None, :, :]
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)


def chamfer(x, y, x_mask=None, y_mask=None):
    """Symmetric chamfer distance, mean-aggregated per set, masked.

    x: (..., N, D), y: (..., M, D); returns (...,). Matches reference
    planning.losses.chamfer (mean-of-min both directions, summed).
    """
    d = _pairwise_dist(x, y)
    if y_mask is not None:
        d = jnp.where(y_mask[..., None, :], d, _BIG)
    if x_mask is not None:
        d = jnp.where(x_mask[..., :, None], d, _BIG)
    min_xy = jnp.min(d, axis=-1)  # (..., N) nearest y for each x
    min_yx = jnp.min(d, axis=-2)  # (..., M)
    if x_mask is not None:
        nx = jnp.maximum(jnp.sum(x_mask, axis=-1), 1)
        dis_xy = jnp.sum(jnp.where(x_mask, min_xy, 0.0), axis=-1) / nx
    else:
        dis_xy = jnp.mean(min_xy, axis=-1)
    if y_mask is not None:
        ny = jnp.maximum(jnp.sum(y_mask, axis=-1), 1)
        dis_yx = jnp.sum(jnp.where(y_mask, min_yx, 0.0), axis=-1) / ny
    else:
        dis_yx = jnp.mean(min_yx, axis=-1)
    return dis_xy + dis_yx


@jax.jit
def masked_chamfer(state_pred, state_real, pred_mask, real_mask):
    """Batched masked chamfer (reference mean_chamfer, losses.py:12-24) —
    fully on-device instead of a python loop over the batch."""
    return chamfer(state_pred, state_real, pred_mask, real_mask)


def hausdorff(x, y, x_mask=None, y_mask=None):
    """Symmetric Hausdorff distance (reference gnn/loss.py:63)."""
    d = _pairwise_dist(x, y)
    if y_mask is not None:
        d = jnp.where(y_mask[..., None, :], d, _BIG)
    if x_mask is not None:
        d = jnp.where(x_mask[..., :, None], d, _BIG)
    min_xy = jnp.min(d, axis=-1)
    min_yx = jnp.min(d, axis=-2)
    if x_mask is not None:
        min_xy = jnp.where(x_mask, min_xy, -_BIG)
    if y_mask is not None:
        min_yx = jnp.where(y_mask, min_yx, -_BIG)
    return jnp.maximum(jnp.max(min_xy, axis=-1), jnp.max(min_yx, axis=-1))


@partial(jax.jit, static_argnames=("iters",))
def earth_mover_distance(x, y, x_mask=None, y_mask=None, eps: float = 0.01, iters: int = 50):
    """Entropy-regularized EMD via Sinkhorn iterations.

    The reference solves exact assignment with scipy's Hungarian algorithm on
    host (gnn/loss.py:25-61) — O(N^3) and unbatchable. Sinkhorn runs as a
    fixed-length scan of (N, M) matvecs on device and converges to the same
    transport cost as eps -> 0.
    """
    d = _pairwise_dist(x, y)
    n, m = d.shape[-2], d.shape[-1]
    if x_mask is None:
        x_mask = jnp.ones(d.shape[:-1], dtype=bool)
    if y_mask is None:
        y_mask = jnp.ones(d.shape[:-2] + (m,), dtype=bool)
    a = x_mask.astype(d.dtype)
    a = a / jnp.maximum(jnp.sum(a, axis=-1, keepdims=True), 1)
    b = y_mask.astype(d.dtype)
    b = b / jnp.maximum(jnp.sum(b, axis=-1, keepdims=True), 1)

    log_k = -d / eps
    log_k = jnp.where(x_mask[..., :, None] & y_mask[..., None, :], log_k, -_BIG)
    log_a = jnp.where(a > 0, jnp.log(jnp.maximum(a, 1e-30)), -_BIG)
    log_b = jnp.where(b > 0, jnp.log(jnp.maximum(b, 1e-30)), -_BIG)

    def body(carry, _):
        f, g = carry
        f = log_a - jax.scipy.special.logsumexp(log_k + g[..., None, :], axis=-1)
        g = log_b - jax.scipy.special.logsumexp(log_k + f[..., :, None], axis=-2)
        f = jnp.where(x_mask, f, -_BIG)
        g = jnp.where(y_mask, g, -_BIG)
        return (f, g), None

    init = (jnp.zeros_like(a), jnp.zeros_like(b))
    (f, g), _ = jax.lax.scan(body, init, None, length=iters)
    plan = jnp.exp(jnp.clip(log_k + f[..., :, None] + g[..., None, :], -80.0, 80.0))
    return jnp.sum(plan * jnp.where(d >= _BIG, 0.0, d), axis=(-2, -1))


def box_loss(state, target):
    """Distance of each particle to an axis-aligned xz target box, averaged.

    state: (B, N, 3); target: (2, 2) [[xmin, xmax], [zmin, zmax]] —
    reference planning.losses.box_loss (losses.py:26-35).
    """
    xmin, xmax = target[0, 0], target[0, 1]
    zmin, zmax = target[1, 0], target[1, 1]
    x, z = state[..., 0], state[..., 2]
    x_diff = jnp.maximum(xmin - x, 0.0) + jnp.maximum(x - xmax, 0.0)
    z_diff = jnp.maximum(zmin - z, 0.0) + jnp.maximum(z - zmax, 0.0)
    return jnp.mean(jnp.sqrt(x_diff**2 + z_diff**2 + 1e-12), axis=-1)
