"""Planning reward assembly: target costs + collision/workspace penalties.

Port of src/planning/losses.py:26-92 and the reward assembly in
src/planning/plan.py:27-59 — chamfer-to-target-pointcloud or box-distance
error, material-specific pusher-through-object collision penalties, and a
keep-inside-workspace bbox penalty, combined as
reward = -w_err * error - 5 * collision - 5 * box_penalty.
All pure jnp, vmappable over the MPPI population.
"""

from __future__ import annotations

import jax.numpy as jnp

from adaptigraph_tpu.ops import box_loss, chamfer


def rope_penalty(state_pred, action, state_init, sim_real_ratio: float = 10.0):
    """Pusher-spawn collision penalty (losses.py:37-48): exp(-d*100) is
    maximal when the push START point lies on/inside the rope — the pusher
    would teleport into the object — and decays to zero a couple of
    pusher-radii away. The planner therefore prefers pushes that start just
    outside the object and sweep through it."""
    bsz, n_look, _ = action.shape
    pt = action[..., :2]  # (bsz, n_look, 2) start xz
    state_2d = jnp.concatenate(
        [jnp.tile(state_init[None, None, :, [0, 2]], (bsz, 1, 1, 1)),
         state_pred[:, :-1][..., [0, 2]]], axis=1)
    d = jnp.linalg.norm(pt[:, :, None] - state_2d, axis=-1).min(axis=-1)
    pusher_size = 0.02 * sim_real_ratio
    d = jnp.maximum(d - pusher_size, 0.0)
    return jnp.exp(-d * 100.0)


def cloth_penalty(state_pred, action, state_init, sim_real_ratio: float = 10.0):
    """Grasp-point feasibility for cloth (losses.py:50-64)."""
    bsz, n_look, _ = action.shape
    pt = action[..., :2]
    state_2d = state_init[:, [0, 2]]
    d = jnp.linalg.norm(pt[:, :, None] - state_2d[None, None], axis=-1)
    dmin = d.min(axis=-1)
    pusher_size = 0.005 * sim_real_ratio
    dmin = jnp.maximum(dmin - pusher_size, 0.0)
    dmax = jnp.minimum(d.max(axis=-1), 0.4 * sim_real_ratio)
    dmax = dmax / (jnp.max(dmax) + 1e-9)
    return 1.0 - jnp.exp(-dmin * 100.0) - dmax * 0.2


def granular_penalty(state_pred, action, state_init, sim_real_ratio: float = 10.0):
    """Board-pusher collision: 9 sample points across the board width
    (losses.py:66-92)."""
    bsz, n_look, _ = action.shape
    x, z, theta = action[..., 0], action[..., 1], action[..., 2]
    r = 0.05 * sim_real_ratio
    dx = r * jnp.sin(theta)
    dz = -r * jnp.cos(theta)
    fr = jnp.linspace(-1.0, 1.0, 9)
    px = x[..., None] + fr * dx[..., None]
    pz = z[..., None] + fr * dz[..., None]
    pts = jnp.stack([px, pz], axis=-1)  # (bsz, n_look, 9, 2)
    state_2d = jnp.concatenate(
        [jnp.tile(state_init[None, None, :, [0, 2]], (bsz, 1, 1, 1)),
         state_pred[:, :-1][..., [0, 2]]], axis=1)
    d = jnp.linalg.norm(pts[:, :, :, None] - state_2d[:, :, None], axis=-1)
    d = d.min(axis=-1).min(axis=-1)
    pusher_size = 0.02 * sim_real_ratio
    d = jnp.maximum(d - pusher_size, 0.0)
    return jnp.exp(-d * 100.0)


PENALTIES = {"rope": rope_penalty, "cloth": cloth_penalty, "granular": granular_penalty}


def make_error_fn(task_config, target_state=None, target_box=None):
    """error_func(state (B, N, 3)) -> (B,) per plan.py target handling."""
    if task_config["target_type"] == "box":
        box = jnp.asarray(target_box if target_box is not None
                          else task_config["target"], dtype=jnp.float32)
        box = box.reshape(2, 2)

        def err(state, mask=None):
            return box_loss(state, box)
    else:
        tgt = jnp.asarray(target_state, dtype=jnp.float32)

        def err(state, mask=None):
            # (1, M, 3) broadcasts against (B, N, 3) inside chamfer — no
            # per-sample tile of the target
            return chamfer(state, tgt[None], x_mask=mask)
    return err


def running_cost_parts(state, action, state_cur, error_func, penalty_func,
                       bbox, obj_mask=None):
    """Per-sample raw cost quantities (the population-independent half of the
    plan.py:27-59 reward assembly). Shapes: state (bsz, n_look, N, 3), action
    (bsz, n_look, 4), state_cur (N, 3), bbox (2, 2). Returns a dict of (bsz,)
    arrays; `error_max` is max over look steps (kept separately so the
    population-wide error_weight normalization in `assemble_reward` matches
    the unchunked reward exactly even when this runs per lax.map chunk)."""
    bsz, n_look = state.shape[0], state.shape[1]
    flat = state.reshape(bsz * n_look, state.shape[2], 3)
    mask_flat = None
    if obj_mask is not None:
        mask_flat = jnp.tile(obj_mask[None], (bsz * n_look, 1))
    error = error_func(flat, mask_flat).reshape(bsz, n_look)

    collision = penalty_func(state, action, state_cur)

    big = 1e6
    if obj_mask is not None:
        m = obj_mask[None, None, :, None]
        lo_state = jnp.where(m, state, big)
        hi_state = jnp.where(m, state, -big)
    else:
        lo_state, hi_state = state, state
    xmin = lo_state.min(axis=2)[..., 0]
    zmin = lo_state.min(axis=2)[..., 2]
    xmax = hi_state.max(axis=2)[..., 0]
    zmax = hi_state.max(axis=2)[..., 2]
    box_pen = jnp.stack([
        jnp.maximum(xmin - bbox[0, 0], 0.0),
        jnp.maximum(bbox[0, 1] - xmax, 0.0),
        jnp.maximum(zmin - bbox[1, 0], 0.0),
        jnp.maximum(bbox[1, 1] - zmax, 0.0),
    ], axis=-1)
    box_pen = jnp.exp(-box_pen * 100.0).max(axis=-1)

    return {"error": error[:, -1],
            "error_max": jnp.max(error, axis=1),
            "collision": collision.mean(axis=1),
            "box_pen": box_pen.mean(axis=1)}


def assemble_reward(parts):
    """Population-wide reward from per-sample parts: the 2/max(error) weight
    self-normalizes over the WHOLE population (plan.py:44), so it must be
    applied after all chunks land."""
    error_weight = 2.0 / (jnp.max(parts["error_max"]) + 1e-6)
    reward = (-error_weight * parts["error"] - 5.0 * parts["collision"]
              - 5.0 * parts["box_pen"])
    return {"reward_seqs": reward, "error_seqs": parts["error"]}


def running_cost(state, action, state_cur, error_func, penalty_func, bbox,
                 obj_mask=None):
    """Reward assembly (plan.py:27-59).

    state: (bsz, n_look, N, 3) predicted states; action: (bsz, n_look, 4);
    state_cur: (N, 3); bbox: (2, 2) workspace box. Returns {'reward_seqs'}."""
    return assemble_reward(running_cost_parts(
        state, action, state_cur, error_func, penalty_func, bbox,
        obj_mask=obj_mask))


def chunked_cost(state, action, state_cur, error_func, penalty_func, bbox,
                 obj_mask=None, n_chunk=0):
    """`running_cost` with the sample axis bounded by lax.map chunking.

    With a pcd target the chamfer distance materializes a
    (bsz*n_look, N, M) block — at the planner's 20k population x
    max_nobj 200 x ~400-point recorded target that is ~18 GB and
    compile-OOMs v5e HBM (r5f rope acceptance post-mortem). Mirrors the
    rollout-side `n_sample_chunk` bound in forward_dynamics.py: pad the
    population to the chunk multiple, lax.map `running_cost_parts` over
    chunk-size sub-batches (peak = one chunk), then apply the population-
    wide error_weight normalization globally so rewards are bit-comparable
    with the unchunked path."""
    s = state.shape[0]
    if not n_chunk or s <= n_chunk:
        return running_cost(state, action, state_cur, error_func,
                            penalty_func, bbox, obj_mask=obj_mask)
    import jax

    pad = (-s) % n_chunk
    k = (s + pad) // n_chunk

    def resh(x):
        if pad:
            x = jnp.concatenate(
                [x, jnp.tile(x[:1], (pad,) + (1,) * (x.ndim - 1))], axis=0)
        return x.reshape((k, n_chunk) + x.shape[1:])

    parts = jax.lax.map(
        lambda ab: running_cost_parts(ab[0], ab[1], state_cur, error_func,
                                      penalty_func, bbox, obj_mask=obj_mask),
        (resh(state), resh(action)))
    parts = {kk: v.reshape(-1)[:s] for kk, v in parts.items()}
    return assemble_reward(parts)
