"""Batched GNN rollouts for planning.

Port of src/planning/forward_dynamics.py (dynamics :12-205, dynamics_masked
:209-399): decode (x, z, theta, length) actions into pusher segments, build
the planning graph with 1-point (rope/cloth) or 5-point (granular board)
pusher geometry, then roll the model `length` repeats of push_length —
re-building radius edges from the predicted state each repeat and sliding
the history window.

TPU-native structure: ONE per-sample rollout function, vmapped over the
entire MPPI population (the reference instead loops 40 sequential 500-sample
chunks, plan.py:241-247). The repeat loop is a `lax.fori_loop` to the
static max repeat count with masked recording at each sample's own repeat
index, so the whole population is a single XLA program shardable over the
mesh 'data' axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from adaptigraph_tpu.ops import build_edges_slotted as build_edges
from adaptigraph_tpu.planning.actions import decode_action


def _negz(x):
    """Mirror plan frame <-> flex frame (z negation; see make_batched_dynamics)."""
    return x.at[..., 2].multiply(-1.0)


def make_batched_dynamics(model, task_config, eef_y_mode: str = "min"):
    """Build the jitted population rollout.

    Args:
      model: DynamicsPredictor instance.
      task_config: planning task dict (config/planning/*.yaml schema).
        `n_sample_chunk` (the reference's 500-sample sequential chunking,
        plan.py:241-247) bounds LIVE activation memory: when the population
        exceeds it, the vmapped rollout runs as a `lax.map` over
        chunk-size sub-batches inside ONE jitted program — the 20k-sample
        slotmm population's (E, N) one-hot activations alone are ~8 GB,
        past v5e HBM (BENCH_r03's MPPI OOM).
      eef_y_mode: 'min' (planner rollouts, forward_dynamics.py:40) or
        'mean' (masked replay, :235,359).

    Returns:
      rollout(params, state (nobj, 3) or (S, nobj, 3), obj_mask, actions
      (S, n_look, 4), physics_param) -> dict with state_seqs
      (S, n_look, nobj, 3).
    """
    chunk_size = int(task_config.get("n_sample_chunk", 0) or 0)
    pusher_points = task_config["pusher_points"]
    n_pusher = len(pusher_points)
    sim_real_ratio = float(task_config["sim_real_ratio"])
    push_length = float(task_config["push_length"])
    adj_thresh = float(task_config["adj_thresh"])
    topk = int(task_config["topk"])
    cta = bool(task_config["connect_tools_all"])
    max_nR = int(task_config["max_nR"])
    n_his = int(task_config["n_his"])
    gripper = bool(task_config.get("gripper_enable", False))
    max_repeat = int(task_config["action_upper_lim"][3])
    # board sample offsets along the pusher width (forward_dynamics.py:60-75)
    offs = jnp.array([float(p[1]) for p in pusher_points]) * sim_real_ratio

    def eef_geometry(decoded, theta, y):
        """(n_pusher, 3) pusher keypoints + (n_pusher, 3) per-step delta."""
        xs, zs, xe, ze = decoded[0], decoded[1], decoded[2], decoded[3]
        delta = jnp.stack([xe - xs, jnp.zeros_like(xs), ze - zs])
        if n_pusher == 1:
            kp = jnp.stack([xs, y, zs])[None, :]
        else:
            px = xs + offs * jnp.sin(theta)
            pz = zs - offs * jnp.cos(theta)
            kp = jnp.stack([px, jnp.full_like(px, y), pz], axis=-1)
        if gripper:
            kp = kp + jnp.array([0.0, 0.01 * sim_real_ratio, 0.0])
        return kp, jnp.tile(delta[None, :], (n_pusher, 1))

    def obj_y(pred, mask):
        if eef_y_mode == "min":
            return jnp.min(jnp.where(mask, pred[:, 1], 1e9))
        return jnp.sum(pred[:, 1] * mask) / jnp.maximum(jnp.sum(mask), 1)

    def rollout_one(params, state, mask, acts, physics):
        nobj = state.shape[0]
        n_look = acts.shape[0]
        n = nobj + n_pusher
        maskf = mask.astype(jnp.float32)
        attrs = jnp.zeros((n, 2))
        attrs = attrs.at[:nobj, 0].set(maskf)
        attrs = attrs.at[nobj:, 1].set(1.0)
        p_instance = maskf[:, None]
        state_mask = jnp.concatenate([mask, jnp.ones(n_pusher, bool)])
        eef_mask = jnp.concatenate([jnp.zeros(nobj, bool), jnp.ones(n_pusher, bool)])

        decoded_all, repeats_all = decode_action(acts, push_length)

        obj_kp = jnp.tile(state[None], (n_his, 1, 1))
        preds = []
        for li in range(n_look):
            decoded, repeats = decoded_all[li], repeats_all[li]
            y = obj_y(obj_kp[-1], mask)
            eef_kp, eef_delta = eef_geometry(decoded, acts[li, 2], y)
            states = jnp.concatenate(
                [obj_kp, jnp.tile(eef_kp[None], (n_his, 1, 1))], axis=1)
            delta = jnp.zeros((n, 3)).at[nobj:].set(eef_delta)
            # slotted builder: same edge set as build_edges, no O(N^2 log N)
            # compaction sort (capacity N*topk + tool slots, not max_nR)
            edges = build_edges(states[-1], adj_thresh, state_mask, eef_mask,
                                topk=topk, connect_tools_all=cta,
                                tools_only_when_near=True)

            def body(ai, carry):
                hist, edges_c, pred_rec = carry
                # The planner works in the PLAN frame (flex z negated,
                # plan.py flex_to_plan) but the GNN is trained purely on
                # FLEX-frame episodes; an MLP message net is not
                # parity-equivariant, and feeding mirrored geometry runs it
                # out of distribution (measured: 2.1x the validation MSE,
                # worse than predicting zero motion — r4 PPO pinning at the
                # -0.2 bound). Mirror in/out at the model boundary: edges
                # were built from plan-frame states but distances are
                # mirror-invariant, so the same index lists apply.
                pred, _ = model.apply(
                    {"params": params}, _negz(hist), attrs, edges_c[0],
                    edges_c[1], edges_c[2], p_instance, physics,
                    action=_negz(delta))
                pred = _negz(pred)
                pred = jnp.where(mask[:, None], pred, 0.0)
                pred_rec = jnp.where(repeats == ai, pred, pred_rec)
                y_cur = obj_y(pred, mask)
                eef_cur = hist[-1, nobj:] + delta[nobj:]
                eef_cur = eef_cur.at[:, 1].set(
                    y_cur + (0.01 * sim_real_ratio if gripper else 0.0))
                states_cur = jnp.concatenate([pred, eef_cur], axis=0)
                e = build_edges(states_cur, adj_thresh, state_mask, eef_mask,
                                topk=topk, connect_tools_all=cta,
                                tools_only_when_near=True)
                hist = jnp.concatenate([hist[1:], states_cur[None]], axis=0)
                return hist, (e.receivers, e.senders, e.valid), pred_rec

            carry = (states, (edges.receivers, edges.senders, edges.valid),
                     obj_kp[-1])
            _, _, pred_li = jax.lax.fori_loop(1, max_repeat + 1, body, carry)
            preds.append(pred_li)
            obj_kp = jnp.tile(pred_li[None], (n_his, 1, 1))
        return jnp.stack(preds)  # (n_look, nobj, 3)

    @jax.jit
    def rollout(params, state, obj_mask, actions, physics_param):
        s = actions.shape[0]
        if state.ndim == 2:  # shared current state across the population
            state_b = jnp.tile(state[None], (s, 1, 1))
            mask_b = jnp.tile(obj_mask[None], (s, 1))
        else:
            state_b, mask_b = state, obj_mask
        if physics_param.ndim == 1:
            phys_b = jnp.tile(physics_param[None], (s, 1))
        else:
            phys_b = physics_param

        def run(args):
            sb, mb, ab, pb = args
            return jax.vmap(rollout_one, in_axes=(None, 0, 0, 0, 0))(
                params, sb, mb, ab, pb)

        if chunk_size and s > chunk_size:
            # pad the population to the next chunk multiple (repeat sample
            # 0; outputs sliced back below) — a non-divisible population
            # must NOT silently fall back to one full vmap, which re-opens
            # the ~8 GB live-activation OOM the chunking bounds
            # (BENCH_r03; ADVICE r4 #2)
            pad = (-s) % chunk_size
            k = (s + pad) // chunk_size

            def resh(x):
                if pad:
                    x = jnp.concatenate(
                        [x, jnp.tile(x[:1], (pad,) + (1,) * (x.ndim - 1))],
                        axis=0)
                return x.reshape((k, chunk_size) + x.shape[1:])

            seqs = jax.lax.map(run, (resh(state_b), resh(mask_b),
                                     resh(actions), resh(phys_b)))
            seqs = seqs.reshape((s + pad,) + seqs.shape[2:])[:s]
        else:
            seqs = run((state_b, mask_b, actions, phys_b))
        decoded, _ = decode_action(actions, push_length)
        return {"state_seqs": seqs, "action_seqs": decoded}

    return rollout


def make_masked_replay(model, task_config):
    """dynamics_masked equivalent (forward_dynamics.py:209-399): replay a set
    of logged interactions — per-sample initial states, masks and single
    actions — under a candidate physics parameter. Used by the physics-param
    online optimizer."""
    base = make_batched_dynamics(model, task_config, eef_y_mode="mean")

    @jax.jit
    def replay(params, state_init, state_mask, actions, physics_param):
        out = base(params, state_init, state_mask, actions[:, None, :], physics_param)
        return {"state_seqs": out["state_seqs"][:, 0],
                "action_seqs": out["action_seqs"][:, 0]}

    return replay
