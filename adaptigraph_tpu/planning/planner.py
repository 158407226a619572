"""MPPI trajectory optimizer.

Port of src/planning/real_world/planner.py:38-326 with the TPU redesign
called for in SURVEY.md §7: the reference splits its 20 000-sample
population into 40 sequential 500-sample chunks (plan.py:179-182,241-247);
here the WHOLE population is one vmapped rollout + one reward evaluation per
MPPI iteration, shardable over the device mesh via the batch's leading axis.

Supported planner types: 'MPPI' (sample -> rollout -> softmax update, track
the best sample across iterations, optionally re-rollout the best) and 'GD'
(Adam ascent on the reward through the differentiable rollout). `merge_res`
is kept for API parity with chunked callers.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from adaptigraph_tpu.planning.actions import (
    clip_actions,
    optimize_action_mppi,
    sample_action_seq,
)


class Planner:
    """config keys (planner.py:40-116): action_dim, model_rollout_fn,
    evaluate_traj_fn, n_sample, n_look_ahead, n_update_iter, reward_weight,
    action_lower_lim, action_upper_lim, planner_type; optional noise_level,
    push_length, rollout_best, lr, verbose."""

    def __init__(self, config):
        self.cfg = config
        self.model_rollout = config["model_rollout_fn"]
        self.evaluate_traj = config["evaluate_traj_fn"]
        self.n_sample = int(config["n_sample"])
        self.n_look_ahead = int(config["n_look_ahead"])
        self.n_update_iter = int(config["n_update_iter"])
        self.reward_weight = float(config["reward_weight"])
        self.lower = jnp.asarray(config["action_lower_lim"], jnp.float32)
        self.upper = jnp.asarray(config["action_upper_lim"], jnp.float32)
        self.planner_type = config.get("planner_type", "MPPI")
        self.noise_level = float(config.get("noise_level", 0.3))
        self.push_length = float(config.get("push_length", 0.10))
        self.rollout_best = bool(config.get("rollout_best", True))
        self.lr = float(config.get("lr", 1e-3))
        self.verbose = bool(config.get("verbose", False))
        # optional jax.sharding.Mesh: the sample population's leading axis
        # shards across it (the TPU substitute for the reference's 40
        # sequential 500-sample chunks, plan.py:179-182,241-247); params and
        # state_cur replicate, XLA inserts the collectives for the softmax
        # reduction in optimize_action_mppi
        self.mesh = config.get("mesh")

    def _spread(self, act_seqs):
        if self.mesh is None:
            return act_seqs
        from adaptigraph_tpu.parallel.mesh import shard_batch

        return shard_batch(act_seqs, self.mesh)

    def trajectory_optimization(self, state_cur, act_seq, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        if self.planner_type == "MPPI":
            return self._mppi(state_cur, act_seq, key)
        if self.planner_type == "GD":
            return self._gd(state_cur, act_seq, key)
        raise ValueError(f"unknown planner type {self.planner_type}")

    def _mppi(self, state_cur, act_seq, key):
        best_act, best_reward = None, -jnp.inf
        act_seq = jnp.asarray(act_seq, jnp.float32)
        model_outputs, eval_outputs = [], []
        for i in range(self.n_update_iter):
            key, sub = jax.random.split(key)
            act_seqs = sample_action_seq(act_seq, self.lower, self.upper,
                                         self.n_sample, sub, iter_index=i,
                                         noise_level=self.noise_level,
                                         push_length=self.push_length)
            act_seqs = self._spread(act_seqs)
            model_out = self.model_rollout(state_cur, act_seqs)
            eval_out = self.evaluate_traj(model_out["state_seqs"], act_seqs,
                                          state_cur=state_cur)
            rewards = eval_out["reward_seqs"]
            act_seq = optimize_action_mppi(act_seqs, rewards, self.reward_weight,
                                           self.lower, self.upper, self.push_length)
            bi = int(jnp.argmax(rewards))
            if best_act is None or float(rewards[bi]) > float(best_reward):
                best_act = act_seqs[bi]
                best_reward = rewards[bi]
            if self.verbose:
                model_outputs.append(model_out)
                eval_outputs.append(eval_out)

        act_seq = best_act
        best_model_out = best_eval_out = None
        if self.rollout_best:
            best_model_out = self.model_rollout(state_cur, act_seq[None])
            best_eval_out = self.evaluate_traj(best_model_out["state_seqs"],
                                               act_seq[None], state_cur=state_cur)
        return {"act_seq": act_seq,
                "model_outputs": model_outputs if self.verbose else None,
                "eval_outputs": eval_outputs if self.verbose else None,
                "best_model_output": best_model_out,
                "best_eval_output": best_eval_out}

    def _gd(self, state_cur, act_seq, key):
        import optax

        act_seqs = self._spread(
            sample_action_seq(jnp.asarray(act_seq, jnp.float32), self.lower,
                              self.upper, self.n_sample, key, iter_index=0))
        opt = optax.adam(self.lr)
        opt_state = opt.init(act_seqs)

        def neg_reward(a):
            out = self.model_rollout(state_cur, a)
            ev = self.evaluate_traj(out["state_seqs"], a, state_cur=state_cur)
            return -jnp.mean(ev["reward_seqs"])

        grad_fn = jax.value_and_grad(neg_reward)
        for _ in range(self.n_update_iter):
            loss, g = grad_fn(act_seqs)
            updates, opt_state = opt.update(g, opt_state)
            act_seqs = clip_actions(optax.apply_updates(act_seqs, updates),
                                    self.lower, self.upper)
        out = self.model_rollout(state_cur, act_seqs)
        ev = self.evaluate_traj(out["state_seqs"], act_seqs, state_cur=state_cur)
        best = int(jnp.argmax(ev["reward_seqs"]))
        act_seq = act_seqs[best]
        best_model_out = best_eval_out = None
        if self.rollout_best:
            best_model_out = self.model_rollout(state_cur, act_seq[None])
            best_eval_out = self.evaluate_traj(best_model_out["state_seqs"],
                                               act_seq[None], state_cur=state_cur)
        return {"act_seq": act_seq, "model_outputs": None, "eval_outputs": None,
                "best_model_output": best_model_out, "best_eval_output": best_eval_out}

    def merge_res(self, res_list):
        """Pick the best chunk result (planner.py:312-323); with the full
        population vmapped there is normally a single chunk."""
        rewards = [float(jnp.mean(r["best_eval_output"]["reward_seqs"]))
                   for r in res_list]
        return res_list[int(np.argmax(rewards))]
