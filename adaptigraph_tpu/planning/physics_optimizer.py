"""Online physics-parameter estimation ("PPO" in the reference's naming —
physics parameter optimization, NOT RL).

Port of src/planning/physics_param_optimizer.py:18-226: maintain a
normalized physics-param estimate (init 0.5); after each real interaction,
replay every logged (state_init, action, state_real) triple through the
batched masked model rollout under candidate parameters and minimize the
mean masked chamfer error, with GP-EI for 1-D parameters or CMA-ES for
multi-dim, search box [-0.2, 1.2], then clamp the estimate.

The objective's heavy part (replaying all interactions) is one jitted TPU
call per candidate; GP/CMA bookkeeping is negligible host numpy.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import jax.numpy as jnp

from adaptigraph_tpu.ops import masked_chamfer
from adaptigraph_tpu.planning.forward_dynamics import make_masked_replay
from adaptigraph_tpu.planning.optim import CMAES, gp_minimize_ei


class PhysicsParamOnlineOptimizer:
    def __init__(self, task_config, model, params, material, save_dir):
        self.task_config = task_config
        self.model = model
        self.params = params
        self.material = material
        self.save_dir = save_dir
        self.material_dims = task_config["material_dims"]
        self.dim = int(self.material_dims[material])
        self.physics_param = {material: np.full(self.dim, 0.5, np.float32)}
        # resume semantics: a save_dir that already holds ppo_*.npz refits
        # (a prior exploration stage, or a plan --resume) seeds the estimate
        # from the LATEST one instead of silently resetting to the 0.5 prior
        ppo_files = sorted(
            glob.glob(os.path.join(save_dir, "ppo_*.npz")),
            key=lambda p: int(os.path.basename(p)[4:-4]))
        if ppo_files:
            est = np.asarray(np.load(ppo_files[-1])["physics_param"],
                             np.float32).reshape(-1)
            if est.size == self.dim:
                self.physics_param[material] = np.clip(est, -0.2, 1.2)
        self.replay = make_masked_replay(model, task_config)

    # ---------- logging ----------

    def log_interaction(self, i, act, state_init, state_pred, state_real):
        np.savez(os.path.join(self.save_dir, f"interaction_{i:03}.npz"),
                 act=act, state_init=state_init, state_pred=state_pred,
                 state_real=state_real)

    def _load_interactions(self):
        files = sorted(glob.glob(os.path.join(self.save_dir, "interaction_*.npz")))
        acts, inits, reals = [], [], []
        for f in files:
            d = np.load(f)
            acts.append(d["act"])
            inits.append(d["state_init"])
            reals.append(d["state_real"])
        return acts, inits, reals

    # ---------- objective ----------

    def dynamics_error(self, physics_param, acts, state_init_list, state_real_list):
        """Mean masked chamfer between replayed and real final states
        (physics_param_optimizer.py:178-226)."""
        max_nobj = int(self.task_config["max_nobj"])
        b = len(acts)
        init = np.zeros((b, max_nobj, 3), np.float32)
        real = np.zeros((b, max_nobj, 3), np.float32)
        init_mask = np.zeros((b, max_nobj), bool)
        real_mask = np.zeros((b, max_nobj), bool)
        for i in range(b):
            si, sr = state_init_list[i], state_real_list[i]
            init[i, : len(si)] = si
            real[i, : len(sr)] = sr
            init_mask[i, : len(si)] = True
            real_mask[i, : len(sr)] = True
        pp = np.asarray(physics_param, np.float32).reshape(1, -1)
        pp = np.tile(pp, (b, 1))
        out = self.replay(self.params, jnp.array(init), jnp.array(init_mask),
                          jnp.array(np.stack(acts).astype(np.float32)), jnp.array(pp))
        err = masked_chamfer(out["state_seqs"], jnp.array(real),
                             jnp.array(init_mask), jnp.array(real_mask))
        return float(jnp.mean(err))

    # ---------- optimization ----------

    def optimize(self, i, iterations: int = 50):
        acts, inits, reals = self._load_interactions()
        assert len(acts) == i + 1, f"expected {i + 1} interactions, got {len(acts)}"

        init_error = self.dynamics_error(self.physics_param[self.material],
                                         acts, inits, reals)
        print(f"init error {init_error:.5f}")

        obj = lambda x: self.dynamics_error(x, acts, inits, reals)
        if self.dim == 1:
            res = gp_minimize_ei(obj, [(-0.2, 1.2)] * self.dim, n_calls=iterations,
                                 n_initial=min(20, iterations),
                                 noise_level=0.2 * init_error + 1e-6)
            # pick by ACTUAL replay error, not the GP posterior alone: on a
            # flat/noisy posterior the reference's expected_minimum
            # (physics_param_optimizer.py:105-108) can return a point worse
            # than the best observation (r5h rope refit regressed 0.2247 ->
            # 0.2272 this way). The objective is deterministic here, so the
            # best observed value is exact and costs nothing to keep.
            exp_x = np.atleast_1d(res["expected_x"]).astype(np.float32)
            cands = [(exp_x, float(obj(exp_x))),
                     (np.atleast_1d(res["x"]).astype(np.float32),
                      float(res["fun"]))]
            ppm, error = min(cands, key=lambda c: c[1])
        else:
            es = CMAES(self.physics_param[self.material].astype(np.float64),
                       sigma=0.2, bounds=(-0.2, 1.2))
            ppm, error = es.optimize(obj, iterations=max(1, iterations // es.lam))
            ppm = np.asarray(ppm, np.float32)

        if error > init_error:
            # never regress the incumbent estimate: the optimizer found
            # nothing better than where the estimate already sits
            ppm = np.asarray(self.physics_param[self.material],
                             np.float32).copy()
            error = init_error
        print(f"new physics param {ppm} (error {error:.5f})")
        self.physics_param[self.material] = np.clip(ppm, -0.2, 1.2)
        np.savez(os.path.join(self.save_dir, f"ppo_{i}.npz"),
                 physics_param=ppm, error=error, error_init=init_error)
        return ppm, error, init_error
