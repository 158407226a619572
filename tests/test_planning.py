"""Planning stack tests: action ops, optimizers, batched rollouts, MPPI."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaptigraph_tpu.planning.actions import (
    decode_action, decode_action_single, sample_action_seq, optimize_action_mppi,
    clip_actions,
)
from adaptigraph_tpu.planning.optim import CMAES, GaussianProcess, gp_minimize_ei
from adaptigraph_tpu.planning.costs import running_cost, make_error_fn, PENALTIES
from adaptigraph_tpu.planning.planner import Planner

LOWER = jnp.array([-4.5, -2.5, -3.14, 2.0])
UPPER = jnp.array([0.0, 4.5, 3.14, 10.0])


class TestActions:
    def test_decode_matches_single(self):
        a = jnp.array([[[-1.0, 0.5, 0.7, 3.0]]])
        dec, rep = decode_action(a, push_length=0.2)
        assert int(rep[0, 0]) == 3
        xs, zs, xe, ze = decode_action_single(np.array([-1.0, 0.5, 0.7, 3.0]), 0.2)
        # decode_action gives ONE push_length step; single gives full extent
        np.testing.assert_allclose(float(dec[0, 0, 2]), xs - 0.2 * np.cos(0.7), rtol=1e-5)
        np.testing.assert_allclose(xe, xs - 3 * 0.2 * np.cos(0.7), rtol=1e-5)

    def test_sample_iter0_in_box(self):
        seqs = sample_action_seq(jnp.zeros((1, 4)), LOWER, UPPER, 64,
                                 jax.random.PRNGKey(0), iter_index=0)
        assert seqs.shape == (64, 1, 4)
        assert bool(jnp.all(seqs >= LOWER)) and bool(jnp.all(seqs <= UPPER))

    def test_sample_later_keeps_incumbent(self):
        inc = jnp.array([[-2.0, 1.0, 0.5, 4.0]])
        seqs = sample_action_seq(inc, LOWER, UPPER, 32, jax.random.PRNGKey(1),
                                 iter_index=1)
        np.testing.assert_allclose(np.asarray(seqs[0]), np.asarray(inc), atol=1e-6)
        # others are perturbed
        assert np.abs(np.asarray(seqs[1:]) - np.asarray(inc)).max() > 1e-3

    def test_mppi_update_prefers_high_reward(self):
        acts = jnp.stack([jnp.array([[-3.0, 0.0, 0.0, 4.0]]),
                          jnp.array([[-1.0, 2.0, 1.0, 6.0]])])
        rewards = jnp.array([-10.0, 10.0])
        out = optimize_action_mppi(acts, rewards, reward_weight=100.0,
                                   lower=LOWER, upper=UPPER)
        np.testing.assert_allclose(np.asarray(out), np.asarray(acts[1]), atol=1e-3)

    def test_clip_normalizes_angle(self):
        a = jnp.array([[0.0, 0.0, 3.5 * np.pi, 5.0]])
        out = clip_actions(a, LOWER, UPPER)
        assert -np.pi <= float(out[0, 2]) <= np.pi


class TestOptim:
    def test_gp_fit_predict(self):
        x = np.linspace(0, 1, 8)[:, None]
        y = np.sin(3 * x[:, 0])
        gp = GaussianProcess(length_scale=0.5, noise=1e-6).fit(x, y)
        mu, sd = gp.predict(x)
        np.testing.assert_allclose(mu, y, atol=1e-3)
        assert sd.max() < 0.05

    def test_gp_ei_finds_minimum(self):
        f = lambda x: float((x[0] - 0.37) ** 2)
        res = gp_minimize_ei(f, [(-0.2, 1.2)], n_calls=30, n_initial=10,
                             noise_level=1e-4, random_state=0)
        assert abs(res["expected_x"][0] - 0.37) < 0.05
        assert res["fun"] < 0.01

    def test_gp_ei_1d_warmup_is_grid(self):
        """1-D warmup must be a deterministic uniform grid: it guarantees an
        observation within half a grid step of the argmin, where the random
        warmup missed a narrow basin entirely (r5h rope refit)."""
        seen = []
        f = lambda x: (seen.append(float(x[0])), float(x[0] ** 2))[1]
        gp_minimize_ei(f, [(-0.2, 1.2)], n_calls=10, n_initial=10,
                       noise_level=1e-4, random_state=0)
        np.testing.assert_allclose(sorted(seen), np.linspace(-0.2, 1.2, 10),
                                   atol=1e-12)

    def test_gp_ei_best_observed_beats_flat_posterior(self):
        """On a flat landscape with one narrow dip, the best OBSERVED point
        carries the signal even when the smoothed posterior mean is flat —
        res['x']/res['fun'] must report it exactly (physics_optimizer's
        final pick relies on this)."""
        f = lambda x: float(-1.0 if abs(x[0] - 0.2556) < 0.08 else 0.0)
        res = gp_minimize_ei(f, [(-0.2, 1.2)], n_calls=12, n_initial=12,
                             noise_level=1e-2, random_state=0)
        assert res["fun"] == -1.0
        assert abs(res["x"][0] - 0.2556) < 0.08

    def test_cmaes_minimizes_quadratic(self):
        f = lambda x: float(np.sum((x - np.array([0.3, -0.1])) ** 2))
        es = CMAES([0.5, 0.5], sigma=0.2, bounds=(-0.2, 1.2), seed=1)
        x, fv = es.optimize(f, iterations=40)
        # bounds clip the -0.1 target to -0.2..; the x[1] optimum inside the
        # box is -0.1 (inside) — check convergence
        np.testing.assert_allclose(x, [0.3, -0.1], atol=0.05)


class TestCosts:
    def test_running_cost_prefers_target_progress(self):
        task = {"target_type": "box", "target": [-1.0, 1.0, -1.0, 1.0]}
        err = make_error_fn(task)
        pen = PENALTIES["rope"]
        bbox = jnp.array([[-5.0, 5.0], [-5.0, 5.0]])
        state_cur = jnp.zeros((10, 3))
        inside = jnp.zeros((1, 1, 10, 3))
        outside = inside + jnp.array([4.0, 0.0, 0.0])
        action = jnp.array([[[0.1, 0.0, 0.0, 2.0]]])
        r_in = running_cost(inside, action, state_cur, err, pen, bbox)["reward_seqs"]
        r_out = running_cost(outside, action, state_cur, err, pen, bbox)["reward_seqs"]
        assert float(r_in[0]) > float(r_out[0])

    def test_penalty_rewards_contact(self):
        pen = PENALTIES["rope"]
        state_init = jnp.zeros((10, 3))
        pred = jnp.zeros((2, 1, 10, 3))
        near = jnp.array([[[0.05, 0.0, 0.0, 2.0]]])
        far = jnp.array([[[3.0, 3.0, 0.0, 2.0]]])
        p_near = pen(pred[:1], near, state_init)
        p_far = pen(pred[:1], far, state_init)
        assert float(p_near[0, 0]) > float(p_far[0, 0])  # near -> penalty ~1


class TestPlannerMPPI:
    def test_converges_on_toy_problem(self):
        """Toy dynamics: the 'object' (single point) moves to the action's
        endpoint. Reward: negative distance of the endpoint to (  -2, 1)."""
        target = jnp.array([-2.0, 1.0])

        def model_rollout(state_cur, act_seqs):
            dec, _ = decode_action(act_seqs, push_length=0.2)
            endpoint = dec[..., 2:]  # (S, L, 2)
            states = jnp.concatenate(
                [endpoint, jnp.zeros_like(endpoint[..., :1])], -1)[:, :, None, :]
            return {"state_seqs": states}

        def evaluate(state_seqs, act_seqs, state_cur=None, **kw):
            end = state_seqs[:, -1, 0, :2]
            return {"reward_seqs": -jnp.linalg.norm(end - target, axis=-1)}

        planner = Planner({
            "action_dim": 4, "model_rollout_fn": model_rollout,
            "evaluate_traj_fn": evaluate, "n_sample": 256, "n_look_ahead": 1,
            "n_update_iter": 4, "reward_weight": 50.0,
            "action_lower_lim": LOWER, "action_upper_lim": UPPER,
            "planner_type": "MPPI", "noise_level": 0.5, "push_length": 0.2,
        })
        res = planner.trajectory_optimization(
            jnp.zeros((1, 3)), jnp.array([[-1.0, 0.0, 0.0, 5.0]]),
            key=jax.random.PRNGKey(0))
        act = np.asarray(res["act_seq"])[0]
        xs, zs, xe, ze = decode_action_single(act, 0.2)
        # full-extent endpoint should be close-ish... the planner optimizes the
        # SINGLE-step endpoint, so compare that
        dec, _ = decode_action(jnp.array([[act]]), 0.2)
        end = np.asarray(dec)[0, 0, 2:]
        assert np.linalg.norm(end - np.asarray(target)) < 0.4
        assert res["best_eval_output"] is not None

    def test_population_shards_over_mesh(self):
        """The MPPI population's leading axis shards over the 8-device mesh
        (the reference's 40 sequential chunks, plan.py:241-247, become one
        SPMD program) and matches the unsharded result."""
        from adaptigraph_tpu.parallel.mesh import make_mesh

        target = jnp.array([-2.0, 1.0])
        seen_shardings = []

        @jax.jit
        def model_rollout(state_cur, act_seqs):
            dec, _ = decode_action(act_seqs, push_length=0.2)
            endpoint = dec[..., 2:]
            states = jnp.concatenate(
                [endpoint, jnp.zeros_like(endpoint[..., :1])], -1)[:, :, None, :]
            return {"state_seqs": states}

        def rollout_probe(state_cur, act_seqs):
            seen_shardings.append(act_seqs.sharding)
            return model_rollout(state_cur, act_seqs)

        def evaluate(state_seqs, act_seqs, state_cur=None, **kw):
            end = state_seqs[:, -1, 0, :2]
            return {"reward_seqs": -jnp.linalg.norm(end - target, axis=-1)}

        cfg = {
            "action_dim": 4, "model_rollout_fn": rollout_probe,
            "evaluate_traj_fn": evaluate, "n_sample": 256, "n_look_ahead": 1,
            "n_update_iter": 2, "reward_weight": 50.0,
            "action_lower_lim": LOWER, "action_upper_lim": UPPER,
            "planner_type": "MPPI", "noise_level": 0.5, "push_length": 0.2,
        }
        state0 = jnp.zeros((1, 3))
        act0 = jnp.array([[-1.0, 0.0, 0.0, 5.0]])
        res_plain = Planner(cfg).trajectory_optimization(
            state0, act0, key=jax.random.PRNGKey(0))
        mesh = make_mesh(8)
        res_mesh = Planner(dict(cfg, mesh=mesh)).trajectory_optimization(
            state0, act0, key=jax.random.PRNGKey(0))
        # population really was laid out across the mesh
        assert any(not s.is_fully_replicated for s in seen_shardings[2:])
        np.testing.assert_allclose(np.asarray(res_mesh["act_seq"]),
                                   np.asarray(res_plain["act_seq"]), atol=1e-5)


class TestBatchedDynamics:
    def test_rollout_shapes_and_repeat_semantics(self):
        from adaptigraph_tpu.dynamics.model import DynamicsPredictor, ModelConfig
        from adaptigraph_tpu.planning.forward_dynamics import make_batched_dynamics

        cfg = ModelConfig(n_his=4, nf=16, pstep=1)
        model = DynamicsPredictor(cfg)
        task = {
            "pusher_points": [[0.0, 0.0, 0.1]], "sim_real_ratio": 10,
            "push_length": 0.2, "adj_thresh": 0.5, "topk": 5,
            "connect_tools_all": False, "max_nR": 200, "n_his": 4,
            "gripper_enable": False, "action_lower_lim": [-4.5, -2.5, -3.14, 2],
            "action_upper_lim": [0.0, 4.5, 3.14, 4],
        }
        nobj = 30
        state = jnp.array(np.random.RandomState(0).rand(nobj, 3), jnp.float32)
        mask = jnp.ones(nobj, bool)
        # init params with a representative graph
        rollout = make_batched_dynamics(model, task)
        acts = jnp.array([[[-1.0, 0.5, 0.3, 3.0]], [[-2.0, 1.0, -0.5, 0.0]]])
        # build params via a dry init
        from adaptigraph_tpu.ops import build_edges
        st4 = jnp.tile(state[None], (4, 1, 1))
        full = jnp.concatenate([st4, jnp.zeros((4, 1, 3))], axis=1)
        e = build_edges(full[-1], 0.5, jnp.ones(nobj + 1, bool),
                        jnp.zeros(nobj + 1, bool).at[nobj].set(True), topk=5,
                        max_edges=200)
        params = model.init(jax.random.PRNGKey(0), full,
                            jnp.zeros((nobj + 1, 2)), e.receivers, e.senders,
                            e.valid, jnp.ones((nobj, 1)), jnp.array([0.5]),
                            action=jnp.zeros((nobj + 1, 3)))["params"]
        out = rollout(params, state, mask, acts, jnp.array([0.5]))
        assert out["state_seqs"].shape == (2, 1, nobj, 3)
        # sample 1 has length 0 -> no model step recorded -> state unchanged
        np.testing.assert_allclose(np.asarray(out["state_seqs"][1, 0]),
                                   np.asarray(state), atol=1e-6)
        # sample 0 with 3 repeats should have moved (random model output != 0)
        assert np.abs(np.asarray(out["state_seqs"][0, 0]) - np.asarray(state)).max() > 1e-5

    def test_chunked_population_matches_unchunked(self):
        """n_sample_chunk (the v5e HBM bound for the 20k MPPI population,
        BENCH_r03 OOM) must be a pure memory-layout choice: lax.map over
        sub-batches returns bit-identical rollouts to the single vmap."""
        from adaptigraph_tpu.dynamics.model import DynamicsPredictor, ModelConfig
        from adaptigraph_tpu.planning.forward_dynamics import make_batched_dynamics

        cfg = ModelConfig(n_his=4, nf=16, pstep=1)
        model = DynamicsPredictor(cfg)
        task = {
            "pusher_points": [[0.0, 0.0, 0.1]], "sim_real_ratio": 10,
            "push_length": 0.2, "adj_thresh": 0.5, "topk": 5,
            "connect_tools_all": False, "max_nR": 200, "n_his": 4,
            "gripper_enable": False, "action_lower_lim": [-4.5, -2.5, -3.14, 2],
            "action_upper_lim": [0.0, 4.5, 3.14, 4],
        }
        nobj = 30
        rng = np.random.RandomState(1)
        state = jnp.array(rng.rand(nobj, 3), jnp.float32)
        mask = jnp.ones(nobj, bool)
        from adaptigraph_tpu.ops import build_edges
        st4 = jnp.tile(state[None], (4, 1, 1))
        full = jnp.concatenate([st4, jnp.zeros((4, 1, 3))], axis=1)
        e = build_edges(full[-1], 0.5, jnp.ones(nobj + 1, bool),
                        jnp.zeros(nobj + 1, bool).at[nobj].set(True), topk=5,
                        max_edges=200)
        params = model.init(jax.random.PRNGKey(0), full,
                            jnp.zeros((nobj + 1, 2)), e.receivers, e.senders,
                            e.valid, jnp.ones((nobj, 1)), jnp.array([0.5]),
                            action=jnp.zeros((nobj + 1, 3)))["params"]
        acts = jnp.array(rng.uniform(-2, 2, (8, 1, 4)), jnp.float32)
        acts = acts.at[..., 3].set(jnp.array(rng.uniform(2, 4, (8, 1)),
                                             jnp.float32))
        out_full = make_batched_dynamics(model, task)(
            params, state, mask, acts, jnp.array([0.5]))
        out_chunk = make_batched_dynamics(model, dict(task, n_sample_chunk=2))(
            params, state, mask, acts, jnp.array([0.5]))
        np.testing.assert_array_equal(np.asarray(out_full["state_seqs"]),
                                      np.asarray(out_chunk["state_seqs"]))
        # non-divisible population: padded to the next chunk multiple and
        # sliced back (ADVICE r4 #2 — it must NOT silently fall back to one
        # full vmap, which re-opens the BENCH_r03 live-activation OOM)
        out_odd = make_batched_dynamics(model, dict(task, n_sample_chunk=3))(
            params, state, mask, acts, jnp.array([0.5]))
        np.testing.assert_array_equal(np.asarray(out_full["state_seqs"]),
                                      np.asarray(out_odd["state_seqs"]))
        assert out_odd["state_seqs"].shape[0] == 8  # pad rows sliced off

    def test_model_sees_flex_frame(self):
        """The planner works in the plan frame (flex z negated) but the GNN
        is trained on flex-frame episodes only, and an MLP message net is not
        parity-equivariant — the rollout must mirror at the model boundary
        (measured 2.1x validation-MSE degradation feeding mirrored geometry;
        r4 PPO pinned at the search bound). Probe with a fake model that
        shifts every object point by +1 in z IN THE FRAME IT RECEIVES: the
        plan-frame output must come back shifted by -1 in z."""
        from adaptigraph_tpu.planning.forward_dynamics import make_batched_dynamics

        class FakeModel:
            def apply(self, variables, hist, attrs, recv, send, valid,
                      p_instance, physics, action=None):
                n_obj = p_instance.shape[0]
                pred = hist[-1, :n_obj] + jnp.array([0.0, 0.0, 1.0])
                return pred, None

        task = {
            "pusher_points": [[0.0, 0.0, 0.1]], "sim_real_ratio": 10,
            "push_length": 0.2, "adj_thresh": 0.5, "topk": 5,
            "connect_tools_all": False, "max_nR": 200, "n_his": 4,
            "gripper_enable": False, "action_lower_lim": [-4.5, -2.5, -3.14, 2],
            "action_upper_lim": [0.0, 4.5, 3.14, 2],
        }
        nobj = 12
        state = jnp.array(np.random.RandomState(3).rand(nobj, 3), jnp.float32)
        mask = jnp.ones(nobj, bool)
        acts = jnp.array([[[-1.0, 0.5, 0.3, 2.0]]])  # 2 repeats
        out = make_batched_dynamics(FakeModel(), task)(
            {}, state, mask, acts, jnp.array([0.5]))
        np.testing.assert_allclose(
            np.asarray(out["state_seqs"][0, 0]),
            np.asarray(state) + np.array([0.0, 0.0, -2.0], np.float32),
            atol=1e-5)


class TestPPORecovery:
    def test_ppo_recovers_known_param(self, tmp_path):
        """End-to-end physics-param estimation acceptance (the sim-world
        analogue of the reference's coffee-bean demo value, README.md:
        246-258): synthesize interactions whose 'real' outcomes come from
        the model itself at a KNOWN physics parameter, then assert
        PhysicsParamOnlineOptimizer.optimize recovers it within tolerance
        and reduces the replay error."""
        from adaptigraph_tpu.dynamics.model import DynamicsPredictor, ModelConfig
        from adaptigraph_tpu.planning.forward_dynamics import make_masked_replay
        from adaptigraph_tpu.planning.physics_optimizer import (
            PhysicsParamOnlineOptimizer)

        cfg = ModelConfig(n_his=4, nf=16, pstep=1)
        model = DynamicsPredictor(cfg)
        task = {
            "pusher_points": [[0.0, 0.0, 0.1]], "sim_real_ratio": 10,
            "push_length": 0.2, "adj_thresh": 0.5, "topk": 5,
            "connect_tools_all": False, "max_nR": 200, "n_his": 4,
            "gripper_enable": False, "max_nobj": 24,
            "material_dims": {"rope": 1},
            "action_lower_lim": [-4.5, -2.5, -3.14, 2],
            "action_upper_lim": [0.0, 4.5, 3.14, 4],
        }
        nobj = 24
        rng = np.random.RandomState(0)
        state = rng.rand(nobj, 3).astype(np.float32)
        from adaptigraph_tpu.ops import build_edges
        st4 = jnp.tile(jnp.asarray(state)[None], (4, 1, 1))
        full = jnp.concatenate([st4, jnp.zeros((4, 1, 3))], axis=1)
        e = build_edges(full[-1], 0.5, jnp.ones(nobj + 1, bool),
                        jnp.zeros(nobj + 1, bool).at[nobj].set(True), topk=5,
                        max_edges=200)
        params = model.init(jax.random.PRNGKey(0), full,
                            jnp.zeros((nobj + 1, 2)), e.receivers, e.senders,
                            e.valid, jnp.ones((nobj, 1)), jnp.array([0.5]),
                            action=jnp.zeros((nobj + 1, 3)))["params"]

        true_p = 0.85
        replay = make_masked_replay(model, task)
        ppm = PhysicsParamOnlineOptimizer(task, model, params, "rope",
                                          str(tmp_path))
        acts = [np.array([-1.0, 0.5, 0.3, 3.0], np.float32),
                np.array([-2.0, 1.0, -0.5, 3.0], np.float32),
                np.array([-1.5, 2.0, 1.2, 4.0], np.float32)]
        mask = jnp.ones((1, nobj), bool)
        for i, a in enumerate(acts):
            out = replay(params, jnp.asarray(state)[None], mask,
                         jnp.asarray(a)[None], jnp.full((1, 1), true_p))
            real = np.asarray(out["state_seqs"][0])
            ppm.log_interaction(i, a, state, real, real)
        p_est, err, err0 = ppm.optimize(len(acts) - 1, iterations=30)
        assert err < err0, f"replay error must decrease: {err0} -> {err}"
        assert abs(float(p_est[0]) - true_p) < 0.15, (p_est, true_p)

    def test_ppo_seeds_from_latest_refit(self, tmp_path):
        """A save_dir holding prior ppo_*.npz refits (an exploration-priming
        stage, or a plan --resume) must seed the optimizer's estimate from
        the LATEST one — numeric order, not lexicographic — instead of
        resetting to the 0.5 prior (scripts/plan_acceptance.py PLAN_EXPLORE
        relies on this handoff)."""
        from adaptigraph_tpu.dynamics.model import DynamicsPredictor, ModelConfig
        from adaptigraph_tpu.planning.physics_optimizer import (
            PhysicsParamOnlineOptimizer)

        task = {
            "pusher_points": [[0.0, 0.0, 0.1]], "sim_real_ratio": 10,
            "push_length": 0.2, "adj_thresh": 0.5, "topk": 5,
            "connect_tools_all": False, "max_nR": 200, "n_his": 4,
            "gripper_enable": False, "max_nobj": 24,
            "material_dims": {"rope": 1},
            "action_lower_lim": [-4.5, -2.5, -3.14, 2],
            "action_upper_lim": [0.0, 4.5, 3.14, 4],
        }
        for i, v in [(2, 0.31), (10, 0.87)]:  # ppo_10 after ppo_2 numerically
            np.savez(tmp_path / f"ppo_{i}.npz",
                     physics_param=np.array([v], np.float32))
        model = DynamicsPredictor(ModelConfig(n_his=4, nf=16, pstep=1))
        ppm = PhysicsParamOnlineOptimizer(task, model, {}, "rope",
                                          str(tmp_path))
        np.testing.assert_allclose(ppm.physics_param["rope"], [0.87],
                                   atol=1e-6)

    def test_ppo_never_regresses_incumbent(self, tmp_path):
        """optimize() must never move the estimate to a param with HIGHER
        replay error than the incumbent's: the GP's expected_minimum on a
        flat posterior did exactly that in the r5h rope refit (0.2247 ->
        0.2272). Objective here is minimized at the incumbent 0.4, which
        lies off the 7-point warmup grid, so every candidate is worse."""
        from adaptigraph_tpu.planning.physics_optimizer import (
            PhysicsParamOnlineOptimizer)

        ppm = object.__new__(PhysicsParamOnlineOptimizer)
        ppm.material, ppm.dim = "rope", 1
        ppm.physics_param = {"rope": np.array([0.4], np.float32)}
        ppm.save_dir = str(tmp_path)
        ppm._load_interactions = lambda: ([0] * 3, [0] * 3, [0] * 3)
        ppm.dynamics_error = lambda p, a, i, r: 1.0 + 0.1 * abs(
            float(np.atleast_1d(p)[0]) - 0.4)
        p_est, err, err0 = ppm.optimize(2, iterations=7)
        np.testing.assert_allclose(p_est, [0.4], atol=1e-7)
        assert err == err0 and abs(err0 - 1.0) < 1e-8


class TestClothGripperPlan:
    def test_gripper_task_config_rollout(self):
        """Cloth plan smoke: the gripper task-config path (planning/cloth.yaml
        schema: gripper_enable, 1-point grasper) must roll out through the
        batched dynamics and the planner without shape errors."""
        from adaptigraph_tpu.dynamics.model import DynamicsPredictor, ModelConfig
        from adaptigraph_tpu.planning.forward_dynamics import make_batched_dynamics
        from adaptigraph_tpu.planning.planner import Planner
        from adaptigraph_tpu.utils import load_config

        tc = dict(load_config("planning/cloth")["task_config"])
        assert tc["gripper_enable"] is True
        tc["max_nobj"] = 20
        cfg = ModelConfig(n_his=int(tc["n_his"]), nf=16, pstep=1)
        model = DynamicsPredictor(cfg)
        nobj = 20
        rng = np.random.RandomState(0)
        state = jnp.asarray(rng.rand(nobj, 3), jnp.float32)
        mask = jnp.ones(nobj, bool)
        n_eef = len(tc["pusher_points"])
        full = jnp.tile(jnp.concatenate([state, jnp.zeros((n_eef, 3))])[None],
                        (cfg.n_his, 1, 1))
        from adaptigraph_tpu.ops import build_edges_slotted
        e = build_edges_slotted(full[-1], float(tc["adj_thresh"]),
                                jnp.ones(nobj + n_eef, bool),
                                jnp.zeros(nobj + n_eef, bool).at[nobj:].set(True),
                                topk=int(tc["topk"]))
        params = model.init(jax.random.PRNGKey(0), full,
                            jnp.zeros((nobj + n_eef, 2)), e.receivers,
                            e.senders, e.valid, jnp.ones((nobj, 1)),
                            jnp.array([0.5]),
                            action=jnp.zeros((nobj + n_eef, 3)))["params"]
        rollout = make_batched_dynamics(model, tc)
        lo = jnp.asarray(tc["action_lower_lim"], jnp.float32)
        hi = jnp.asarray(tc["action_upper_lim"], jnp.float32)
        acts = jax.random.uniform(jax.random.PRNGKey(1), (8, 1, 4),
                                  minval=lo, maxval=hi)
        out = rollout(params, state, mask, acts, jnp.array([0.5]))
        assert out["state_seqs"].shape == (8, 1, nobj, 3)
        assert np.isfinite(np.asarray(out["state_seqs"])).all()

        # one MPPI iteration over the gripper rollout
        from adaptigraph_tpu.planning.costs import PENALTIES, running_cost
        from adaptigraph_tpu.ops import chamfer

        target = state + jnp.array([0.3, 0.0, 0.3])

        def error_fn(s, mask=None):
            t = jnp.tile(target[None], (s.shape[0], 1, 1))
            return chamfer(s, t, x_mask=mask)

        bbox = jnp.asarray([[-4.5, 4.5], [-4.5, 4.5]])
        planner = Planner({
            "action_dim": 4,
            "model_rollout_fn": lambda sc, a: rollout(params, state, mask, a,
                                                      jnp.array([0.5])),
            "evaluate_traj_fn": lambda ss, aa, **kw: running_cost(
                ss["state_seqs"] if isinstance(ss, dict) else ss, aa, state,
                error_fn, PENALTIES[tc["penalty_type"]], bbox, obj_mask=mask),
            "n_sample": 8, "n_look_ahead": 1, "n_update_iter": 1,
            "reward_weight": float(tc["reward_weight"]),
            "action_lower_lim": np.asarray(tc["action_lower_lim"], np.float32),
            "action_upper_lim": np.asarray(tc["action_upper_lim"], np.float32),
            "planner_type": "MPPI", "noise_level": float(tc["noise_level"]),
            "push_length": float(tc["push_length"]),
        })
        res = planner.trajectory_optimization(
            state, jnp.tile(jnp.asarray([[-1.0, 0.0, 0.0, lo[3]]], jnp.float32),
                            (1, 1)), key=jax.random.PRNGKey(2))
        assert np.isfinite(float(res["best_eval_output"]["reward_seqs"][0]))


class TestAcceptanceSeeds:
    def test_default_seeds_are_falsifiable(self):
        """The planning-acceptance demo (scripts/plan_acceptance.py) pins
        per-material episode seeds whose TRUE normalized physics param sits
        clearly away from the optimizer's 0.5 prior (so a do-nothing
        estimator FAILS recovery) and away from the [-0.2, 1.2] clamp edges
        (so recovery is well-conditioned). Guard that property against
        sampler/config drift — the reference's analogous demo relies on a
        known ~0.04 granularity (README.md:246-258)."""
        import ast

        from adaptigraph_tpu.scenes.samplers import sample_scene
        from adaptigraph_tpu.dynamics.dataset import normalize_physics
        from adaptigraph_tpu.utils import load_config

        # read the SHIPPED defaults out of the script source (it has
        # module-level side effects, so no import): the guard must track
        # the real defaults, not a copy that can drift (ADVICE r4 #1 —
        # the copy pinned seed 12 long after the script moved to 59)
        src = open("/root/repo/scripts/plan_acceptance.py").read()
        seeds = None
        for node in ast.walk(ast.parse(src)):
            if (isinstance(node, ast.Assign)
                    and any(getattr(t, "id", None) == "DEFAULT_SEEDS"
                            for t in node.targets)):
                seeds = ast.literal_eval(node.value)
        assert seeds is not None and set(seeds) >= {"rope", "granular"}
        for mat, seed in seeds.items():
            pp = load_config(f"dynamics/{mat}")["material_config"][mat][
                "physics_params"]
            rng = np.random.RandomState(seed)
            _, props = sample_scene(mat, rng)
            t = float(np.atleast_1d(normalize_physics(props, pp))[0])
            assert 0.2 <= abs(t - 0.5), (mat, t)   # prior can't trivially pass
            if mat == "rope":
                # identifiability: rope's true param must sit in the LOW-
                # stiffness mode — the branch where replay error actually
                # discriminates stiffness (plan_acceptance.py docstring;
                # high-stiffness ropes are degenerate over short pushes)
                assert t < 0.5, ("rope seed must pick the low-stiffness "
                                 "mode", t)
            assert 0.1 <= t <= 0.9, (mat, t)       # off the clamp edges
