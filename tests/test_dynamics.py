"""Dynamics stack tests: model properties, on-device graph building,
training-step behavior, preprocessing logic."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from adaptigraph_tpu.dynamics.model import DynamicsPredictor, ModelConfig
from adaptigraph_tpu.ops import build_edges


def _toy_graph(key, n_obj=20, n_eef=1, n_his=4, max_nR=100, phys_dim=1):
    k1, k2, k3 = jax.random.split(key, 3)
    n = n_obj + n_eef
    state = jax.random.normal(k1, (n_his, n, 3)) * 0.3
    attrs = jnp.zeros((n, 2)).at[:n_obj, 0].set(1.0).at[n_obj:, 1].set(1.0)
    state_mask = jnp.ones(n, bool)
    eef_mask = jnp.zeros(n, bool).at[n_obj:].set(True)
    edges = build_edges(state[-1], 1.0, state_mask, eef_mask, topk=10, max_edges=max_nR)
    action = jnp.zeros((n, 3)).at[n_obj:].set(jax.random.normal(k2, (n_eef, 3)) * 0.1)
    return {
        "state": state,
        "attrs": attrs,
        "recv": edges.receivers,
        "send": edges.senders,
        "edge_valid": edges.valid,
        "p_instance": jnp.ones((n_obj, 1)),
        "physics_param": jnp.array([0.5]),
        "action": action,
        "obj_mask": jnp.ones(n_obj, bool),
    }


@pytest.fixture(scope="module")
def model_and_params():
    cfg = ModelConfig(n_his=4, nf=32, pstep=2)
    model = DynamicsPredictor(cfg)
    g = _toy_graph(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), g["state"], g["attrs"], g["recv"],
                        g["send"], g["edge_valid"], g["p_instance"],
                        g["physics_param"], action=g["action"])["params"]
    return model, params


def _apply(model, params, g):
    return model.apply({"params": params}, g["state"], g["attrs"], g["recv"],
                       g["send"], g["edge_valid"], g["p_instance"],
                       g["physics_param"], action=g["action"])


class TestModel:
    def test_output_shapes(self, model_and_params):
        model, params = model_and_params
        g = _toy_graph(jax.random.PRNGKey(2))
        pred, motion = _apply(model, params, g)
        assert pred.shape == (20, 3) and motion.shape == (20, 3)

    def test_translation_invariant_motion(self, model_and_params):
        """With state_dim=0 absolute positions only enter via edge pos-diffs,
        so predicted MOTION must be translation invariant (the inductive bias
        the reference relies on for its rotation augmentation)."""
        model, params = model_and_params
        g = _toy_graph(jax.random.PRNGKey(3))
        _, m1 = _apply(model, params, g)
        g2 = dict(g, state=g["state"] + jnp.array([5.0, -2.0, 3.0]))
        # same edges (translation preserves distances)
        _, m2 = _apply(model, params, g2)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=2e-4)

    def test_physics_param_changes_prediction(self, model_and_params):
        model, params = model_and_params
        g = _toy_graph(jax.random.PRNGKey(4))
        _, m1 = _apply(model, params, g)
        _, m2 = _apply(model, params, dict(g, physics_param=jnp.array([0.9])))
        assert np.abs(np.asarray(m1) - np.asarray(m2)).max() > 1e-6

    def test_invalid_edges_do_not_leak(self, model_and_params):
        """Zeroing out a padded (invalid) edge's endpoints must not change
        valid-node predictions."""
        model, params = model_and_params
        g = _toy_graph(jax.random.PRNGKey(5))
        _, m1 = _apply(model, params, g)
        nvalid = int(np.asarray(g["edge_valid"]).sum())
        recv2 = np.asarray(g["recv"]).copy()
        send2 = np.asarray(g["send"]).copy()
        recv2[nvalid:] = 7  # scramble padded slots
        send2[nvalid:] = 3
        _, m2 = _apply(model, params, dict(g, recv=jnp.array(recv2), send=jnp.array(send2)))
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)

    def test_param_count_matches_reference_scale(self):
        """nf=150 configuration lands at the reference's ~0.4M params
        (model.py:96-122, input dims 6 node / 17 edge for rope)."""
        cfg = ModelConfig(n_his=4, nf=150, pstep=3)
        model = DynamicsPredictor(cfg)
        g = _toy_graph(jax.random.PRNGKey(0))
        params = model.init(jax.random.PRNGKey(1), g["state"], g["attrs"], g["recv"],
                            g["send"], g["edge_valid"], g["p_instance"],
                            g["physics_param"], action=g["action"])["params"]
        n = sum(x.size for x in jax.tree.leaves(params))
        assert 2.5e5 < n < 6e5


class TestTrainStep:
    def test_loss_decreases_on_fixed_batch(self):
        from adaptigraph_tpu.dynamics.train import make_train_step

        cfg = ModelConfig(n_his=4, nf=32, pstep=2)
        model = DynamicsPredictor(cfg)
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        gs = [_toy_graph(k) for k in keys]
        batch = jax.tree.map(lambda *x: jnp.stack(x), *gs)
        # future supervision: small drift targets
        b, n_obj = 4, 20
        batch["state_future"] = jnp.tile(
            batch["state"][:, -1, :n_obj][:, None], (1, 3, 1, 1)) + 0.01
        batch["eef_future"] = jnp.zeros((b, 2, 21, 3))
        batch["action_future"] = jnp.zeros((b, 2, 21, 3))

        params = model.init(jax.random.PRNGKey(1), gs[0]["state"], gs[0]["attrs"],
                            gs[0]["recv"], gs[0]["send"], gs[0]["edge_valid"],
                            gs[0]["p_instance"], gs[0]["physics_param"],
                            action=gs[0]["action"])["params"]
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        train_step, eval_step = make_train_step(model, 3, opt)
        losses = []
        for _ in range(30):
            params, opt_state, loss = train_step(params, opt_state, batch)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.5


class TestPreprocess:
    def test_extract_push_padding(self):
        from adaptigraph_tpu.dynamics.preprocess import extract_push

        # eef moving +x at 0.05/frame; dist_thresh 0.09 -> anchors every 2
        # frames (0.09 not 0.10 to stay clear of float-equality boundaries)
        t = 12
        eef = np.zeros((t, 1, 3))
        eef[:, 0, 0] = np.arange(t) * 0.05
        pairs, cnt = extract_push(eef, 0.09, n_his=4, n_future=3, n_frames=0)
        assert cnt == t and pairs.shape == (t, 7)
        # first frame: history fully padded with frame 0
        np.testing.assert_array_equal(pairs[0, :4], [0, 0, 0, 0])
        # history anchors are non-decreasing, future non-decreasing
        assert (np.diff(pairs, axis=1) >= 0).all()
        # middle frame: anchors spaced 2 frames
        row = pairs[8]
        np.testing.assert_array_equal(row[:4], [2, 4, 6, 8])
        np.testing.assert_array_equal(row[4:], [10, 10, 10])  # 10, then padded with the last anchor

    def test_process_eef_applies_offset(self):
        from adaptigraph_tpu.dynamics.preprocess import process_eef

        t = 2
        eef_states = np.zeros((t, 1, 14))
        eef_states[:, 0, 0:3] = [1.0, 2.0, 3.0]
        eef_states[:, 0, 6:10] = [0, 0, 0, 1]  # identity quat
        out = process_eef(eef_states, {"max_neef": 1, "pos": [[0.0, 0.0, 1.0]]})
        np.testing.assert_allclose(out[0, 0], [1, 2, 4])

    def test_process_eef_granular_reuses_last_link(self):
        from adaptigraph_tpu.dynamics.preprocess import process_eef

        eef_states = np.zeros((1, 1, 14))
        eef_states[0, 0, 0:3] = [0, 0, 0]
        eef_states[0, 0, 6:10] = [0, 0, 0, 1]
        offs = [[0.5, 0.045, 1.25], [-0.5, 0.045, 1.25], [0.0, 0.045, 1.25],
                [0.25, 0.045, 1.25], [-0.25, 0.0, 1.25]]
        out = process_eef(eef_states, {"max_neef": 5, "pos": offs})
        assert out.shape == (1, 5, 3)
        np.testing.assert_allclose(out[0], np.array(offs))


class TestDatasetPrep:
    def test_prepare_graph_batch_shapes(self, tmp_path):
        """End-to-end device graph build from a synthetic raw batch."""
        from adaptigraph_tpu.dynamics.dataset import _prepare_one

        rng = np.random.RandomState(0)
        t_w, n_raw, n_eef = 7, 300, 1
        obj = jnp.array(rng.rand(t_w, n_raw, 3).astype(np.float32))
        eef = jnp.array(rng.rand(t_w, n_eef, 3).astype(np.float32))
        g = _prepare_one(obj, eef, jnp.int32(250), jnp.array([0.5]),
                         jax.random.PRNGKey(0), n_his=4, n_future=3, max_nobj=100,
                         max_nR=1000, fps_radius_range=(0.18, 0.22),
                         adj_radius_range=(0.48, 0.52), topk=10,
                         connect_tool_all=False, state_noise=0.05, phys_noise=0.0,
                         augment=True)
        assert g["state"].shape == (4, 101, 3)
        assert g["state_future"].shape == (3, 100, 3)
        assert g["recv"].shape == (1000,)
        assert int(g["obj_mask"].sum()) > 0
        # eef row of attrs set
        assert float(g["attrs"][100, 1]) == 1.0
        # padded object rows carry only the augmentation noise (<=0.05 per
        # axis, up to sqrt(2)x after the random xy rotation)
        om = np.asarray(g["obj_mask"])
        st = np.asarray(g["state"])[:, :100]
        assert np.abs(st[:, ~om]).max() < 0.05 * np.sqrt(2) + 1e-2


class TestAggregationModes:
    """'matmul' / 'segment' / 'slotted' share params and must agree.

    'slotted' requires edges from build_edges_slotted (slot row i belongs to
    receiver i); on such edges all three modes compute the same math."""

    def test_modes_agree_on_slotted_edges(self):
        from adaptigraph_tpu.ops import build_edges_slotted

        n_obj, n_eef, n_his = 20, 1, 4
        n = n_obj + n_eef
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        state = jax.random.normal(k1, (n_his, n, 3)) * 0.3
        attrs = jnp.zeros((n, 2)).at[:n_obj, 0].set(1.0).at[n_obj:, 1].set(1.0)
        sm = jnp.ones(n, bool)
        em = jnp.zeros(n, bool).at[n_obj:].set(True)
        e = build_edges_slotted(state[-1], 1.0, sm, em, topk=6)
        action = jnp.zeros((n, 3)).at[n_obj:].set(
            jax.random.normal(k2, (n_eef, 3)) * 0.1)
        args = (state, attrs, e.receivers, e.senders, e.valid,
                jnp.ones((n_obj, 1)), jnp.array([0.5]))

        outs = {}
        params = None
        for mode in ("segment", "matmul", "slotted", "slotmm"):
            cfg = ModelConfig(n_his=n_his, nf=32, pstep=2, aggregation=mode)
            model = DynamicsPredictor(cfg)
            if params is None:
                params = model.init(jax.random.PRNGKey(1), *args,
                                    action=action)["params"]
            outs[mode] = model.apply({"params": params}, *args, action=action)[0]

        np.testing.assert_allclose(outs["segment"], outs["slotted"],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(outs["segment"], outs["matmul"],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(outs["segment"], outs["slotmm"],
                                   rtol=1e-4, atol=1e-4)

    def test_bf16_prediction_close_to_f32(self):
        """bf16 compute (ADAPTIGRAPH_GNN_DTYPE=bf16, params stay f32) must
        stay within a small fraction of the motion scale of the f32 path —
        the acceptance bound behind bench.py's bf16 serving configuration."""
        from adaptigraph_tpu.ops import build_edges_slotted

        n_obj, n_eef, n_his = 40, 1, 4
        n = n_obj + n_eef
        k1, k2 = jax.random.split(jax.random.PRNGKey(7))
        state = jax.random.normal(k1, (n_his, n, 3)) * 0.3
        attrs = jnp.zeros((n, 2)).at[:n_obj, 0].set(1.0).at[n_obj:, 1].set(1.0)
        sm = jnp.ones(n, bool)
        em = jnp.zeros(n, bool).at[n_obj:].set(True)
        e = build_edges_slotted(state[-1], 1.0, sm, em, topk=6)
        action = jnp.zeros((n, 3)).at[n_obj:].set(
            jax.random.normal(k2, (n_eef, 3)) * 0.1)
        args = (state, attrs, e.receivers, e.senders, e.valid,
                jnp.ones((n_obj, 1)), jnp.array([0.5]))

        cfg32 = ModelConfig(n_his=n_his, nf=150, pstep=3, aggregation="slotted")
        model32 = DynamicsPredictor(cfg32)
        params = model32.init(jax.random.PRNGKey(1), *args,
                              action=action)["params"]
        _, mo32 = model32.apply({"params": params}, *args, action=action)
        cfg16 = ModelConfig(n_his=n_his, nf=150, pstep=3,
                            aggregation="slotted",
                            compute_dtype=jnp.bfloat16)
        _, mo16 = DynamicsPredictor(cfg16).apply({"params": params}, *args,
                                                 action=action)
        scale = float(jnp.abs(mo32).max()) + 1e-6
        dev = float(jnp.abs(mo16 - mo32).max())
        # bf16 has ~3 significant digits; through 3 propagation rounds the
        # deviation stays a few percent of the predicted motion scale
        assert dev / scale < 0.08, (dev, scale)

    def test_slotted_rejects_non_multiple_edge_count(self):
        g = _toy_graph(jax.random.PRNGKey(0), max_nR=97)
        cfg = ModelConfig(n_his=4, nf=32, pstep=2, aggregation="slotted")
        model = DynamicsPredictor(cfg)
        with pytest.raises(AssertionError):
            model.init(jax.random.PRNGKey(1), g["state"], g["attrs"],
                       g["recv"], g["send"], g["edge_valid"],
                       g["p_instance"], g["physics_param"],
                       action=g["action"])


class TestSlottedTraining:
    """Slotted edge layout through prepare -> train step: the loss trajectory
    must track the row-major path (same edge set, permutation-invariant
    message passing, shared parameters)."""

    def _toy_graph_slotted(self, key, n_obj=20, n_eef=1, n_his=4):
        from adaptigraph_tpu.ops import build_edges_slotted

        k1, k2 = jax.random.split(key, 2)
        n = n_obj + n_eef
        state = jax.random.normal(k1, (n_his, n, 3)) * 0.3
        attrs = jnp.zeros((n, 2)).at[:n_obj, 0].set(1.0).at[n_obj:, 1].set(1.0)
        sm = jnp.ones(n, bool)
        em = jnp.zeros(n, bool).at[n_obj:].set(True)
        e = build_edges_slotted(state[-1], 1.0, sm, em, topk=10)
        action = jnp.zeros((n, 3)).at[n_obj:].set(
            jax.random.normal(k2, (n_eef, 3)) * 0.1)
        return {
            "state": state, "attrs": attrs, "recv": e.receivers,
            "send": e.senders, "edge_valid": e.valid,
            "p_instance": jnp.ones((n_obj, 1)),
            "physics_param": jnp.array([0.5]), "action": action,
            "obj_mask": jnp.ones(n_obj, bool),
        }

    def test_slotted_train_step_loss_decreases(self):
        from adaptigraph_tpu.dynamics.train import make_train_step

        cfg = ModelConfig(n_his=4, nf=32, pstep=2, aggregation="slotted")
        model = DynamicsPredictor(cfg)
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        gs = [self._toy_graph_slotted(k) for k in keys]
        batch = jax.tree.map(lambda *x: jnp.stack(x), *gs)
        b, n_obj = 4, 20
        batch["state_future"] = jnp.tile(
            batch["state"][:, -1, :n_obj][:, None], (1, 3, 1, 1)) + 0.01
        batch["eef_future"] = jnp.zeros((b, 2, 21, 3))
        batch["action_future"] = jnp.zeros((b, 2, 21, 3))
        params = model.init(jax.random.PRNGKey(1), gs[0]["state"], gs[0]["attrs"],
                            gs[0]["recv"], gs[0]["send"], gs[0]["edge_valid"],
                            gs[0]["p_instance"], gs[0]["physics_param"],
                            action=gs[0]["action"])["params"]
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        train_step, _ = make_train_step(model, 3, opt)
        losses = []
        for _ in range(30):
            params, opt_state, loss = train_step(params, opt_state, batch)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.5

    def test_prepare_one_slotted_layout(self):
        """_prepare_one(slotted=True) emits n-divisible slot edges with the
        same valid edge set as the row-major path."""
        from adaptigraph_tpu.dynamics.dataset import _prepare_one

        rng = np.random.RandomState(0)
        t_w, n_raw, n_eef = 7, 60, 1
        obj = jnp.asarray(rng.randn(t_w, n_raw, 3) * 0.3)
        eef = jnp.asarray(rng.randn(t_w, n_eef, 3) * 0.3)
        kw = dict(n_his=4, n_future=3, max_nobj=40, max_nR=400,
                  fps_radius_range=(0.05, 0.1), adj_radius_range=(0.5, 0.5),
                  topk=5, connect_tool_all=False, state_noise=0.0,
                  phys_noise=0.0, augment=False)
        g_row = _prepare_one(obj, eef, jnp.int32(n_raw), jnp.ones(1), 
                             jax.random.PRNGKey(7), slotted=False, **kw)
        g_slot = _prepare_one(obj, eef, jnp.int32(n_raw), jnp.ones(1),
                              jax.random.PRNGKey(7), slotted=True, **kw)
        n = 41
        assert g_slot["recv"].shape[0] % n == 0
        row_set = {(int(r), int(s)) for r, s, v in zip(
            g_row["recv"], g_row["send"], g_row["edge_valid"]) if v}
        slot_set = {(int(r), int(s)) for r, s, v in zip(
            g_slot["recv"], g_slot["send"], g_slot["edge_valid"]) if v}
        assert row_set == slot_set


class TestTrainChunkModes:
    """Fused K-step train chunk (device-resident dataset): 'matmul' and
    'slotted' aggregation must both run under the CPU mesh and produce
    closely matching loss trajectories (same math, different layout)."""

    def test_chunk_modes_agree(self):
        import types
        import optax
        from adaptigraph_tpu.dynamics.train import make_train_chunk
        from adaptigraph_tpu.ops import build_edges_slotted
        from adaptigraph_tpu.parallel.mesh import make_mesh, replicate

        e, t_max, n_raw, n_eef = 2, 10, 40, 1
        rng = np.random.RandomState(0)
        common = {
            "obj": jnp.asarray(rng.randn(e, t_max, n_raw, 3).astype(np.float32) * 0.3),
            "eef": jnp.asarray(rng.randn(e, t_max, n_eef, 3).astype(np.float32) * 0.3),
            "nobj": jnp.full((e,), n_raw, jnp.int32),
            "phys": jnp.full((e, 1), 0.5, jnp.float32),
        }
        n_his, n_future, t_w = 4, 3, 7
        rows = [[epi] + list(range(t0, t0 + t_w))
                for epi in range(e) for t0 in range(t_max - t_w)]
        pairs = jnp.asarray(np.array(rows, np.int32))
        ds = types.SimpleNamespace(
            n_his=n_his, n_future=n_future, max_nobj=24, max_nR=240,
            fps_radius_range=(0.05, 0.1), adj_radius_range=(0.6, 0.6),
            topk=6, connect_tool_all=False, state_noise=0.0,
            phys_noise=0.0, augment=False)
        K, B = 2, 8
        idxs = jnp.asarray(
            np.random.RandomState(1).randint(0, len(rows), (K, B)), jnp.int32)
        key = jax.random.PRNGKey(0)
        mesh = make_mesh()

        losses = {}
        for mode in ("matmul", "slotted"):
            cfg = ModelConfig(n_his=n_his, nf=16, pstep=2, aggregation=mode)
            model = DynamicsPredictor(cfg)
            n = ds.max_nobj + n_eef
            st = jnp.zeros((n_his, n, 3))
            es = build_edges_slotted(st[-1], 0.6, jnp.ones(n, bool),
                                     jnp.zeros(n, bool).at[ds.max_nobj:].set(True),
                                     topk=ds.topk)
            params = model.init(jax.random.PRNGKey(1), st, jnp.zeros((n, 2)),
                                es.receivers, es.senders, es.valid,
                                jnp.ones((ds.max_nobj, 1)), jnp.array([0.5]),
                                action=jnp.zeros((n, 3)))["params"]
            opt = optax.adam(1e-3)
            chunk, _ = make_train_chunk(model, n_future, opt, ds, common,
                                        pairs, mesh)
            p = replicate(params, mesh)
            o = replicate(opt.init(params), mesh)
            _, _, ls = chunk(p, o, idxs, key)
            losses[mode] = np.asarray(ls)

        # same edge SET, different layout: loss trajectories must agree to
        # float tolerance (augment/noise off, same PRNG stream)
        np.testing.assert_allclose(losses["matmul"], losses["slotted"],
                                   rtol=2e-3, atol=2e-4)


class TestPairWalk:
    """get_next_pair: the per-push walk vs the episode-forward scan
    (reference graph.py:374-400; the scan is what reaches 100-step
    horizons by chaining across push boundaries)."""

    def _table(self, n_his=4):
        # two "pushes": frames 0..9 and 14..23, pairs are consecutive
        # history windows (start col n_his-1, end col n_his)
        rows = []
        for s in range(0, 6):
            rows.append(list(range(s, s + n_his + 1)))
        for s in range(14, 19):
            rows.append(list(range(s, s + n_his + 1)))
        return np.asarray(rows, int)

    def test_no_scan_breaks_at_push_end(self):
        from adaptigraph_tpu.dynamics.rollout import get_next_pair

        pairs = self._table()
        # walk push 1 to its last pair, then stop
        cur = pairs[0][3]  # n_his-1 col of first pair
        end = pairs[0][4]
        steps = 0
        while True:
            nxt = get_next_pair(pairs, 4, end)
            if nxt is None:
                break
            end = nxt[4]
            steps += 1
        assert end == pairs[5][4]  # last pair of push 1
        assert steps == 5

    def test_scan_chains_across_pushes(self):
        from adaptigraph_tpu.dynamics.rollout import get_next_pair

        pairs = self._table()
        end = pairs[0][4]
        ends = []
        while True:
            nxt = get_next_pair(pairs, 4, end, n_frames=30, scan=True)
            if nxt is None:
                break
            end = nxt[4]
            ends.append(end)
        # the scan jumps the 10..13 gap into push 2 and finishes its table
        assert ends[-1] == pairs[-1][4]
        assert len(ends) == 10

    def test_scan_returns_none_past_final_frame(self):
        from adaptigraph_tpu.dynamics.rollout import get_next_pair

        pairs = self._table()
        assert get_next_pair(pairs, 4, pairs[-1][4], n_frames=30,
                             scan=True) is None
