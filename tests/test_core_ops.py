"""Golden tests for geometry, FPS, edge construction, and losses.

Oracles are small numpy re-derivations of the reference semantics
(src/dynamics/dataset/graph.py, src/sim/utils.py, src/planning/losses.py),
hand-checked on tiny cases.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from adaptigraph_tpu.utils import geometry as geo
from adaptigraph_tpu.ops import (
    farthest_point_sampling,
    fps_radius,
    fps_subsample,
    build_edges,
    build_edges_batch,
    edges_to_incidence,
    chamfer,
    masked_chamfer,
    box_loss,
    earth_mover_distance,
)


class TestGeometry:
    def test_quat_matches_scipy(self, rng):
        for _ in range(20):
            q = rng.randn(4)
            q = q / np.linalg.norm(q)
            ours = np.asarray(geo.quat_to_matrix(jnp.array(q, dtype=jnp.float32)))
            scipys = Rotation.from_quat(q).as_matrix()
            np.testing.assert_allclose(ours, scipys, atol=1e-5)

    def test_quat_multiply_matches_scipy(self, rng):
        q1, q2 = rng.randn(4), rng.randn(4)
        q1, q2 = q1 / np.linalg.norm(q1), q2 / np.linalg.norm(q2)
        ours = np.asarray(geo.quat_multiply(jnp.array(q1), jnp.array(q2)))
        scipys = (Rotation.from_quat(q1) * Rotation.from_quat(q2)).as_quat()
        # quaternion double cover: compare up to sign
        assert np.allclose(ours, scipys, atol=1e-5) or np.allclose(-ours, scipys, atol=1e-5)

    def test_rotate_roundtrip(self, rng):
        q = geo.quat_from_axis_angle(jnp.array([0.3, 0.5, -0.2]), 1.1)
        v = jnp.array(rng.randn(5, 3), dtype=jnp.float32)
        rotated = geo.quat_rotate(q, v)
        back = geo.quat_rotate(geo.quat_conjugate(q), rotated)
        np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)

    def test_matrix_to_quat_roundtrip(self, rng):
        for _ in range(10):
            q = rng.randn(4)
            q = q / np.linalg.norm(q)
            m = Rotation.from_quat(q).as_matrix()
            q2 = np.asarray(geo.matrix_to_quat(jnp.array(m, dtype=jnp.float32)))
            m2 = Rotation.from_quat(q2).as_matrix()
            np.testing.assert_allclose(m2, m, atol=1e-4)

    def test_extract_rotation_recovers_pure_rotation(self, rng):
        R = Rotation.from_euler("xyz", [0.4, -0.3, 0.9]).as_matrix().astype(np.float32)
        q = geo.extract_rotation(jnp.array(R), geo.XYZW_IDENTITY, iterations=30)
        np.testing.assert_allclose(np.asarray(geo.quat_to_matrix(q)), R, atol=1e-3)

    def test_extract_rotation_strips_stretch(self, rng):
        R = Rotation.from_euler("xyz", [0.2, 0.7, -0.5]).as_matrix().astype(np.float32)
        S = np.diag([1.5, 0.8, 1.1]).astype(np.float32)  # symmetric positive stretch
        A = R @ S
        q = geo.extract_rotation(jnp.array(A), geo.XYZW_IDENTITY, iterations=40)
        np.testing.assert_allclose(np.asarray(geo.quat_to_matrix(q)), R, atol=1e-2)


def _fps_oracle(points, n, start):
    """Straight numpy FPS (greedy farthest point), the dgl semantics."""
    idx = [start]
    dist = np.linalg.norm(points - points[start], axis=1)
    for _ in range(n - 1):
        nxt = int(np.argmax(dist))
        idx.append(nxt)
        dist = np.minimum(dist, np.linalg.norm(points - points[nxt], axis=1))
    return np.array(idx)


class TestFPS:
    def test_matches_numpy_oracle(self, rng):
        pts = rng.randn(200, 3).astype(np.float32)
        idx, _ = farthest_point_sampling(jnp.array(pts), 50, start_idx=7)
        np.testing.assert_array_equal(np.asarray(idx), _fps_oracle(pts, 50, 7))

    def test_radius_stop_matches_reference_loop(self, rng):
        pts = rng.randn(100, 3).astype(np.float32)
        radius = 0.8
        # reference fps_rad_idx loop (sim/utils.py:119-133) with start 0
        sel = [0]
        dist = np.linalg.norm(pts - pts[0], axis=1)
        while dist.max() > radius:
            sel.append(int(dist.argmax()))
            dist = np.minimum(dist, np.linalg.norm(pts - pts[sel[-1]], axis=1))
        idx, keep = fps_radius(jnp.array(pts), radius, 100, start_idx=0)
        got = np.asarray(idx)[np.asarray(keep)]
        np.testing.assert_array_equal(got, np.array(sel))

    def test_fps_subsample_shapes_and_coverage(self, rng):
        # max_n == N so stage 1 is exhaustive and the radius-stop guarantee
        # covers the full cloud (with max_n < N coverage is only as good as
        # the stage-1 FPS residual, as in the reference).
        pts = rng.rand(100, 3).astype(np.float32) * 4
        idx, keep = fps_subsample(jnp.array(pts), 100, 0.5, jax.random.PRNGKey(0))
        idx, keep = np.asarray(idx), np.asarray(keep)
        assert idx.shape == (100,)
        kept = pts[idx[keep]]
        assert len(np.unique(idx[keep])) == keep.sum()
        # every original point should be within radius of a kept sample
        d = np.linalg.norm(pts[:, None] - kept[None], axis=-1).min(1)
        assert d.max() <= 0.5 + 1e-5

    def test_valid_mask_respected(self, rng):
        pts = rng.randn(50, 3).astype(np.float32)
        valid = np.zeros(50, dtype=bool)
        valid[:20] = True
        idx, _ = farthest_point_sampling(jnp.array(pts), 10, 3, jnp.array(valid))
        assert np.all(np.asarray(idx) < 20)


def _edges_oracle(states, thresh, mask, tool_mask, topk, connect_tools_all):
    """numpy oracle for reference construct_edges_from_states (graph.py:38-89)."""
    n = states.shape[0]
    dis = np.sum((states[:, None] - states[None]) ** 2, -1)
    pair = mask[:, None] & mask[None]
    dis[~pair] = 1e10
    toolpair = tool_mask[:, None] & tool_mask[None]
    dis[toolpair] = 1e10
    adj = (dis < thresh * thresh).astype(np.float32)
    k = min(n, topk)
    topk_idx = np.argsort(dis, axis=-1, kind="stable")[:, :k]
    topk_mat = np.zeros_like(adj)
    np.put_along_axis(topk_mat, topk_idx, 1.0, axis=-1)
    adj = adj * topk_mat
    if connect_tools_all:
        adj[tool_mask[:, None] & mask[None]] = 0
        adj[mask[:, None] & tool_mask[None]] = 1
        adj[toolpair] = 0
        adj = adj * mask[None] * mask[:, None]
    rels = np.argwhere(adj > 0)  # row-major, like torch nonzero
    return rels


class TestEdges:
    @pytest.mark.parametrize("connect_tools_all", [False, True])
    def test_matches_oracle(self, rng, connect_tools_all):
        n, nobj = 40, 30
        states = rng.randn(n, 3).astype(np.float32)
        mask = np.zeros(n, dtype=bool)
        mask[:25] = True
        mask[nobj : nobj + 5] = True
        tool_mask = np.zeros(n, dtype=bool)
        tool_mask[nobj : nobj + 5] = True
        thresh = 1.0
        es = build_edges(jnp.array(states), thresh, jnp.array(mask), jnp.array(tool_mask),
                         topk=10, connect_tools_all=connect_tools_all, max_edges=600)
        got = np.stack([np.asarray(es.receivers), np.asarray(es.senders)], 1)[np.asarray(es.valid)]
        want = _edges_oracle(states, thresh, mask, tool_mask, 10, connect_tools_all)
        np.testing.assert_array_equal(got, want)

    def test_incidence_matches(self, rng):
        n = 20
        states = rng.randn(n, 3).astype(np.float32)
        mask = np.ones(n, dtype=bool)
        tool_mask = np.zeros(n, dtype=bool)
        tool_mask[-3:] = True
        es = build_edges(jnp.array(states), 1.2, jnp.array(mask), jnp.array(tool_mask),
                         topk=5, max_edges=200)
        rr, rs = edges_to_incidence(es, n)
        want = _edges_oracle(states, 1.2, mask, tool_mask, 5, False)
        nrel = want.shape[0]
        rr, rs = np.asarray(rr), np.asarray(rs)
        assert rr[:nrel].argmax(1).tolist() == want[:, 0].tolist()
        assert rs[:nrel].argmax(1).tolist() == want[:, 1].tolist()
        assert rr[nrel:].sum() == 0 and rs[nrel:].sum() == 0

    def test_batch_variant(self, rng):
        b, n = 4, 24
        states = rng.randn(b, n, 3).astype(np.float32)
        mask = np.ones((b, n), dtype=bool)
        tool = np.zeros((b, n), dtype=bool)
        tool[:, -2:] = True
        thresh = np.array([0.8, 1.0, 1.2, 1.4], dtype=np.float32)
        es = build_edges_batch(jnp.array(states), jnp.array(thresh), jnp.array(mask),
                               jnp.array(tool), topk=8, max_edges=300)
        for i in range(b):
            want = _edges_oracle(states[i], thresh[i], mask[i], tool[i], 8, False)
            got = np.stack([np.asarray(es.receivers[i]), np.asarray(es.senders[i])], 1)[
                np.asarray(es.valid[i])]
            np.testing.assert_array_equal(got, want)

    def test_tools_only_when_near_gates_connection(self):
        # tool far from the object: no obj<-tool edges should appear
        states = np.zeros((5, 3), dtype=np.float32)
        states[:4] = np.array([[0, 0, 0], [0.1, 0, 0], [0, 0.1, 0], [0.1, 0.1, 0]])
        states[4] = np.array([50.0, 0, 0])  # tool, far away
        mask = np.ones(5, dtype=bool)
        tool = np.array([False] * 4 + [True])
        es = build_edges(jnp.array(states), 0.5, jnp.array(mask), jnp.array(tool), topk=5,
                         connect_tools_all=True, tools_only_when_near=True, max_edges=50)
        send = np.asarray(es.senders)[np.asarray(es.valid)]
        assert not np.any(send == 4)


class TestLosses:
    def test_chamfer_identity_zero(self, rng):
        x = jnp.array(rng.randn(2, 30, 3), dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(chamfer(x, x)), 0.0, atol=1e-4)

    def test_chamfer_oracle(self, rng):
        x = rng.randn(1, 10, 3).astype(np.float32)
        y = rng.randn(1, 15, 3).astype(np.float32)
        d = np.linalg.norm(x[0][:, None] - y[0][None], axis=-1)
        want = d.min(1).mean() + d.min(0).mean()
        got = np.asarray(chamfer(jnp.array(x), jnp.array(y)))[0]
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_masked_chamfer_ignores_padding(self, rng):
        x = rng.randn(2, 20, 3).astype(np.float32)
        y = rng.randn(2, 20, 3).astype(np.float32)
        xm = np.zeros((2, 20), dtype=bool)
        ym = np.zeros((2, 20), dtype=bool)
        xm[:, :12] = True
        ym[:, :8] = True
        got = np.asarray(masked_chamfer(jnp.array(x), jnp.array(y), jnp.array(xm), jnp.array(ym)))
        for i in range(2):
            want = np.asarray(chamfer(jnp.array(x[i : i + 1, :12]), jnp.array(y[i : i + 1, :8])))[0]
            np.testing.assert_allclose(got[i], want, rtol=1e-5)

    def test_box_loss_inside_zero(self):
        state = jnp.zeros((1, 5, 3))
        target = jnp.array([[-1.0, 1.0], [-1.0, 1.0]])
        np.testing.assert_allclose(np.asarray(box_loss(state, target)), 0.0, atol=1e-5)

    def test_box_loss_outside_distance(self):
        state = jnp.array([[[3.0, 0.0, 0.0]]])
        target = jnp.array([[-1.0, 1.0], [-1.0, 1.0]])
        np.testing.assert_allclose(np.asarray(box_loss(state, target)), 2.0, atol=1e-4)

    def test_emd_close_to_exact_on_permutation(self, rng):
        x = rng.randn(16, 3).astype(np.float32)
        y = x[rng.permutation(16)]
        got = np.asarray(earth_mover_distance(jnp.array(x), jnp.array(y), eps=0.005, iters=200))
        assert got < 0.05  # exact EMD is 0 for a permutation


class TestSlottedEdges:
    """build_edges_slotted must produce the SAME valid edge set as
    build_edges (graph.py:53-156 semantics) — only order/padding differ."""

    def _edge_set(self, edges):
        r = np.asarray(edges.receivers)[np.asarray(edges.valid)]
        s = np.asarray(edges.senders)[np.asarray(edges.valid)]
        return set(zip(r.tolist(), s.tolist()))

    def _case(self, seed, cta, near_gate, far_tool=False):
        from adaptigraph_tpu.ops import build_edges, build_edges_slotted

        rng = np.random.RandomState(seed)
        n_obj, n_tool = 40, 3
        n = n_obj + n_tool
        pts = rng.rand(n, 3).astype(np.float32)
        if far_tool:
            pts[n_obj:] += 10.0  # tool far away: near gate must drop edges
        mask = np.ones(n, bool)
        mask[n_obj - 3:n_obj] = False  # padded objects
        tool = np.zeros(n, bool)
        tool[n_obj:] = True
        a = build_edges(jnp.array(pts), 0.35, jnp.array(mask), jnp.array(tool),
                        topk=6, connect_tools_all=cta,
                        tools_only_when_near=near_gate, max_edges=4000)
        b = build_edges_slotted(jnp.array(pts), 0.35, jnp.array(mask),
                                jnp.array(tool), topk=6,
                                connect_tools_all=cta,
                                tools_only_when_near=near_gate)
        assert self._edge_set(a) == self._edge_set(b)

    def test_plain_radius_topk(self):
        for seed in range(3):
            self._case(seed, cta=False, near_gate=False)

    def test_connect_tools_all(self):
        for seed in range(3):
            self._case(seed, cta=True, near_gate=False)

    def test_connect_tools_near_gate(self):
        self._case(0, cta=True, near_gate=True)
        self._case(0, cta=True, near_gate=True, far_tool=True)


class TestNativeFPS:
    """native/fps.cpp vs the numpy fallback: bit-identical index sequences."""

    def test_native_lib_loads(self):
        from adaptigraph_tpu.utils import host_fps as hf
        assert hf._load(), "libfps.so missing — run native/build.sh"

    def test_fps_with_idx_matches_numpy(self):
        from adaptigraph_tpu.utils import host_fps as hf
        pts = np.random.RandomState(0).randn(500, 3).astype(np.float32)
        _, idx_nat = hf.fps_with_idx(pts, 64)
        _, idx_np = hf._fps_with_idx_np(pts, 64)
        assert np.array_equal(idx_nat, idx_np)

    def test_fps_rad_idx_matches_numpy(self):
        from adaptigraph_tpu.utils import host_fps as hf
        pts = np.random.RandomState(1).randn(400, 3).astype(np.float32)

        class FixedRng:
            def randint(self, n):
                return 7

        _, idx_nat = hf.fps_rad_idx(pts, 0.8, FixedRng())
        _, idx_np = hf._fps_rad_idx_np(pts, 0.8, start=7)
        assert np.array_equal(idx_nat, idx_np)
