"""Pallas contact kernel vs the sparse reference implementation (interpret
mode on CPU; the compiled path runs on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from adaptigraph_tpu.engine.neighbors import neighbor_list
from adaptigraph_tpu.engine.solver import (
    _particle_contact_deltas, precompute_contact_static)
from adaptigraph_tpu.engine.pallas_kernels import dense_contact_deltas


def _sparse_reference(pos, pos_prev, group, inv_mass, sc, active, rest_pos,
                      rest_dist, friction, filter_dist, k=64):
    idx, valid = neighbor_list(pos, rest_dist * 1.5, active, k=k)
    eligible, share = precompute_contact_static(
        inv_mass, group, sc, active, idx, valid, rest_pos=rest_pos,
        filter_dist=filter_dist)
    return _particle_contact_deltas(pos, pos_prev, idx, eligible, share,
                                    rest_dist, friction)


def test_dense_matches_sparse():
    rng = np.random.RandomState(0)
    n = 200
    pos = jnp.array(rng.rand(n, 3).astype(np.float32) * 0.6)
    pos_prev = pos - jnp.array(rng.randn(n, 3).astype(np.float32)) * 0.002
    group = jnp.array(rng.randint(0, 8, n), jnp.int32)
    inv_mass = jnp.array(rng.rand(n).astype(np.float32) + 0.5)
    sc = jnp.array(rng.rand(n) > 0.5)
    active = jnp.ones(n, bool)
    rest_pos = jnp.array(rng.rand(n, 3).astype(np.float32) * 0.6)
    rest_dist, friction, filter_dist = 0.08, 0.25, 0.05

    d_sparse, c_sparse = _sparse_reference(pos, pos_prev, group, inv_mass, sc,
                                           active, rest_pos, rest_dist, friction,
                                           filter_dist)
    d_dense, c_dense = dense_contact_deltas(pos, pos_prev, group, inv_mass, sc,
                                            active, rest_pos, rest_dist, friction,
                                            filter_dist, interpret=True)
    np.testing.assert_array_equal(np.asarray(c_dense), np.asarray(c_sparse))
    np.testing.assert_allclose(np.asarray(d_dense), np.asarray(d_sparse),
                               atol=2e-5)


def test_refine_prunes_blocks_losslessly():
    """A long sparse chain (rope-like): most AABB-admitted blocks hold no
    eligible pair, refinement drops them, and the refined sweep result is
    bit-identical to the unrefined one."""
    from adaptigraph_tpu.engine.pallas_kernels import (
        block_sparse_contact_deltas, refine_overlap_blocks,
        tile_overlap_blocks)

    rng = np.random.RandomState(2)
    n = 512  # 4 row tiles
    # chain along x at spacing 0.05 with tiny jitter; one overlapping pair
    # folded in so at least one block keeps a genuine contact
    pos = np.zeros((n, 3), np.float32)
    pos[:, 0] = np.arange(n) * 0.05
    pos += rng.randn(n, 3).astype(np.float32) * 1e-3
    pos[400] = pos[10] + np.array([0.01, 0.0, 0.0], np.float32)
    pos = jnp.array(pos)
    group = jnp.array(np.arange(n) // 64, jnp.int32)  # 8 groups
    inv_mass = jnp.ones(n)
    sc = jnp.zeros(n, bool)
    active = jnp.ones(n, bool)
    rest_pos = jnp.array(rng.rand(n, 3).astype(np.float32))
    rest_dist, friction, filter_dist = 0.04, 0.25, 0.0

    bidx, bcnt, _ = tile_overlap_blocks(pos, active, rest_dist * 1.5)
    ridx, rcnt = refine_overlap_blocks(
        pos, pos, group, inv_mass, sc, active, rest_pos, rest_dist * 1.5,
        filter_dist, bidx, bcnt, interpret=True)
    rcnt_np, bcnt_np = np.asarray(rcnt), np.asarray(bcnt)
    assert (rcnt_np <= bcnt_np).all()
    assert rcnt_np.sum() < bcnt_np.sum()  # pruning actually happened
    assert rcnt_np.sum() >= 1             # the planted contact survives

    args = (pos, pos, group, inv_mass, sc, active, rest_pos, rest_dist,
            friction, filter_dist)
    d0, c0 = block_sparse_contact_deltas(*args, bidx, bcnt, interpret=True)
    d1, c1 = block_sparse_contact_deltas(*args, ridx, rcnt, interpret=True)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))


def test_inactive_and_padding_rows_are_zero():
    rng = np.random.RandomState(1)
    n = 150  # pads to 256
    pos = jnp.array(rng.rand(n, 3).astype(np.float32) * 0.3)
    active = jnp.array([True] * 100 + [False] * 50)
    d, c = dense_contact_deltas(
        pos, pos, jnp.zeros(n, jnp.int32), jnp.ones(n), jnp.ones(n, bool),
        active, jnp.zeros((n, 3)), 0.08, 0.0, 0.0, interpret=True)
    assert d.shape == (n, 3) and c.shape == (n,)
    np.testing.assert_allclose(np.asarray(d)[100:], 0.0)
    np.testing.assert_allclose(np.asarray(c)[100:], 0.0)
    # active overlapping particles DO produce contacts
    assert np.asarray(c)[:100].sum() > 0


def test_rest_filter_off_matches_on_for_non_self_colliding():
    """Granular-style particle sets (per-granule groups, no self-collide
    bit) must produce IDENTICAL contact deltas with the rest-distance
    filter statically compiled out (rest_filter=False) — it is the
    specialization the granular solver path uses."""
    from adaptigraph_tpu.engine.pallas_kernels import (
        block_sparse_contact_deltas, refine_overlap_blocks,
        tile_overlap_blocks)

    rng = np.random.RandomState(7)
    n = 512
    # a loose pile: clumps of 32 (one group each) with inter-clump overlap
    pos = (rng.rand(n, 3).astype(np.float32) * 0.8
           + rng.randn(n, 3).astype(np.float32) * 0.01)
    pos = jnp.array(pos)
    group = jnp.array(np.arange(n) // 32, jnp.int32)
    inv_mass = jnp.ones(n)
    sc = jnp.zeros(n, bool)  # no particle self-collides
    active = jnp.ones(n, bool)
    rest_pos = jnp.array(rng.rand(n, 3).astype(np.float32))
    rest_dist, friction, filter_dist = 0.06, 0.25, 0.03

    bidx, bcnt, _ = tile_overlap_blocks(pos, active, rest_dist * 1.5)
    args = (pos, pos, group, inv_mass, sc, active, rest_pos)
    r_on = refine_overlap_blocks(*args, rest_dist * 1.5, filter_dist,
                                 bidx, bcnt, interpret=True, rest_filter=True)
    r_off = refine_overlap_blocks(*args, rest_dist * 1.5, filter_dist,
                                  bidx, bcnt, interpret=True,
                                  rest_filter=False)
    np.testing.assert_array_equal(np.asarray(r_on[1]), np.asarray(r_off[1]))

    sweep = (pos, pos, group, inv_mass, sc, active, rest_pos, rest_dist,
             friction, filter_dist)
    d_on, c_on = block_sparse_contact_deltas(*sweep, bidx, bcnt,
                                             interpret=True, rest_filter=True)
    d_off, c_off = block_sparse_contact_deltas(*sweep, bidx, bcnt,
                                               interpret=True,
                                               rest_filter=False)
    assert np.asarray(c_on).sum() > 0  # the pile genuinely has contacts
    np.testing.assert_array_equal(np.asarray(c_on), np.asarray(c_off))
    np.testing.assert_array_equal(np.asarray(d_on), np.asarray(d_off))


def test_wide_col_blocks_match_narrow():
    """tile_j=256 col blocks must produce the same contact physics as the
    default 128-wide blocks (admission granularity only; pair math and
    eligibility are identical, summation order differs within a block)."""
    from adaptigraph_tpu.engine.pallas_kernels import (
        block_sparse_contact_deltas, refine_overlap_blocks,
        tile_overlap_blocks)

    rng = np.random.RandomState(11)
    n = 512
    pos = jnp.array(rng.rand(n, 3).astype(np.float32) * 0.7)
    group = jnp.array(np.arange(n) // 16, jnp.int32)
    inv_mass = jnp.ones(n)
    sc = jnp.zeros(n, bool)
    active = jnp.ones(n, bool)
    rest_pos = jnp.array(rng.rand(n, 3).astype(np.float32))
    rest_dist, friction, filter_dist = 0.06, 0.25, 0.0

    outs = {}
    for tj in (128, 256):
        bidx, bcnt, ovf = tile_overlap_blocks(pos, active, rest_dist * 1.5,
                                              tile_j=tj)
        assert int(ovf) == 0
        ridx, rcnt = refine_overlap_blocks(
            pos, pos, group, inv_mass, sc, active, rest_pos, rest_dist * 1.5,
            filter_dist, bidx, bcnt, interpret=True, tile_j=tj)
        d, c = block_sparse_contact_deltas(
            pos, pos, group, inv_mass, sc, active, rest_pos, rest_dist,
            friction, filter_dist, ridx, rcnt, interpret=True, tile_j=tj)
        outs[tj] = (np.asarray(d), np.asarray(c))
    assert outs[128][1].sum() > 0
    np.testing.assert_array_equal(outs[128][1], outs[256][1])
    np.testing.assert_allclose(outs[128][0], outs[256][0], atol=1e-6)


def test_fused_shape_stage_matches_xla_pass():
    """The in-kernel lane-major shape-contact stage must reproduce the XLA
    pass (collisions.shape_contact_deltas) for all four shape kinds."""
    from adaptigraph_tpu.engine.collisions import shape_contact_deltas
    from adaptigraph_tpu.engine.pallas_kernels import (
        block_sparse_contact_deltas_packed, pack_contact_tables,
        tile_overlap_blocks)
    from adaptigraph_tpu.engine.state import (
        SHAPE_BOX, SHAPE_CAPSULE, SHAPE_CONVEX, SHAPE_PLANE, make_shapes)

    rng = np.random.RandomState(3)
    n = 256
    pos = jnp.array(rng.rand(n, 3).astype(np.float32) * 1.2
                    - np.array([0.6, 0.0, 0.6], np.float32))
    pos_prev = pos - jnp.array(rng.randn(n, 3).astype(np.float32)) * 0.01
    group = jnp.array(np.arange(n) // 16, jnp.int32)
    inv_mass = jnp.ones(n)
    sc = jnp.zeros(n, bool)
    active = jnp.ones(n, bool)
    rest_pos = jnp.array(rng.rand(n, 3).astype(np.float32))
    rest_dist, friction, filter_dist = 0.05, 0.25, 0.0

    # floor plane + box + capsule + convex tetra-ish polytope, one padding slot
    tetra = np.array([[1, 0, 0, 0.2], [0, 1, 0, 0.2], [0, 0, 1, 0.2],
                      [-0.577, -0.577, -0.577, 0.1]], np.float32)
    shapes = make_shapes(
        [SHAPE_PLANE, SHAPE_BOX, SHAPE_CAPSULE, SHAPE_CONVEX],
        [[0, 0, 0], [0.3, 0.2, 0.3], [0.1, 0.3, 0], [0, 0, 0]],
        [[0, 0, 0], [0.2, 0.15, 0.0], [-0.3, 0.2, 0.1], [0.1, 0.1, -0.2]],
        [[0, 0, 0, 1], [0.1, 0.2, 0.0, 0.97], [0, 0, 0.38, 0.92],
         [0.2, 0, 0.1, 0.97]],
        m_max=5, planes=[None, None, None, tetra])
    a = 4  # active shape slots
    s_pos, s_quat = shapes.pos, shapes.quat
    s_vel = jnp.array(rng.randn(5, 3).astype(np.float32) * 0.05)
    cd, margin, dyn, dt = 0.04, 0.0, 0.3, 1.0 / 60

    d_xla, c_xla = shape_contact_deltas(pos, pos_prev, shapes, s_pos, s_quat,
                                        s_vel, cd, margin, dyn, dt)
    assert float(jnp.sum(c_xla)) > 0  # scene genuinely touches shapes

    rows, cols = pack_contact_tables(pos, pos_prev, group, inv_mass, sc,
                                     active, rest_pos)
    bidx, bcnt, _ = tile_overlap_blocks(pos, active, rest_dist * 1.5)
    d0, c0 = block_sparse_contact_deltas_packed(
        n, rows, cols, rest_dist, friction, filter_dist, bidx, bcnt,
        interpret=True)
    shp = jnp.concatenate([
        shapes.kind[:a, None].astype(jnp.float32),
        shapes.valid[:a, None].astype(jnp.float32),
        shapes.size[:a], s_pos[:a], s_quat[:a], s_vel[:a],
        jnp.zeros((a, 1), jnp.float32)], axis=1)
    planes2d = shapes.planes[:a].reshape(-1, 4)
    d1, c1 = block_sparse_contact_deltas_packed(
        n, rows, cols, rest_dist, friction, filter_dist, bidx, bcnt,
        interpret=True, shp=shp, planes2d=planes2d,
        shape_params=(cd, margin, dyn, dt))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0 + c_xla),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0 + d_xla),
                               atol=2e-5)
