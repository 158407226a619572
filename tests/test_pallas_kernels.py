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
