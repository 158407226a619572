"""Cell-list neighbor search vs the exact dense top-k reference.

The hashed cell grid (engine/cells.py) must return exactly the same
neighbor SETS as the dense masked top-k (engine/neighbors.py) whenever the
K cap is not binding — the NvFlex hash grid semantics (SURVEY.md §3.5)."""

import numpy as np
import jax.numpy as jnp

from adaptigraph_tpu.engine.cells import cell_bucket_overflow, cell_list_neighbors
from adaptigraph_tpu.engine.neighbors import neighbor_list, neighbor_list_tiled


def _pair_set(idx, valid):
    idx = np.asarray(idx)
    valid = np.asarray(valid)
    pairs = set()
    for i in range(idx.shape[0]):
        for j, ok in zip(idx[i], valid[i]):
            if ok:
                pairs.add((i, int(j)))
    return pairs


def _random_cloud(n, seed, spread=1.0):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, 3).astype(np.float32) * spread).astype(np.float32)


def test_matches_dense_reference_exact_sets():
    for seed in range(3):
        pos = _random_cloud(300, seed, spread=1.0)
        active = np.ones(300, bool)
        radius = 0.15
        # K large enough that neither path truncates
        i_d, v_d = neighbor_list(jnp.asarray(pos), radius, jnp.asarray(active), k=64)
        i_c, v_c = cell_list_neighbors(jnp.asarray(pos), radius, jnp.asarray(active),
                                       k=64, bucket_size=16)
        assert _pair_set(i_c, v_c) == _pair_set(i_d, v_d)


def test_inactive_particles_excluded_both_directions():
    pos = _random_cloud(200, 7, spread=0.6)
    active = np.ones(200, bool)
    active[::3] = False
    i_c, v_c = cell_list_neighbors(jnp.asarray(pos), 0.2, jnp.asarray(active),
                                   k=64, bucket_size=16)
    pairs = _pair_set(i_c, v_c)
    for (a, b) in pairs:
        assert active[a] and active[b]
    i_d, v_d = neighbor_list(jnp.asarray(pos), 0.2, jnp.asarray(active), k=64)
    assert pairs == _pair_set(i_d, v_d)


def test_topk_keeps_nearest_when_cap_binds():
    # a tight cluster: with k=4 both paths must return the 4 nearest
    pos = np.zeros((10, 3), np.float32)
    pos[:, 0] = np.arange(10) * 0.01  # colinear, spacing 0.01
    i_c, v_c = cell_list_neighbors(jnp.asarray(pos), 0.5, jnp.ones(10, bool),
                                   k=4, bucket_size=16)
    # particle 0's 4 nearest are 1..4
    got = sorted(int(j) for j, ok in zip(np.asarray(i_c)[0], np.asarray(v_c)[0]) if ok)
    assert got == [1, 2, 3, 4]


def test_matches_tiled_reference_at_scale():
    pos = _random_cloud(4096, 3, spread=2.0)
    active = np.ones(4096, bool)
    radius = 0.08
    i_t, v_t = neighbor_list_tiled(jnp.asarray(pos), radius, jnp.asarray(active), k=48)
    i_c, v_c = cell_list_neighbors(jnp.asarray(pos), radius, jnp.asarray(active),
                                   k=48, bucket_size=16)
    assert _pair_set(i_c, v_c) == _pair_set(i_t, v_t)


def test_bucket_overflow_diagnostic():
    # rest-packed lattice at spacing == cell edge / 1.5 -> <= 8 per geometric
    # cell; bucket 16 absorbs the occasional two-cell hash merge
    g = np.mgrid[0:10, 0:10, 0:10].reshape(3, -1).T.astype(np.float32) * 0.1
    ov = cell_bucket_overflow(jnp.asarray(g), 0.15, jnp.ones(len(g), bool),
                              bucket_size=16)
    assert int(ov) == 0
    # pathological: everyone in one cell overflows
    clump = np.zeros((50, 3), np.float32)
    ov2 = cell_bucket_overflow(jnp.asarray(clump), 0.15, jnp.ones(50, bool),
                               bucket_size=16)
    assert int(ov2) == 34
