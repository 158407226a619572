"""Compact git-durable episode mirror (scripts/compact_episodes.py).

VERDICT r3 weak #6: campaign data must survive VM resets. The compact form
drops image groups and quantizes positions to uint16 over the episode bbox;
these tests pin that the roundtrip through episode_io.load_data is
training-equivalent (quantization error orders below the 0.01 training
dist_thresh) and that the sweep is idempotent.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from adaptigraph_tpu.sim.episode_io import load_data, save_data
from scripts.compact_episodes import compact_h5, compact_tree


def _episode(tmp, t=6, n=50):
    rng = np.random.RandomState(0)
    pos = rng.uniform(-4, 4, (t, n, 3)).astype(np.float32)
    eef = rng.randn(t, 1, 14).astype(np.float32)
    color = {"cam_0": rng.randint(0, 255, (t, 8, 8, 3), dtype=np.uint8)}
    depth = {"cam_0": rng.randint(0, 4000, (t, 8, 8), dtype=np.uint16)}
    epi = {
        "info": {"n_cams": 1, "timestamp": t, "n_particles": n},
        "action": np.array([0.1, 0.2, 0.3, 0.4]),
        "positions": pos,
        "eef_states": eef,
        "observations": {"color": color, "depth": depth},
    }
    src = os.path.join(tmp, "01.h5")
    save_data(src, epi)
    return src, epi


def test_roundtrip_drops_images_keeps_positions(tmp_path):
    src, epi = _episode(str(tmp_path))
    dst = str(tmp_path / "compact.h5")
    assert compact_h5(src, dst)
    out = load_data(dst)
    assert "observations" not in out
    assert np.abs(out["positions"] - epi["positions"]).max() < 3e-4
    np.testing.assert_array_equal(out["eef_states"], epi["eef_states"])
    np.testing.assert_array_equal(out["action"], epi["action"])
    assert out["info"]["n_particles"] == 50
    # quantized file materially smaller than the original
    assert os.path.getsize(dst) < os.path.getsize(src)


def test_idempotent_and_degenerate_axis(tmp_path):
    src, _ = _episode(str(tmp_path))
    dst = str(tmp_path / "c.h5")
    assert compact_h5(src, dst)
    assert not compact_h5(src, dst)  # second sweep: no rewrite
    # constant coordinate axis (zero range) must not divide by zero
    import h5py

    with h5py.File(src, "r+") as f:
        p = f["positions"][()]
        p[..., 1] = 0.25
        del f["positions"]
        f.create_dataset("positions", data=p)
    import time

    os.utime(src, (time.time() + 5, time.time() + 5))  # beat mtime ties
    assert compact_h5(src, dst)
    out = load_data(dst)
    assert np.abs(out["positions"][..., 1] - 0.25).max() < 1e-6


def test_tree_sweep_copies_props(tmp_path):
    srcr = tmp_path / "sim_data" / "rope" / "000007"
    srcr.mkdir(parents=True)
    _episode(str(srcr))
    (srcr / "property_params.pkl").write_bytes(b"\x80\x04N.")
    (srcr.parent / "cameras").mkdir()
    np.save(str(srcr.parent / "cameras" / "intrinsic.npy"), np.eye(3))
    dst = tmp_path / "compact"
    n = compact_tree(str(tmp_path / "sim_data"), str(dst))
    assert n == 3  # h5 + pkl + npy
    assert (dst / "rope" / "000007" / "01.h5").exists()
    assert (dst / "rope" / "000007" / "property_params.pkl").exists()
    assert (dst / "rope" / "cameras" / "intrinsic.npy").exists()
    assert compact_tree(str(tmp_path / "sim_data"), str(dst)) == 0
