"""Mirror generated episodes into a compact, git-durable form.

VERDICT r3 weak #6: two VM resets wiped campaign data twice in one round
because `data/sim_data/` (gitignored — image stacks are ~20 MB/episode) was
treated as durable. Training needs only `positions`, `eef_states`, `action`
and `info` (dynamics/preprocess.py reads nothing else), which compress to
~100 KB/push — small enough to commit to git as episodes generate.

This tool copies every episode h5 under --src into --dst with the
`observations/` group dropped (gzip on the float arrays), plus
property_params.pkl and the per-material cameras/*.npy. Idempotent: files
already present in --dst with a non-stale size are skipped, so a cron-style
loop can run it every few minutes during a campaign. `--commit` stages
exactly the --dst tree and commits iff something changed.

Restore after a VM reset with scripts/restore_compact.sh (copies compact
episodes back under data/sim_data without clobbering richer originals);
preprocessing and training then run unchanged — load_data() simply sees no
`observations` key.

Reference analogue: the h5 schema of src/sim/data_gen/data.py:4-65 minus
the image groups.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

sys.path.insert(0, "/root/repo")

import h5py
import numpy as np

KEEP_KEYS = ("action", "positions", "eef_states")


def compact_h5(src: str, dst: str) -> bool:
    """Write dst as src minus observations. Returns True if (re)written.

    Positions quantize to uint16 over the episode's own bounding box
    (resolution = range/65535 ≈ 1.2e-4 at the ±4 workspace — two orders
    below the 0.01 training dist_thresh); episode_io.load_data decodes
    `positions_q` transparently, so restored compact episodes feed
    preprocessing unchanged."""
    if os.path.exists(dst) and os.path.getmtime(dst) >= os.path.getmtime(src):
        return False
    tmp = dst + ".tmp"
    with h5py.File(src, "r") as f, h5py.File(tmp, "w") as g:
        for key in KEEP_KEYS:
            if key not in f:
                continue
            arr = f[key][()]
            if key == "positions":
                pos = np.asarray(arr, np.float64)
                lo = pos.min(axis=(0, 1))
                hi = pos.max(axis=(0, 1))
                scale = np.maximum(hi - lo, 1e-9) / 65535.0
                q = np.round((pos - lo) / scale).astype(np.uint16)
                g.create_dataset("positions_q", data=q, compression="gzip",
                                 compression_opts=4, shuffle=True)
                g.create_dataset("positions_lo", data=lo.astype(np.float64))
                g.create_dataset("positions_scale",
                                 data=scale.astype(np.float64))
            elif isinstance(arr, np.ndarray) and arr.ndim >= 2:
                g.create_dataset(key, data=arr, compression="gzip",
                                 compression_opts=4, shuffle=True)
            else:
                g.create_dataset(key, data=arr)
        if "info" in f:
            for sub in f["info"]:
                g.create_dataset(f"info/{sub}", data=f["info"][sub][()])
    os.replace(tmp, dst)
    return True


def compact_tree(src_root: str, dst_root: str) -> int:
    n_new = 0
    for mat in sorted(os.listdir(src_root)):
        mat_dir = os.path.join(src_root, mat)
        if not os.path.isdir(mat_dir):
            continue
        cam_dir = os.path.join(mat_dir, "cameras")
        if os.path.isdir(cam_dir):
            dst_cam = os.path.join(dst_root, mat, "cameras")
            os.makedirs(dst_cam, exist_ok=True)
            for f in os.listdir(cam_dir):
                if f.endswith(".npy"):
                    d = os.path.join(dst_cam, f)
                    s = os.path.join(cam_dir, f)
                    if (not os.path.exists(d)
                            or os.path.getmtime(d) < os.path.getmtime(s)):
                        shutil.copy2(s, d)
                        n_new += 1
        for epi in sorted(os.listdir(mat_dir)):
            epi_dir = os.path.join(mat_dir, epi)
            if not (os.path.isdir(epi_dir) and epi.isdigit()):
                continue
            dst_epi = os.path.join(dst_root, mat, epi)
            h5s = sorted(f for f in os.listdir(epi_dir) if f.endswith(".h5"))
            if not h5s:
                continue
            os.makedirs(dst_epi, exist_ok=True)
            for f in h5s:
                try:
                    n_new += compact_h5(os.path.join(epi_dir, f),
                                        os.path.join(dst_epi, f))
                except OSError as e:
                    # a campaign process may be mid-write on this file;
                    # the next sweep picks it up
                    print(f"skip {epi_dir}/{f}: {e}", file=sys.stderr)
            pkl = os.path.join(epi_dir, "property_params.pkl")
            if os.path.exists(pkl):
                d = os.path.join(dst_epi, "property_params.pkl")
                if (not os.path.exists(d)
                        or os.path.getmtime(d) < os.path.getmtime(pkl)):
                    shutil.copy2(pkl, d)
                    n_new += 1
    return n_new


def git_commit(dst_root: str) -> bool:
    subprocess.run(["git", "add", "-A", dst_root], cwd="/root/repo",
                   check=True)
    r = subprocess.run(["git", "diff", "--cached", "--quiet", "--",
                        dst_root], cwd="/root/repo")
    if r.returncode == 0:
        return False  # nothing staged under dst_root
    counts = {}
    for mat in sorted(os.listdir(dst_root)):
        md = os.path.join(dst_root, mat)
        if os.path.isdir(md):
            counts[mat] = sum(1 for e in os.listdir(md) if e.isdigit())
    msg = ("data: compact episode snapshot ("
           + ", ".join(f"{m} {c}" for m, c in counts.items()) + ")")
    subprocess.run(["git", "commit", "-q", "-m", msg, "--only", "--",
                    dst_root], cwd="/root/repo", check=True)
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/repo/data/sim_data")
    ap.add_argument("--dst", default="/root/repo/data/compact")
    ap.add_argument("--commit", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    n = compact_tree(args.src, args.dst)
    print(f"compacted {n} new/updated files")
    if args.commit:
        committed = git_commit(args.dst)
        print("committed" if committed else "nothing to commit")


if __name__ == "__main__":
    main()
