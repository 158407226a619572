"""Episode serialization: the h5 schema of the reference pipeline.

Schema (src/sim/data_gen/data.py:4-65, README.md:141-156):
  info/{n_cams, timestamp, n_particles}
  action                      (action_dim,)
  positions                   (T, N, 3) float
  eef_states                  (T, N_eef, 14) float
  observations/color/cam_{i}  (T, H, W, 3) uint8 RGB
  observations/depth/cam_{i}  (T, H, W) uint16 depth in mm

Color channels are flipped BGR->RGB and depth scaled x1000 exactly like
process_imgs (data.py:39-52). The renderer emits (T, n_cam, H, W, 5)
float frames [RGB, alpha, metric depth].
"""

from __future__ import annotations

import os
import pickle

import h5py
import numpy as np


def process_imgs(imgs_list):
    """Two accepted frame forms:
    * (T, n_cam, H, W, 5) float RGBA+depth (the legacy renderer output);
    * a list of T (color (n_cam, H, W, 3) uint8, depth (n_cam, H, W) uint16)
      pairs — quantized ON DEVICE by render_frames_store so capture
      transfers ship the h5 dtypes directly."""
    if isinstance(imgs_list, (list, tuple)) and len(imgs_list) \
            and isinstance(imgs_list[0], tuple):
        c_stack = np.stack([c for c, _ in imgs_list])  # (T, n_cam, H, W, 3)
        d_stack = np.stack([d for _, d in imgs_list])  # (T, n_cam, H, W)
        n_cam = c_stack.shape[1]
        color = {f"cam_{c}": c_stack[:, c, ..., ::-1] for c in range(n_cam)}
        depth = {f"cam_{c}": d_stack[:, c] for c in range(n_cam)}
        return color, depth
    imgs_list = np.asarray(imgs_list)
    t, n_cam = imgs_list.shape[:2]
    color, depth = {}, {}
    for c in range(n_cam):
        img = imgs_list[:, c]
        rgb = img[..., :3][..., ::-1]  # data.py:46 channel flip
        color[f"cam_{c}"] = (np.clip(rgb, 0.0, 1.0) * 255).astype(np.uint8)
        depth[f"cam_{c}"] = (img[..., -1] * 1000).astype(np.uint16)
    return color, depth


def store_data(filename: str, data, action: np.ndarray):
    imgs_list, particle_list, eef_list = data
    particles = np.array(particle_list)
    eefs = np.array(eef_list)
    if isinstance(imgs_list, (list, tuple)) and len(imgs_list) \
            and isinstance(imgs_list[0], tuple):
        t, n_cam = len(imgs_list), imgs_list[0][0].shape[0]
        color, depth = process_imgs(imgs_list)
    else:
        imgs = np.array(imgs_list)
        t, n_cam = imgs.shape[:2]
        color, depth = process_imgs(imgs)
    episode = {
        "info": {"n_cams": n_cam, "timestamp": t, "n_particles": particles.shape[1]},
        "action": np.asarray(action),
        "positions": particles.astype(np.float32),
        "eef_states": eefs.astype(np.float32),
        "observations": {"color": color, "depth": depth},
    }
    save_data(filename, episode)


def save_data(filename: str, episode: dict):
    # image stacks are gzip-chunked (rendered frames compress 10-20x; the
    # reference writes raw h5, data.py:53-65, but at 1000 episodes/material
    # the uncompressed form is ~1 GB/episode). Same keys/dtypes either way.
    with h5py.File(filename, "w") as f:
        for key, value in episode.items():
            if key == "observations":
                for sub, d in value.items():
                    for cam, arr in d.items():
                        f.create_dataset(f"{key}/{sub}/{cam}", data=arr,
                                         compression="gzip", compression_opts=4,
                                         chunks=(1,) + arr.shape[1:])
            elif key == "info":
                for sub, v in value.items():
                    f.create_dataset(f"{key}/{sub}", data=v)
            else:
                f.create_dataset(key, data=value)


def load_data(filename: str) -> dict:
    out = {}
    with h5py.File(filename, "r") as f:
        for key in f.keys():
            if key == "observations":
                out[key] = {}
                for sub in f[key]:
                    out[key][sub] = {cam: f[key][sub][cam][()] for cam in f[key][sub]}
            elif key == "info":
                out[key] = {sub: f[key][sub][()] for sub in f[key]}
            elif key in ("positions_lo", "positions_scale"):
                pass  # consumed with positions_q below
            elif key == "positions_q":
                # compact git-durable form (scripts/compact_episodes.py):
                # uint16 quantized over the episode bbox; decode transparently
                q = f[key][()].astype(np.float64)
                lo = f["positions_lo"][()]
                scale = f["positions_scale"][()]
                out["positions"] = (q * scale + lo).astype(np.float32)
            else:
                out[key] = f[key][()]
    return out


def save_property_params(epi_dir: str, props: dict):
    with open(os.path.join(epi_dir, "property_params.pkl"), "wb") as f:
        pickle.dump(props, f)


def load_property_params(epi_dir: str) -> dict:
    with open(os.path.join(epi_dir, "property_params.pkl"), "rb") as f:
        return pickle.load(f)
