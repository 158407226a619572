"""Training dataset: raw episode frames -> fixed-shape graph batches.

The reference builds each training graph on CPU dataloader workers
(src/dynamics/dataset/dataset.py:73-252 — per-sample FPS, padding, masks,
noise/rotation augmentation, radius-graph edges). Here the host side only
gathers raw frame windows (cheap numpy indexing, `DynDataset.raw_batch`);
everything compute-shaped — FPS subsampling, graph assembly, augmentation,
edge construction — runs on device inside `prepare_graph_batch` (jit +
vmap over the batch), removing the reference's input-pipeline bottleneck
(SURVEY.md §3.2 "HOT: CPU-bound input pipeline").

Loader ports: load_pairs/load_dataset/load_positions
(src/dynamics/dataset/load.py:6-83) including train/valid episode-ratio
splits and min-max physics-param normalization from material_config.
"""

from __future__ import annotations

import glob
import os
import pickle
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from adaptigraph_tpu.ops import build_edges, build_edges_slotted, fps_subsample
from adaptigraph_tpu.sim.episode_io import load_property_params
from adaptigraph_tpu.utils.geometry import rotation_2d_z


def episode_names(data_dir: str, pairs_dir: str):
    """Episode dir names in preprocess order, filtered to those with
    emitted frame pairs — the canonical ordinal <-> name mapping (dir
    names need not be contiguous; batched campaigns use seed-range
    bases)."""
    return sorted(f for f in os.listdir(data_dir)
                  if os.path.isdir(os.path.join(data_dir, f)) and f.isdigit()
                  and glob.glob(os.path.join(pairs_dir, f"{f}_*.txt")))


def load_pairs(pairs_path: str, names, ordinals) -> np.ndarray:
    """Frame-pair rows for the given episode dir names; the first column is
    the episode ORDINAL (index into the preprocess positions lists) — dir
    names need not be contiguous (batched campaigns use seed-range bases)."""
    rows = []
    for nm, ordinal in zip(names, ordinals):
        n_pushes = len(glob.glob(os.path.join(pairs_path, f"{nm}_*.txt")))
        for push in range(1, n_pushes + 1):
            fp = np.loadtxt(os.path.join(pairs_path, f"{nm}_{push:02}.txt"))
            if fp.ndim == 1:
                continue
            rows.append(np.concatenate([np.full((fp.shape[0], 1), ordinal), fp],
                                       axis=1))
    return np.concatenate(rows, axis=0).astype(int) if rows else np.zeros((0, 8), int)


def normalize_physics(props: dict, material_params) -> np.ndarray:
    used = []
    for item in material_params:
        if item["name"] in props and item["use"]:
            lo, hi = float(item["min"]), float(item["max"])
            used.append((float(props[item["name"]]) - lo) / (hi - lo + 1e-6))
    return np.array(used, dtype=np.float32)


def load_dataset(dataset_config, material_config, phase="train"):
    data_name = dataset_config["data_name"]
    data_dir = os.path.join(dataset_config["data_dir"], data_name)
    prep_dir = os.path.join(dataset_config["prep_data_dir"], data_name)
    ratio = dataset_config["ratio"][phase]
    pairs_dir = os.path.join(prep_dir, "frame_pairs")
    names = episode_names(data_dir, pairs_dir)
    num_epis = len(names)
    lo, hi = int(num_epis * ratio[0]), int(num_epis * ratio[1])
    pair_lists = load_pairs(pairs_dir, names[lo:hi], range(lo, hi))

    physics_params = []
    for nm in names:
        props = load_property_params(os.path.join(data_dir, nm))
        per_mat = {}
        for mat in dataset_config["materials"]:
            per_mat[mat] = normalize_physics(props, material_config[mat]["physics_params"])
        physics_params.append(per_mat)
    return pair_lists, physics_params


def load_positions(dataset_config):
    prep_dir = os.path.join(dataset_config["prep_data_dir"], dataset_config["data_name"])
    with open(os.path.join(prep_dir, "positions.pkl"), "rb") as f:
        positions = pickle.load(f)
    return positions["eef_pos"], positions["obj_pos"]


class DynDataset:
    """Host-side index + raw gather; device-side graph assembly."""

    def __init__(self, dataset_config, material_config, phase="train"):
        assert phase in ("train", "valid")
        self.phase = phase
        self.cfg = dataset_config
        self.n_his = int(dataset_config["n_his"])
        self.n_future = int(dataset_config["n_future"])
        rnd = dataset_config["randomness"]
        self.augment = bool(rnd["use"]) and phase == "train"
        self.state_noise = float(rnd["state_noise"][phase])
        self.phys_noise = float(rnd["phys_noise"][phase])
        ds = dataset_config["datasets"][0]
        self.max_nobj = int(ds["max_nobj"])
        self.max_nR = int(ds["max_nR"])
        self.fps_radius_range = tuple(ds["fps_radius_range"])
        self.adj_radius_range = tuple(ds["adj_radius_range"])
        self.topk = int(ds["topk"])
        self.connect_tool_all = bool(ds["connect_tool_all"])
        self.material = dataset_config["materials"][0]

        self.pair_lists, self.physics_params = load_dataset(
            dataset_config, material_config, phase)
        self.eef_pos, self.obj_pos = load_positions(dataset_config)
        self.n_eef = self.eef_pos[0].shape[1]
        self.n_raw = max(o.shape[1] for o in self.obj_pos)
        self.phys_dim = self.physics_params[0][self.material].shape[0]

    def __len__(self):
        return len(self.pair_lists)

    def raw_batch(self, idxs: np.ndarray) -> dict:
        """Gather raw windows: obj (B, T_w, N_raw, 3), eef (B, T_w, N_eef, 3),
        valid-count + physics. T_w = n_his + n_future."""
        b = len(idxs)
        t_w = self.n_his + self.n_future
        obj = np.zeros((b, t_w, self.n_raw, 3), np.float32)
        nobj_raw = np.zeros((b,), np.int32)
        eef = np.zeros((b, t_w, self.n_eef, 3), np.float32)
        phys = np.zeros((b, self.phys_dim), np.float32)
        for i, idx in enumerate(idxs):
            row = self.pair_lists[idx]
            epi, pair = int(row[0]), row[1:]
            o = self.obj_pos[epi]
            e = self.eef_pos[epi]
            n = o.shape[1]
            for t in range(t_w):
                obj[i, t, :n] = o[pair[t]]
                eef[i, t] = e[pair[t]]
            nobj_raw[i] = n
            phys[i] = self.physics_params[epi][self.material]
        return {"obj": obj, "eef": eef, "nobj_raw": nobj_raw, "physics": phys}


def _prepare_one(obj, eef, nobj_raw, physics, key, *, n_his, n_future, max_nobj,
                 max_nR, fps_radius_range, adj_radius_range, topk, connect_tool_all,
                 state_noise, phys_noise, augment, slotted=False):
    """Build one training graph on device (mirrors dataset.py:73-252)."""
    t_w, n_raw, _ = obj.shape
    n_eef = eef.shape[1]
    state_dim = max_nobj + n_eef
    k_fps, k_rad, k_adj, k_noise, k_rot, k_phys = jax.random.split(key, 6)

    raw_valid = jnp.arange(n_raw) < nobj_raw
    fps_r = jax.random.uniform(k_rad, (), minval=fps_radius_range[0],
                               maxval=fps_radius_range[1])
    fps_idx, keep = fps_subsample(obj[n_his - 1], max_nobj, fps_r, k_fps,
                                  valid=raw_valid)
    obj_kp = obj[:, fps_idx] * keep[None, :, None]  # (T_w, max_nobj, 3)

    # action = eef delta at the current step (dataset.py:105-110)
    states_delta = jnp.zeros((state_dim, 3))
    states_delta = states_delta.at[max_nobj:].set(eef[n_his] - eef[n_his - 1])

    state_history = jnp.concatenate(
        [obj_kp[:n_his], jnp.broadcast_to(eef[:n_his], (n_his, n_eef, 3))], axis=1)

    obj_future = obj_kp[n_his:]  # (n_future, max_nobj, 3)
    eef_future = jnp.zeros((n_future - 1, state_dim, 3))
    delta_future = jnp.zeros((n_future - 1, state_dim, 3))
    for fi in range(n_future - 1):
        eef_future = eef_future.at[fi, max_nobj:].set(eef[n_his + fi])
        delta_future = delta_future.at[fi, max_nobj:].set(
            eef[n_his + fi + 1] - eef[n_his + fi])

    obj_mask = keep
    state_mask = jnp.concatenate([keep, jnp.ones((n_eef,), bool)])
    eef_mask = jnp.concatenate([jnp.zeros((max_nobj,), bool), jnp.ones((n_eef,), bool)])

    attrs = jnp.zeros((state_dim, 2))
    attrs = attrs.at[:max_nobj, 0].set(keep.astype(jnp.float32))
    attrs = attrs.at[max_nobj:, 1].set(1.0)

    p_instance = keep.astype(jnp.float32)[:, None]  # (max_nobj, 1)

    physics = physics + jax.random.uniform(k_phys, physics.shape,
                                           minval=-phys_noise, maxval=phys_noise)

    if augment:
        state_history = state_history + jax.random.uniform(
            k_noise, state_history.shape, minval=-state_noise, maxval=state_noise)
        theta = jax.random.uniform(k_rot, (), minval=-jnp.pi, maxval=jnp.pi)
        rot = rotation_2d_z(theta)  # (3,3), xy-plane rotation (dataset.py:187-190)
        state_history = state_history @ rot
        states_delta = states_delta @ rot
        eef_future = eef_future @ rot
        delta_future = delta_future @ rot
        obj_future = obj_future @ rot

    adj_r = jax.random.uniform(k_adj, (), minval=adj_radius_range[0],
                               maxval=adj_radius_range[1])
    if slotted:
        # same valid edge set, slot layout (no per-sample O(N^2 log N)
        # argsort); requires the model's 'slotted' aggregation mode —
        # training math is identical (message passing is permutation-
        # invariant and modes share parameters)
        edges = build_edges_slotted(state_history[-1], adj_r, state_mask,
                                    eef_mask, topk=topk,
                                    connect_tools_all=connect_tool_all,
                                    tool_slots=eef.shape[1])
    else:
        edges = build_edges(state_history[-1], adj_r, state_mask, eef_mask, topk=topk,
                            connect_tools_all=connect_tool_all, max_edges=max_nR)

    return {
        "state": state_history,
        "action": states_delta,
        "eef_future": eef_future,
        "action_future": delta_future,
        "state_future": obj_future,
        "attrs": attrs,
        "p_instance": p_instance,
        "obj_mask": obj_mask,
        "state_mask": state_mask,
        "eef_mask": eef_mask,
        "recv": edges.receivers,
        "send": edges.senders,
        "edge_valid": edges.valid,
        "physics_param": physics,
    }


def make_prepare_fn(dataset: DynDataset, slotted: bool = False):
    """Returns a jitted (raw_batch, key) -> graph batch function.

    slotted=True emits slot-layout edges (build_edges_slotted) for models
    running the 'slotted' aggregation mode."""
    kwargs = dict(
        n_his=dataset.n_his, n_future=dataset.n_future, max_nobj=dataset.max_nobj,
        max_nR=dataset.max_nR, fps_radius_range=dataset.fps_radius_range,
        adj_radius_range=dataset.adj_radius_range, topk=dataset.topk,
        connect_tool_all=dataset.connect_tool_all, state_noise=dataset.state_noise,
        phys_noise=dataset.phys_noise, augment=dataset.augment, slotted=slotted)
    one = partial(_prepare_one, **kwargs)

    @jax.jit
    def prepare(raw, key):
        b = raw["obj"].shape[0]
        keys = jax.random.split(key, b)
        return jax.vmap(one)(raw["obj"], raw["eef"], raw["nobj_raw"],
                             raw["physics"], keys)

    return prepare
