"""Autoregressive rollout evaluation.

Port of the reference evaluator (src/dynamics/rollout/rollout.py:20-273 +
rollout/graph.py:233-400): for each validation episode and push, build the
start graph with deterministic mid-range FPS/adjacency radii, then roll the
model forward up to `rollout_steps` steps — each step re-building radius
edges from the PREDICTED state, sliding the history window, and walking the
frame-pair table for the next (start, end) anchor. Error = mean particle L2
against the FPS-subsampled ground truth (rollout.py:88).

TPU design: the per-step compute (model forward + edge rebuild + window
slide) is one jitted `rollout_step`; the frame-pair table walk stays on
host (it is data-dependent control flow over a ragged table). Outputs
per-push error curves + summary stats like the reference
(rollout.py:183-205,244-273).

Usage: python -m adaptigraph_tpu.dynamics.rollout --config dynamics/rope
       [--ckpt latest]
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np
import jax
import jax.numpy as jnp

from adaptigraph_tpu.dynamics.dataset import DynDataset
from adaptigraph_tpu.dynamics.train import load_checkpoint, init_model, make_apply
from adaptigraph_tpu.ops import build_edges, build_edges_slotted
from adaptigraph_tpu.utils import load_config
from adaptigraph_tpu.utils.host_fps import fps_rad_idx, fps_with_idx


def fps_indices(points, max_nobj, radius, rng):
    """Two-stage FPS of the reference (dataset/graph.py:8-36), host-side."""
    _, idx1 = fps_with_idx(points, min(max_nobj, len(points)))
    sub = points[idx1]
    _, idx2 = fps_rad_idx(sub, radius, rng)
    return idx1[np.asarray(idx2, int)]


def construct_graph(dataset_config, eef_pos, obj_pos, n_his, pair, physics_param,
                    rng=None, slotted=False):
    """Start graph for a rollout (rollout/graph.py:233-372), numpy.

    slotted=True emits slot-layout edges for models in the 'slotted'
    aggregation mode (same valid edge set; see ops.build_edges_slotted)."""
    ds = dataset_config["datasets"][0]
    max_nobj = int(ds["max_nobj"])
    max_nR = int(ds["max_nR"])
    fps_radius = float(np.mean(ds["fps_radius_range"]))
    adj_thresh = float(np.mean(ds["adj_radius_range"]))
    n_eef = eef_pos.shape[1]
    state_dim = max_nobj + n_eef
    rng = rng or np.random

    obj_kps = np.stack([obj_pos[p] for p in pair])  # (T, N_raw, 3)
    eef_kps = np.stack([eef_pos[p] for p in pair])

    fps_idx = fps_indices(obj_kps[n_his - 1], max_nobj, fps_radius, rng)
    nobj = len(fps_idx)
    obj_kp = np.zeros((len(pair), max_nobj, 3), np.float32)
    obj_kp[:, :nobj] = obj_kps[:, fps_idx]

    states_delta = np.zeros((state_dim, 3), np.float32)
    states_delta[max_nobj:] = eef_kps[n_his] - eef_kps[n_his - 1]

    state_history = np.concatenate([obj_kp[:n_his], eef_kps[:n_his]], axis=1)

    obj_mask = np.zeros(max_nobj, bool)
    obj_mask[:nobj] = True
    state_mask = np.concatenate([obj_mask, np.ones(n_eef, bool)])
    eef_mask = np.concatenate([np.zeros(max_nobj, bool), np.ones(n_eef, bool)])
    attrs = np.zeros((state_dim, 2), np.float32)
    attrs[:nobj, 0] = 1.0
    attrs[max_nobj:, 1] = 1.0
    p_instance = obj_mask.astype(np.float32)[:, None]

    if slotted:
        edges = build_edges_slotted(
            jnp.array(state_history[-1]), adj_thresh, jnp.array(state_mask),
            jnp.array(eef_mask), topk=int(ds["topk"]),
            connect_tools_all=bool(ds["connect_tool_all"]), tool_slots=n_eef)
    else:
        edges = build_edges(jnp.array(state_history[-1]), adj_thresh, jnp.array(state_mask),
                            jnp.array(eef_mask), topk=int(ds["topk"]),
                            connect_tools_all=bool(ds["connect_tool_all"]), max_edges=max_nR)

    graph = {
        "state": jnp.array(state_history),
        "action": jnp.array(states_delta),
        "attrs": jnp.array(attrs),
        "p_instance": jnp.array(p_instance),
        "obj_mask": jnp.array(obj_mask),
        "state_mask": jnp.array(state_mask),
        "eef_mask": jnp.array(eef_mask),
        "recv": edges.receivers,
        "send": edges.senders,
        "edge_valid": edges.valid,
        "physics_param": jnp.array(physics_param),
    }
    return graph, fps_idx


def get_next_pair(pairs, n_his, current_end, n_frames=None, scan=False):
    """Frame-pair table walk (rollout/graph.py:392-400). With scan=True,
    when no pair starts exactly at current_end, scan FORWARD over frames
    until one does (the reference's get_next_pair_or_break_episode,
    graph.py:374-390) — this is what lets a rollout chain across push
    boundaries and reach the reference's 100-step horizon instead of
    truncating at the ~26 pairs a single push yields (VERDICT r4 #7)."""
    valid = pairs[pairs[:, n_his - 1] == current_end]
    valid = valid[valid[:, n_his] > current_end]
    if len(valid) == 0:
        if not scan or n_frames is None:
            return None
        while current_end < n_frames - 1:
            current_end += 1
            valid = pairs[pairs[:, n_his - 1] == current_end]
            valid = valid[valid[:, n_his] > current_end]
            if len(valid):
                break
        if len(valid) == 0:
            return None
    return valid[len(valid) // 2]


def make_rollout_step(model, dataset_config):
    ds = dataset_config["datasets"][0]
    adj_thresh = float(np.mean(ds["adj_radius_range"]))
    topk = int(ds["topk"])
    cta = bool(ds["connect_tool_all"])
    max_nR = int(ds["max_nR"])
    slotted = model.cfg.aggregation in ("slotted", "slotmm")
    apply = make_apply(model)

    @jax.jit
    def step(params, graph, eef_start, eef_end):
        """One autoregressive step: forward, rebuild edges from prediction,
        slide history (rollout.py:67-138)."""
        pred, _ = apply(params, graph)
        n_obj = pred.shape[0]
        pred = jnp.where(graph["obj_mask"][:, None], pred, 0.0)
        states = jnp.concatenate([pred, eef_start], axis=0)
        delta = jnp.zeros_like(states)
        delta = delta.at[n_obj:].set(eef_end - eef_start)
        if slotted:
            edges = build_edges_slotted(states, adj_thresh, graph["state_mask"],
                                        graph["eef_mask"], topk=topk,
                                        connect_tools_all=cta,
                                        tool_slots=eef_start.shape[0])
        else:
            edges = build_edges(states, adj_thresh, graph["state_mask"],
                                graph["eef_mask"], topk=topk, connect_tools_all=cta,
                                max_edges=max_nR)
        state_history = jnp.concatenate(
            [graph["state"][1:], states[None]], axis=0)
        new_graph = dict(graph, state=state_history, action=delta,
                         recv=edges.receivers, send=edges.senders,
                         edge_valid=edges.valid)
        return pred, new_graph

    return step


def rollout_push(params, step_fn, graph, fps_idx, pairs, eef_pos, obj_pos, n_his,
                 current_start, current_end, max_nobj, rollout_steps=100,
                 viz_ctx=None, scan=False):
    """Roll one push; returns the per-step error list. `viz_ctx` (optional):
    dict(imgs, intr, extr, save_dir) — writes pred/gt overlay frames like the
    reference visualize_graph (rollout/graph.py:44-230)."""
    errors = []
    for step_i in range(rollout_steps):
        eef_start = jnp.array(eef_pos[current_start])
        eef_end = jnp.array(eef_pos[current_end])
        # note: reference applies the NEXT action before computing error at
        # current_end — the graph already encodes action toward current_end
        pred, graph = step_fn(params, graph, eef_start, eef_end)
        gt = obj_pos[current_end][fps_idx]
        predn = np.asarray(pred)[: len(fps_idx)]
        errors.append(float(np.linalg.norm(predn - gt, axis=-1).mean()))
        if viz_ctx is not None:
            from adaptigraph_tpu.utils.visualize import overlay_graph
            import cv2

            frame_idx = min(current_end, len(viz_ctx["imgs"]) - 1)
            img = viz_ctx["imgs"][frame_idx]
            out = overlay_graph(img, predn, viz_ctx["intr"], viz_ctx["extr"],
                                edges=(np.asarray(graph["recv"]),
                                       np.asarray(graph["send"]),
                                       np.asarray(graph["edge_valid"])),
                                gt_kp=gt, eef_kp=np.asarray(eef_end))
            cv2.imwrite(os.path.join(viz_ctx["save_dir"], f"{step_i}_both.jpg"),
                        out[..., ::-1])
        nxt = get_next_pair(pairs, n_his, current_end,
                            n_frames=len(obj_pos), scan=scan)
        if nxt is None:
            break
        current_start, current_end = nxt[n_his - 1], nxt[n_his]
    return errors


def _make_viz_ctx(dataset_config, name, push_i, out_dir, cam=0):
    """Load episode frames + camera params for overlay rendering
    (rollout/graph.py extract_imgs :20-40)."""
    import glob as _glob

    from adaptigraph_tpu.sim.episode_io import load_data

    data_dir = os.path.join(dataset_config["data_dir"], dataset_config["data_name"])
    cam_dir = os.path.join(data_dir, "cameras")
    if not os.path.exists(os.path.join(cam_dir, "intrinsic.npy")):
        return None
    intr = np.load(os.path.join(cam_dir, "intrinsic.npy"))[cam]
    extr = np.load(os.path.join(cam_dir, "extrinsic.npy"))[cam]
    imgs = []
    for f in sorted(_glob.glob(os.path.join(data_dir, name, "*.h5")))[1:]:
        d = load_data(f)
        imgs.append(d["observations"]["color"][f"cam_{cam}"])
    if not imgs:
        return None
    imgs = np.concatenate(imgs, axis=0)
    # the shared cameras/intrinsic.npy reflects the LAST campaign's render
    # resolution; episodes may be stored at another one (the resolution is a
    # data-gen knob). The renderer's intrinsics scale linearly with image
    # size (fx = (W/2)/tan(fov/2), ppx = W/2), so rescale to this episode.
    w_img = imgs.shape[2]
    scale = w_img / (2.0 * float(intr[2]))  # intr = [fx, fy, cx, cy]
    if abs(scale - 1.0) > 1e-6:
        intr = intr * scale
    save_dir = os.path.join(out_dir, f"viz_{name}_{push_i + 1}_cam{cam}")
    os.makedirs(save_dir, exist_ok=True)
    return {"imgs": imgs, "intr": intr, "extr": extr, "save_dir": save_dir}


def rollout(config, ckpt="latest", viz=False, max_episodes=None, rollout_steps=None,
            scan=True):
    dataset_config = config["dataset_config"]
    rollout_steps = rollout_steps or int(config["rollout_config"]["rollout_steps"])
    out_dir = os.path.join(config["rollout_config"]["out_dir"],
                           dataset_config["data_name"])
    os.makedirs(out_dir, exist_ok=True)

    dataset = DynDataset(dataset_config, config["material_config"], "valid")
    model, params0 = init_model(config, dataset)
    ckpt_dir = os.path.join(config["train_config"]["out_dir"],
                            dataset_config["data_name"], "checkpoints")
    params = load_checkpoint(ckpt_dir, ckpt, params0)
    step_fn = make_rollout_step(model, dataset_config)

    n_his = dataset.n_his
    prep_dir = os.path.join(dataset_config["prep_data_dir"],
                            dataset_config["data_name"], "frame_pairs")
    data_dir = os.path.join(dataset_config["data_dir"], dataset_config["data_name"])
    from adaptigraph_tpu.dynamics.dataset import episode_names

    names = episode_names(data_dir, prep_dir)
    num_epis = len(names)
    ratio = dataset_config["ratio"]["valid"]
    epi_range = list(range(int(num_epis * ratio[0]), int(num_epis * ratio[1])))
    if max_episodes:
        epi_range = epi_range[:max_episodes]

    all_errors = []
    rng = np.random.RandomState(42)
    for epi in epi_range:
        name = names[epi]  # ordinal (positions lists) vs dir name mapping
        pair_files = sorted(glob.glob(os.path.join(prep_dir, f"{name}_*.txt")))
        eef_pos, obj_pos = dataset.eef_pos[epi], dataset.obj_pos[epi]
        physics = dataset.physics_params[epi][dataset.material]
        # episode-wide pair table: the reference walks the FULL episode's
        # pair list (rollout.py:207-239 passes pair_lists_episode), so a
        # rollout started at one push chains into the following pushes and
        # the horizon reaches the 100-step reference curve instead of the
        # ~26 pairs one push holds (VERDICT r4 #7)
        tables = [np.atleast_2d(np.loadtxt(pf).astype(int)) for pf in pair_files]
        tables = [t for t in tables if t.size and t.shape[0] > 1]
        if not tables:
            continue
        pairs_all = np.vstack(tables)
        for pi, pairs in enumerate(tables):
            pair = pairs[0]
            graph, fps_idx = construct_graph(
                dataset_config, eef_pos, obj_pos, n_his, pair, physics, rng,
                slotted=(model.cfg.aggregation in ("slotted", "slotmm")))
            viz_ctx = None
            if viz:
                viz_ctx = _make_viz_ctx(dataset_config, name, pi, out_dir)
            errors = rollout_push(
                params, step_fn, graph, fps_idx, pairs_all, eef_pos, obj_pos,
                n_his, pair[n_his - 1], pair[n_his],
                int(dataset_config["datasets"][0]["max_nobj"]), rollout_steps,
                viz_ctx=viz_ctx, scan=scan)
            if viz_ctx is not None:
                from adaptigraph_tpu.utils.visualize import merge_video

                merge_video(viz_ctx["save_dir"], "both",
                            os.path.join(viz_ctx["save_dir"], "both.mp4"), fps=10)
            all_errors.append(errors)
            np.savetxt(os.path.join(out_dir, f"error_{name}_{pi + 1}.txt"), errors)
            print(f"episode {epi} push {pi + 1}: {len(errors)} steps, "
                  f"final err {errors[-1] if errors else float('nan'):.4f}", flush=True)

    if all_errors:
        max_len = max(len(e) for e in all_errors)
        mat = np.full((len(all_errors), max_len), np.nan)
        for i, e in enumerate(all_errors):
            mat[i, : len(e)] = e
        med = np.nanmedian(mat, axis=0)
        np.savetxt(os.path.join(out_dir, "error_median.txt"), med)
        print(f"median error over horizon: start {med[0]:.4f} end {med[-1]:.4f}")
        save_error_plot(all_errors, out_dir)
    return all_errors


def save_error_plot(all_errors, out_dir, save_name="error_short"):
    """Median + 25/75-percentile band over the rollout horizon — the
    reference's error_short.txt/png artifacts (rollout.py:244-273: rows are
    pushes truncated to the shortest horizon, columns time steps)."""
    min_step = min(len(e) for e in all_errors)
    if min_step == 0:
        return
    step_error = np.stack([np.asarray(e[:min_step]) for e in all_errors], axis=1)
    np.savetxt(os.path.join(out_dir, f"{save_name}.txt"), step_error)
    median = np.median(step_error, axis=1)
    p75 = np.percentile(step_error, 75, axis=1)
    p25 = np.percentile(step_error, 25, axis=1)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(10, 5))
    plt.plot(median)
    plt.xlabel("time step")
    plt.ylabel("error")
    plt.grid()
    plt.gca().fill_between(np.arange(len(median)), p25, p75, alpha=0.2)
    plt.savefig(os.path.join(out_dir, f"{save_name}.png"), dpi=300)
    plt.close()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default="dynamics/rope")
    ap.add_argument("--ckpt", type=str, default="latest")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--viz", action="store_true")
    ap.add_argument("--no-scan", action="store_true",
                    help="per-push horizon only (the reference's "
                         "get_next_pair_or_break_episode_pushes walk)")
    args = ap.parse_args()
    rollout(load_config(args.config), ckpt=args.ckpt, rollout_steps=args.steps,
            viz=args.viz, scan=not args.no_scan)
