"""GNN dynamics training.

Mirrors the reference trainer (src/dynamics/train/train.py:19-148): Adam
lr 1e-3, batch 128, multi-step supervision — unroll n_future=3 predictions,
feeding each prediction back into the history window with the recorded
future eef rows (train.py:90-108), sum the per-step MSE, single update.
Checkpoints every 10th epoch (<100) / 100th epoch + `latest` with optimizer
state (train.py:127-130), via orbax.

TPU-native structure:
  * the entire unrolled loss (3 forwards + backward) is one jit'd
    `train_step`, with the batch sharded over the mesh's 'data' axis and
    params replicated (pjit-style NamedSharding) — the multi-chip scaling
    path exercised by __graft_entry__.dryrun_multichip;
  * graph construction happens on device (dataset.make_prepare_fn), so the
    host loop only gathers raw frame windows and feeds PRNG keys.

Usage: python -m adaptigraph_tpu.dynamics.train --config dynamics/rope
       [--epochs N] [--iters N] [--batch N]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from adaptigraph_tpu.dynamics.dataset import DynDataset, make_prepare_fn
from adaptigraph_tpu.dynamics.model import DynamicsPredictor, model_config_from_yaml
from adaptigraph_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from adaptigraph_tpu.utils import load_config


def make_apply(model):
    """Single-graph apply with the reference graph-dict keys."""

    def apply(params, g):
        return model.apply(
            {"params": params}, g["state"], g["attrs"], g["recv"], g["send"],
            g["edge_valid"], g["p_instance"], g["physics_param"],
            action=g["action"], obj_mask=g["obj_mask"])

    return apply


def make_train_step(model, n_future: int, optimizer):
    apply = make_apply(model)

    def unrolled_loss(params, batch):
        """Multi-step supervision (train.py:90-108): predictions are fed back
        into the history window; edges stay fixed across the unroll."""
        state = batch["state"]
        action = batch["action"]
        loss = 0.0
        for fi in range(n_future):
            g = dict(batch, state=state, action=action)
            pred, _ = jax.vmap(apply, in_axes=(None, 0))(params, g)
            gt = batch["state_future"][:, fi]
            loss = loss + jnp.mean((pred - gt) ** 2)
            if fi < n_future - 1:
                nxt = batch["eef_future"][:, fi]  # (B, N+M, 3), obj rows zero
                nobj = pred.shape[1]
                nxt = nxt.at[:, :nobj].set(pred)
                state = jnp.concatenate([state[:, 1:], nxt[:, None]], axis=1)
                action = batch["action_future"][:, fi]
        return loss

    @jax.jit
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(unrolled_loss)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def eval_step(params, batch):
        return unrolled_loss(params, batch)

    return train_step, eval_step


def init_model(config, dataset: DynDataset):
    mc = model_config_from_yaml(config["model_config"], config["dataset_config"],
                                dataset.phys_dim)
    model = DynamicsPredictor(mc)
    raw = dataset.raw_batch(np.arange(1))
    prep = make_prepare_fn(dataset)
    g = prep(raw, jax.random.PRNGKey(0))
    g1 = jax.tree.map(lambda x: x[0], g)
    params = model.init(
        jax.random.PRNGKey(config["train_config"].get("random_seed", 42)),
        g1["state"], g1["attrs"], g1["recv"], g1["send"], g1["edge_valid"],
        g1["p_instance"], g1["physics_param"], action=g1["action"])["params"]
    return model, params


def save_checkpoint(ckpt_dir, name, params, opt_state=None):
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_dir), name)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if opt_state is not None:
        ckptr.save(path + "_optim", {"opt_state": opt_state}, force=True)
        ckptr.wait_until_finished()


def load_checkpoint(ckpt_dir, name, params_like):
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_dir), name)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, {"params": params_like})
    return restored["params"]


def train(config, epochs=None, iters=None, batch_size=None, mesh=None):
    dataset_config = config["dataset_config"]
    train_config = config["train_config"]
    out_dir = os.path.join(train_config["out_dir"], dataset_config["data_name"])
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)

    datasets = {p: DynDataset(dataset_config, config["material_config"], p)
                for p in train_config.get("phases", ["train", "valid"])}
    preps = {p: make_prepare_fn(d) for p, d in datasets.items()}

    model, params = init_model(config, datasets["train"])
    # lr from config (train_config.lr, reference default 1e-3 — the
    # reference hardcodes it at train.py:63 but its config advertises it)
    optimizer = optax.adam(float(train_config.get("lr", 1e-3)))
    opt_state = optimizer.init(params)
    n_future = int(dataset_config["n_future"])
    train_step, eval_step = make_train_step(model, n_future, optimizer)

    mesh = mesh or make_mesh()
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)

    b = batch_size or int(train_config["batch_size"])
    n_epochs = epochs if epochs is not None else int(train_config["n_epochs"])
    rng = np.random.RandomState(train_config.get("random_seed", 42))
    key = jax.random.PRNGKey(train_config.get("random_seed", 42))

    history = {"train": [], "valid": []}
    for epoch in range(n_epochs):
        t0 = time.time()
        for phase in datasets:
            d = datasets[phase]
            n_iters = iters if iters is not None else int(
                train_config["n_iters_per_epoch"][phase])
            losses = []
            for it in range(n_iters):
                idxs = rng.randint(0, len(d), size=b)
                raw = d.raw_batch(idxs)
                key, sub = jax.random.split(key)
                g = preps[phase](raw, sub)
                g = shard_batch(g, mesh)
                if phase == "train":
                    params, opt_state, loss = train_step(params, opt_state, g)
                else:
                    loss = eval_step(params, g)
                losses.append(float(loss))
                if phase == "train" and it % int(train_config.get("log_interval", 50)) == 0:
                    print(f"epoch {epoch} iter {it} loss {losses[-1]:.6f}", flush=True)
            history[phase].append(float(np.mean(losses)))
            print(f"epoch {epoch} {phase} loss {history[phase][-1]:.6f}", flush=True)

        ep = epoch + 1
        if (ep < 100 and ep % 10 == 0) or ep % 100 == 0:
            save_checkpoint(ckpt_dir, f"model_{ep}", params)
        save_checkpoint(ckpt_dir, "latest", params, opt_state)
        np.savetxt(os.path.join(out_dir, "loss_train.txt"), history["train"])
        if history.get("valid"):
            np.savetxt(os.path.join(out_dir, "loss_valid.txt"), history["valid"])
        from adaptigraph_tpu.utils.profiling import plot_loss_curves

        plot_loss_curves(history["train"], history.get("valid"),
                         os.path.join(out_dir, "loss.png"))
        print(f"epoch {epoch} time {time.time() - t0:.1f}s", flush=True)
    return params, history


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default="dynamics/rope")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()
    train(load_config(args.config), epochs=args.epochs, iters=args.iters,
          batch_size=args.batch)
