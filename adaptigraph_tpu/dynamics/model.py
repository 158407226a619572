"""Graph-neural-network dynamics model (flax).

Functional parity with the reference DynamicsPredictor
(src/dynamics/gnn/model.py:63-313) — node features are attrs (+ optional
state history) + per-object physics params + action; edge features are
receiver/sender attrs, instance-group difference, and the history of
position differences; three 3-layer ReLU encoders; `pstep` rounds of
message passing; a 3-layer motion head clamped to +-motion_clamp and added
to the last observed position.

TPU-native differences:
  * message passing uses fixed-size edge LISTS (adaptigraph_tpu.ops.EdgeSet)
    — gathers for send/recv features and `segment_sum` for aggregation —
    instead of dense (n_rel, N) incidence bmm (model.py:214-295). Identical
    math, but O(E * nf) instead of O(E * N * nf) and no giant one-hots.
  * the whole forward is shape-static: padded nodes/edges are masked, so it
    jits once and vmaps/shard_maps across rollout samples.
  * all dense layers can run in bfloat16 on the MXU (param dtype stays f32).

The forward signature mirrors the reference graph dict keys so datasets and
planners port 1:1.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.struct import dataclass as pytree_dataclass


@pytree_dataclass
class ModelConfig:
    n_his: int = 4
    nf: int = 150  # nf_particle == nf_relation == nf_effect (config model_config)
    pstep: int = 3
    attr_dim: int = 2
    state_dim: int = 0  # rope/granular/cloth configs use 0
    action_dim: int = 3
    density_dim: int = 0
    phys_dim: int = 1  # material physics-param dim (1 for all three materials)
    rel_particle_dim: int = 0
    rel_attr_dim: int = 2
    rel_group_dim: int = 1
    rel_distance_dim: int = 3
    rel_density_dim: int = 0
    motion_clamp: float = 100.0
    compute_dtype: Any = jnp.float32
    # 'matmul': gather/aggregate via one-hot incidence matmuls (MXU — fast
    # for the 100-node/1000-edge graphs in play); 'segment': index gathers +
    # segment_sum (lower memory at much larger graphs); 'slotted': edges MUST
    # come from ops.build_edges_slotted (slot row i belongs to receiver i) —
    # receiver gathers become broadcasts and aggregation a free sum over the
    # slot axis, leaving one sender take per pstep (no scatter, no one-hots);
    # 'slotmm': slotted layout, but the remaining sender take is ALSO an
    # MXU one-hot matmul (TPU gathers are latency-bound at these sizes, a
    # 1010x101 one-hot GEMM is ~30 MFLOP of pure MXU work).
    # All modes share identical parameters: checkpoints are interchangeable.
    aggregation: str = "matmul"


class _Encoder(nn.Module):
    """3-layer MLP, ReLU after every layer (gnn/model.py:4-21)."""

    nf: int
    out: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.nf, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.nf, dtype=self.dtype)(x))
        return nn.relu(nn.Dense(self.out, dtype=self.dtype)(x))


class _Propagator(nn.Module):
    """Linear + residual + ReLU (gnn/model.py:23-41)."""

    out: int
    dtype: Any

    @nn.compact
    def __call__(self, x, res=None):
        x = nn.Dense(self.out, dtype=self.dtype)(x)
        if res is not None:
            x = x + res
        return nn.relu(x)


class _MotionHead(nn.Module):
    """3-layer MLP, no activation on the output (gnn/model.py:43-60)."""

    nf: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.nf, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.nf, dtype=self.dtype)(x))
        return nn.Dense(3, dtype=self.dtype)(x)


class DynamicsPredictor(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, state, attrs, recv, send, edge_valid, p_instance,
                 physics_param, action=None, particle_den=None, obj_mask=None,
                 **unused):
        """One-step dynamics prediction.

        Args (single graph; vmap for batches):
          state: (n_his, N, 3) padded history (objects then eef).
          attrs: (N, attr_dim).
          recv/send/edge_valid: (E,) edge list.
          p_instance: (N_obj, n_instance).
          physics_param: (phys_dim,) normalized material parameters.
          action: (N, 3) per-node action (eef delta rows).
          obj_mask: (N_obj,) valid-object mask.

        Returns: (pred_pos (N_obj, 3), pred_motion (N_obj, 3)).
        """
        cfg = self.cfg
        dt = cfg.compute_dtype
        n_his, n, _ = state.shape
        n_obj = p_instance.shape[0]

        state = state.astype(dt)
        # history features: residuals then current position (model.py:154-165)
        state_res = state[1:] - state[:-1]
        state_feat = jnp.concatenate([state_res, state[-1:]], axis=0)
        state_feat = jnp.moveaxis(state_feat, 0, 1).reshape(n, n_his * 3)

        p_in = [attrs.astype(dt)]
        if cfg.state_dim > 0:
            p_in.append(state_feat)
        # physics params broadcast to object particles, zero on eef rows
        # (model.py:184-190)
        phys = jnp.tile(physics_param.astype(dt)[None, :], (n, 1))
        is_obj = (jnp.arange(n) < n_obj)[:, None]
        p_in.append(jnp.where(is_obj, phys, 0.0))
        if cfg.action_dim > 0:
            p_in.append(action.astype(dt))
        if cfg.density_dim > 0:
            den = jnp.tile(particle_den.astype(dt)[None, None], (n, 1))
            p_in.append(jnp.where(is_obj, den, 0.0))
        p_inputs = jnp.concatenate(p_in, axis=-1)

        # ---- aggregation mode (see ModelConfig.aggregation) ----
        if cfg.aggregation == "matmul":
            # one-hot incidence (built once per forward): gathers and the
            # receiver aggregation become MXU matmuls — at E~1000/N~100 this
            # beats TPU scatter by a wide margin
            rr = jax.nn.one_hot(recv, n, dtype=dt)  # (E, N)
            rs = jax.nn.one_hot(send, n, dtype=dt)

            def gather_r(x):
                return rr @ x

            def gather_s(x):
                return rs @ x

            def aggregate(e):
                return rr.T @ e
        elif cfg.aggregation in ("slotted", "slotmm"):
            # slotted edge layout (ops.build_edges_slotted): slot row i holds
            # receiver i's candidates, so receiver-side values broadcast and
            # the receiver aggregation is a slot-axis sum — no scatter, no
            # (E, N) one-hots; the sender take is the only real gather
            # ('slotted': index take; 'slotmm': one-hot MXU matmul).
            # Invalid slots are masked by `ev` exactly as in the other modes.
            n_edges = recv.shape[0]
            assert n_edges % n == 0, (
                "slotted aggregation requires edges from build_edges_slotted "
                f"(E={n_edges} not a multiple of N={n})")
            s = n_edges // n

            def gather_r(x):
                return jnp.broadcast_to(
                    x[:, None, :], (n, s, x.shape[-1])).reshape(n_edges, -1)

            if cfg.aggregation == "slotmm":
                rs = jax.nn.one_hot(send, n, dtype=dt)  # (E, N)

                def gather_s(x):
                    return rs @ x
            else:
                def gather_s(x):
                    return x[send]

            def aggregate(e):
                return e.reshape(n, s, -1).sum(axis=1)
        else:
            def gather_r(x):
                return x[recv]

            def gather_s(x):
                return x[send]

            def aggregate(e):
                return jax.ops.segment_sum(e, recv, num_segments=n)

        # ---- edge features (model.py:209-265) ----
        ev = edge_valid.astype(dt)[:, None]
        rel_in = []
        if cfg.rel_particle_dim > 0:
            rel_in += [gather_r(p_inputs), gather_s(p_inputs)]
        if cfg.rel_attr_dim > 0:
            rel_in += [gather_r(attrs.astype(dt)), gather_s(attrs.astype(dt))]
        if cfg.rel_group_dim > 0:
            g = jnp.concatenate(
                [p_instance.astype(dt),
                 jnp.zeros((n - n_obj, p_instance.shape[1]), dtype=dt)], axis=0)
            gdiff = jnp.sum(jnp.abs(gather_r(g) - gather_s(g)), axis=-1,
                            keepdims=True)
            rel_in.append(gdiff)
        if cfg.rel_distance_dim > 0:
            rel_in.append(gather_r(state_feat) - gather_s(state_feat))
        if cfg.rel_density_dim > 0:
            rel_in.append(gather_r(particle_den) - gather_s(particle_den))
        rel_inputs = jnp.concatenate(rel_in, axis=-1) * ev

        node_enc = _Encoder(cfg.nf, cfg.nf, dt, name="particle_encoder")(p_inputs)
        edge_enc = _Encoder(cfg.nf, cfg.nf, dt, name="relation_encoder")(rel_inputs) * ev

        edge_prop = _Propagator(cfg.nf, dt, name="relation_propagator")
        node_prop = _Propagator(cfg.nf, dt, name="particle_propagator")

        effect = node_enc
        for _ in range(cfg.pstep):
            e_r = gather_r(effect)
            e_s = gather_s(effect)
            edge_effect = edge_prop(jnp.concatenate([edge_enc, e_r, e_s], -1)) * ev
            agg = aggregate(edge_effect)
            effect = node_prop(jnp.concatenate([node_enc, agg], -1), res=effect)

        motion = _MotionHead(cfg.nf, dt, name="non_rigid_predictor")(effect[:n_obj])
        motion = jnp.clip(motion, -cfg.motion_clamp, cfg.motion_clamp)
        pred_pos = state[-1, :n_obj] + motion
        return pred_pos.astype(jnp.float32), motion.astype(jnp.float32)


def model_config_from_yaml(model_cfg: Dict, dataset_cfg: Dict, phys_dim: int) -> ModelConfig:
    """Build a ModelConfig from reference-style yaml blocks.

    `aggregation` may be set in the model yaml block or overridden with
    ADAPTIGRAPH_GNN_AGG (modes share parameters, so checkpoints are
    interchangeable). 'slotted'/'slotmm' require slot-layout edges; the
    trainer, rollout evaluator and planner all switch their edge builders to
    build_edges_slotted automatically when the model is in one of these modes
    (dataset._prepare_one(slotted=True), rollout.construct_graph/
    make_rollout_step, planning.forward_dynamics).

    `compute_dtype` may be overridden with ADAPTIGRAPH_GNN_DTYPE
    (f32|bf16). Parameters always stay float32 (flax Dense `dtype` only
    selects the computation dtype); bf16 runs the MLP stack on the MXU's
    native input type and halves activation HBM traffic — intended for
    inference (planning rollouts), where prediction deviation vs f32 is
    bounded by tests/test_model_modes.py. Training defaults to f32.
    """
    import os

    agg = os.environ.get("ADAPTIGRAPH_GNN_AGG",
                         model_cfg.get("aggregation", "matmul"))
    dt_name = os.environ.get("ADAPTIGRAPH_GNN_DTYPE",
                             model_cfg.get("compute_dtype", "f32"))
    dtype = jnp.bfloat16 if dt_name in ("bf16", "bfloat16") else jnp.float32
    return ModelConfig(
        aggregation=agg,
        compute_dtype=dtype,
        n_his=int(dataset_cfg["n_his"]),
        nf=int(model_cfg.get("nf_effect", 150)),
        pstep=int(model_cfg.get("pstep", 3)),
        attr_dim=int(model_cfg.get("attr_dim", 2)),
        state_dim=int(model_cfg.get("state_dim", 0)),
        action_dim=int(model_cfg.get("action_dim", 3)),
        density_dim=int(model_cfg.get("density_dim", 0)),
        phys_dim=phys_dim,
        rel_particle_dim=int(model_cfg.get("rel_particle_dim", 0)),
        rel_attr_dim=int(model_cfg.get("rel_attr_dim", 2)),
        rel_group_dim=int(model_cfg.get("rel_group_dim", 1)),
        rel_distance_dim=int(model_cfg.get("rel_distance_dim", 3)),
        rel_density_dim=int(model_cfg.get("rel_density_dim", 0)),
    )
