"""Radius-graph construction as fixed-size edge lists.

The reference builds dense one-hot incidence matrices Rr/Rs (n_rel, N) and
does message passing with bmm (src/dynamics/dataset/graph.py:38-156,
src/dynamics/gnn/model.py:214-295). On TPU we instead emit a fixed-capacity
edge list (receivers, senders, valid-mask): gathers index node features and
scatters use ``segment_sum``, which XLA lowers far better than materializing
(B, max_nR, N) one-hots.

Edge enumeration order matches the reference's ``adj_matrix.nonzero()``
(row-major over the receiver x sender adjacency), so incidence matrices
reconstructed via `edges_to_incidence` are bit-identical to the torch path.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_BIG = 1e10


class EdgeSet(NamedTuple):
    """Fixed-capacity directed edge list. Padded entries have valid=False and
    receiver=sender=0 (safe to gather; masked before scatter)."""

    receivers: jnp.ndarray  # (max_edges,) int32
    senders: jnp.ndarray  # (max_edges,) int32
    valid: jnp.ndarray  # (max_edges,) bool

    @property
    def max_edges(self) -> int:
        return self.receivers.shape[0]


def _adjacency(states, adj_thresh, mask, tool_mask, topk: int, connect_tools_all: bool,
               tools_only_when_near: bool):
    """(N, N) float adjacency, receiver-major; mirrors reference semantics:
      * squared-distance threshold (src/dynamics/dataset/graph.py:53-68)
      * per-receiver topk nearest (graph.py:71-75)
      * tool-tool edges always removed (graph.py:63)
      * connect_tools_all: drop tool-receiver edges, connect every object
        receiver to every tool sender (graph.py:77-80); with
        `tools_only_when_near`, only when the tool is already within the
        radius of some object particle — the batched variant's gating
        (graph.py:134-144) used by planning-time rollouts.
    """
    n = states.shape[0]
    diff = states[:, None, :] - states[None, :, :]
    dis = jnp.sum(diff * diff, axis=-1)
    pair_ok = mask[:, None] & mask[None, :]
    tool_pair = tool_mask[:, None] & tool_mask[None, :]
    dis = jnp.where(pair_ok, dis, _BIG)
    dis = jnp.where(tool_pair, _BIG, dis)

    thresh = jnp.asarray(adj_thresh, dtype=states.dtype) ** 2
    adj = (dis < thresh).astype(states.dtype)

    k = min(n, topk)
    _, topk_idx = jax.lax.top_k(-dis, k)  # smallest distances per receiver
    topk_mat = jnp.zeros((n, n), dtype=states.dtype)
    topk_mat = topk_mat.at[jnp.arange(n)[:, None], topk_idx].set(1.0)
    adj = adj * topk_mat

    if connect_tools_all:
        tool_recv = tool_mask[:, None] & mask[None, :]  # tool receiver, any sender
        obj_recv_tool_send = mask[:, None] & tool_mask[None, :]
        if tools_only_when_near:
            near = jnp.sum(jnp.where(tool_mask[:, None] & ~tool_mask[None, :], adj, 0.0)) > 0
        else:
            near = jnp.array(True)
        adj = jnp.where(tool_recv, 0.0, adj)
        adj = jnp.where(obj_recv_tool_send, jnp.where(near, 1.0, 0.0), adj)
        adj = jnp.where(tool_pair, 0.0, adj)
        # connected tool senders must themselves be valid particles
        adj = adj * (mask[None, :]).astype(states.dtype) * (mask[:, None]).astype(states.dtype)
    return adj


@partial(jax.jit, static_argnames=("topk", "connect_tools_all", "tools_only_when_near", "max_edges"))
def build_edges(states, adj_thresh, mask, tool_mask, topk: int = 10,
                connect_tools_all: bool = False, tools_only_when_near: bool = False,
                max_edges: int = 1000) -> EdgeSet:
    """Build the radius graph for one state set.

    Args:
      states: (N, 3) positions (objects then tools, padded).
      adj_thresh: connection radius (traced scalar ok).
      mask: (N,) valid-particle mask.
      tool_mask: (N,) tool-particle mask.
      topk / connect_tools_all / max_edges: static graph caps (reference
        config dataset.topk, connect_tool_all, max_nR).

    Returns: EdgeSet with edges in row-major (receiver-major) order, truncated
      to `max_edges` (the reference pads to max_nR the same way).
    """
    n = states.shape[0]
    adj = _adjacency(states, adj_thresh, mask, tool_mask, topk, connect_tools_all,
                     tools_only_when_near)
    flat = adj.reshape(-1) > 0
    # stable argsort(False<True reversed) puts True entries first in row-major order
    order = jnp.argsort(~flat, stable=True)[: max_edges]
    valid = flat[order]
    recv = (order // n).astype(jnp.int32)
    send = (order % n).astype(jnp.int32)
    recv = jnp.where(valid, recv, 0)
    send = jnp.where(valid, send, 0)
    return EdgeSet(recv, send, valid)


@partial(jax.jit, static_argnames=("topk", "connect_tools_all", "tools_only_when_near", "max_edges"))
def build_edges_batch(states, adj_thresh, mask, tool_mask, topk: int = 10,
                      connect_tools_all: bool = False, tools_only_when_near: bool = True,
                      max_edges: int = 1000) -> EdgeSet:
    """vmapped `build_edges` over a leading batch dim. `adj_thresh` may be a
    scalar or a (B,) per-sample array (reference graph.py:91-156)."""
    b = states.shape[0]
    adj_thresh = jnp.broadcast_to(jnp.asarray(adj_thresh, dtype=states.dtype), (b,))
    fn = partial(build_edges, topk=topk, connect_tools_all=connect_tools_all,
                 tools_only_when_near=tools_only_when_near, max_edges=max_edges)
    return jax.vmap(fn)(states, adj_thresh, mask, tool_mask)


@partial(jax.jit, static_argnames=("topk", "connect_tools_all",
                                   "tools_only_when_near", "tool_slots"))
def build_edges_slotted(states, adj_thresh, mask, tool_mask, topk: int = 10,
                        connect_tools_all: bool = False,
                        tools_only_when_near: bool = False,
                        tool_slots: int = 8) -> EdgeSet:
    """Radius graph as a SLOTTED edge list: slot (i, k) holds receiver i's
    k-th nearest candidate — no row-major compaction, so the O(N^2 log N)
    stable argsort `build_edges` pays per call disappears (it dominated the
    autoregressive rollout's per-step rebuild: measured ~10k -> ~30k+ graph
    steps/s at reference scale).

    The VALID EDGE SET is identical to `build_edges` (same radius + per-
    receiver-topk + tool rules, src/dynamics/dataset/graph.py:53-156); only
    the order and padding layout differ, which message passing cannot see
    (gather + segment-sum are permutation-invariant). Two deliberate
    deviations: capacity is N*topk + N*tool_slots instead of max_nR, and no
    edges are dropped when a graph would overflow max_nR (the reference
    truncates row-major). Use `build_edges` where reference-identical
    enumeration order matters (dataset preprocessing, incidence parity).

    tool_slots: static cap on tool senders handled by the connect_tools_all
    block (>= the scene's tool-particle count; 8 covers the 5-point pusher).
    """
    n = states.shape[0]
    diff = states[:, None, :] - states[None, :, :]
    dis = jnp.sum(diff * diff, axis=-1)
    pair_ok = mask[:, None] & mask[None, :]
    tool_pair = tool_mask[:, None] & tool_mask[None, :]
    dis_m = jnp.where(pair_ok, dis, _BIG)
    dis_m = jnp.where(tool_pair, _BIG, dis_m)
    thresh = jnp.asarray(adj_thresh, dtype=states.dtype) ** 2

    k = min(n, topk)
    neg_top, topk_idx = jax.lax.top_k(-dis_m, k)  # (N, K)
    slot_valid = (-neg_top) < thresh  # within radius (already pair/tool masked)
    recv = jnp.tile(jnp.arange(n, dtype=jnp.int32)[:, None], (1, k))
    send = topk_idx.astype(jnp.int32)

    if connect_tools_all:
        # the near gate mirrors graph.py:134-144: any tool-receiver edge to
        # an object sender surviving radius+topk
        tool_recv_slot = tool_mask[:, None] & slot_valid
        if tools_only_when_near:
            near = jnp.any(tool_recv_slot & ~tool_mask[send])
        else:
            near = jnp.array(True)
        # drop tool receivers and tool senders from the radius slots
        slot_valid = slot_valid & ~tool_mask[:, None] & ~tool_mask[send]
        # obj receiver -> every tool sender (gated by `near`)
        ts = min(n, tool_slots)
        tscore, tidx = jax.lax.top_k(tool_mask.astype(states.dtype), ts)
        t_send = jnp.tile(tidx.astype(jnp.int32)[None, :], (n, 1))  # (N, TS)
        t_valid = ((tscore > 0.5)[None, :] & mask[:, None] & ~tool_mask[:, None]
                   & near & mask[t_send])
        t_recv = jnp.tile(jnp.arange(n, dtype=jnp.int32)[:, None], (1, ts))
        recv = jnp.concatenate([recv, t_recv], axis=1)
        send = jnp.concatenate([send, t_send], axis=1)
        slot_valid = jnp.concatenate([slot_valid, t_valid], axis=1)

    valid = slot_valid.reshape(-1)
    recv = jnp.where(valid, recv.reshape(-1), 0)
    send = jnp.where(valid, send.reshape(-1), 0)
    return EdgeSet(recv, send, valid)


@partial(jax.jit, static_argnames=("topk", "connect_tools_all",
                                   "tools_only_when_near", "tool_slots"))
def build_edges_slotted_batch(states, adj_thresh, mask, tool_mask,
                              topk: int = 10, connect_tools_all: bool = False,
                              tools_only_when_near: bool = True,
                              tool_slots: int = 8) -> EdgeSet:
    """vmapped `build_edges_slotted` over a leading batch dim."""
    b = states.shape[0]
    adj_thresh = jnp.broadcast_to(jnp.asarray(adj_thresh, dtype=states.dtype), (b,))
    fn = partial(build_edges_slotted, topk=topk,
                 connect_tools_all=connect_tools_all,
                 tools_only_when_near=tools_only_when_near,
                 tool_slots=tool_slots)
    return jax.vmap(fn)(states, adj_thresh, mask, tool_mask)


def edges_to_incidence(edges: EdgeSet, n_nodes: int):
    """Dense (max_edges, N) one-hot Rr, Rs — parity shim for tests comparing
    against the reference's incidence representation."""
    e = edges.max_edges
    rr = jnp.zeros((e, n_nodes), dtype=jnp.float32)
    rs = jnp.zeros((e, n_nodes), dtype=jnp.float32)
    rows = jnp.arange(e)
    vals = edges.valid.astype(jnp.float32)
    rr = rr.at[rows, edges.receivers].add(vals)
    rs = rs.at[rows, edges.senders].add(vals)
    return rr, rs
