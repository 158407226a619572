"""Engine state containers — fixed-shape pytrees.

TPU-native replacement for the NvFlex solver-side state (reference:
closed-source CUDA binary behind PyFleX/include/NvFlex.h:95-170 and the
host mirrors `g_buffers` in PyFleX/bindings/pyflex.cpp). Everything is a
NamedTuple of padded arrays so the whole scene jits, vmaps (multi-env), and
scans (multi-step) without shape polymorphism:

  * particles carry an `active` mask instead of a compacted count,
  * springs / clusters / shapes carry `valid` masks,
  * shape-matching cluster membership is a (C, K) gather table, plus one
    optional "global cluster" over all particles — the reference's
    material-stiffness knob for rope (flexExtSoft.cpp:592-616).

Conventions: y-up, dt = 1/60 s per outer step (pyflex.cpp:473), quaternions
xyzw, units follow the reference scenes (1 unit = 10 cm, sim_real_ratio=10).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

SHAPE_BOX = 0
SHAPE_CAPSULE = 1
SHAPE_PLANE = 2  # infinite plane with normal +y at pos.y (floor)
SHAPE_CONVEX = 3  # convex polytope: intersection of local halfspaces


class ParticleState(NamedTuple):
    pos: jnp.ndarray  # (N, 3) f32
    vel: jnp.ndarray  # (N, 3) f32
    inv_mass: jnp.ndarray  # (N,) f32; 0 = pinned/kinematic (NvFlex 1/m in w)
    group: jnp.ndarray  # (N,) int32 collision group (NvFlex phase group)
    self_collide: jnp.ndarray  # (N,) bool (NvFlex eNvFlexPhaseSelfCollide)
    active: jnp.ndarray  # (N,) bool

    @property
    def n_max(self) -> int:
        return self.pos.shape[0]


class SpringSet(NamedTuple):
    """Distance constraints (NvFlexSetSprings). idx pairs into particles."""

    idx: jnp.ndarray  # (S, 2) int32
    rest: jnp.ndarray  # (S,) f32 rest length
    stiffness: jnp.ndarray  # (S,) f32 in [0, 1]
    valid: jnp.ndarray  # (S,) bool


class SpringIncidence(NamedTuple):
    """Transposed spring topology: per-particle incident-spring lists.

    TPU scatter-adds are the slowest op in the solver loop (the per-endpoint
    `.at[idx].add` in the spring pass measured ~60% of a 5k-particle rope
    frame); with a fixed-degree incidence table the same reduction becomes a
    pure gather: delta[n] = inv_mass[n] * sum_d sign[n,d] * corr[idx[n,d]].
    Build once on host via `build_spring_incidence` (the NvFlex solver does
    the equivalent restructuring when springs are uploaded via
    NvFlexSetSprings)."""

    idx: jnp.ndarray  # (N, D) int32 incident spring ids (0-padded)
    sign: jnp.ndarray  # (N, D) f32: +1 endpoint i, -1 endpoint j, 0 pad


def build_spring_incidence(springs: SpringSet, n: int,
                           d_max: int | None = None) -> SpringIncidence:
    """Host-side (numpy) transpose of the spring index list.

    Args: springs (possibly padded), n = particle capacity. d_max overrides
    the table width (default = max incident degree over particles)."""
    idx = np.asarray(springs.idx).reshape(-1, 2)
    valid = np.asarray(springs.valid).reshape(-1)
    s = idx.shape[0]
    sid = np.concatenate([np.arange(s), np.arange(s)])
    ends = np.concatenate([idx[:, 0], idx[:, 1]])
    sign = np.concatenate([np.ones(s, np.float32), -np.ones(s, np.float32)])
    keep = np.concatenate([valid, valid])
    sid, ends, sign = sid[keep], ends[keep], sign[keep]
    deg = np.bincount(ends, minlength=n) if len(ends) else np.zeros(n, np.int64)
    d = int(d_max if d_max is not None else max(int(deg.max(initial=0)), 1))
    inc_idx = np.zeros((n, d), dtype=np.int32)
    inc_sign = np.zeros((n, d), dtype=np.float32)
    order = np.argsort(ends, kind="stable")
    ends_s = ends[order]
    first = np.searchsorted(ends_s, ends_s, side="left")
    rank = np.arange(len(ends_s)) - first
    ok = rank < d
    inc_idx[ends_s[ok], rank[ok]] = sid[order][ok]
    inc_sign[ends_s[ok], rank[ok]] = sign[order][ok]
    dropped = int((~ok).sum())
    assert dropped == 0 or d_max is not None, "incidence overflow"
    return SpringIncidence(idx=jnp.array(inc_idx), sign=jnp.array(inc_sign))


@jax.tree_util.register_pytree_node_class
class OffsetSprings:
    """Spring families at STATIC index offsets — the truly TPU-native form
    of every spring topology the reference builds: the cloth grid's
    stretch/bend/shear springs (CreateSpringGrid, helpers.h:1246) are six
    fixed-stride families, a chain is one. Family f connects particle k to
    particle k + offsets[f] for all k in [0, N - offsets[f]); per-spring
    rest/stiffness live at row f, entry k. Because the offsets are static
    (pytree aux data), endpoint reads compile to SLICES and the endpoint
    reduction to slice-adds — no gathers, no scatters, which otherwise
    dominate the TPU solver loop (~40-70 us per 5k gather vs ~0 for a
    slice). Irregular topologies (mesh soft-body links) keep the
    SpringSet + SpringIncidence path."""

    def __init__(self, offsets, rest, stiffness, valid):
        self.offsets = tuple(int(o) for o in offsets)
        self.rest = rest  # (F, N) f32
        self.stiffness = stiffness  # (F, N) f32
        self.valid = valid  # (F, N) bool

    def tree_flatten(self):
        return (self.rest, self.stiffness, self.valid), self.offsets

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux, *children)

    def __repr__(self):
        return f"OffsetSprings(offsets={self.offsets})"


def make_offset_springs(n: int, families) -> OffsetSprings:
    """families: list of (offset, rest, stiffness, valid) where rest /
    stiffness / valid are arrays of length n - offset (or scalars).
    Host-side numpy; one device put at the end."""
    f = len(families)
    rest = np.zeros((f, n), np.float32)
    stiff = np.zeros((f, n), np.float32)
    valid = np.zeros((f, n), bool)
    offsets = []
    for fi, (o, r, s, v) in enumerate(families):
        o = int(o)
        assert 0 < o < n
        offsets.append(o)
        rest[fi, : n - o] = np.broadcast_to(np.asarray(r, np.float32), (n - o,))
        stiff[fi, : n - o] = np.broadcast_to(np.asarray(s, np.float32), (n - o,))
        valid[fi, : n - o] = np.broadcast_to(np.asarray(v, bool), (n - o,))
    return OffsetSprings(offsets, jnp.array(rest), jnp.array(stiff),
                         jnp.array(valid))


def springs_to_offset_families(idx, rest, stiffness, n: int,
                               max_families: int = 12):
    """Split a spring list into static-offset families + an irregular
    remainder (host numpy). Returns (OffsetSprings | None, leftover_mask):
    spring s is a family member when its index offset j - i is shared by
    many springs and slot (offset, i) is unclaimed; the remainder keeps the
    SpringSet gather path. Grid/chain topologies convert fully."""
    idx = np.asarray(idx, np.int64).reshape(-1, 2)
    rest = np.asarray(rest, np.float32).reshape(-1)
    stiffness = np.asarray(stiffness, np.float32).reshape(-1)
    lo = idx.min(axis=1)
    off = np.abs(idx[:, 1] - idx[:, 0])
    leftover = np.zeros(len(idx), bool)
    leftover |= off == 0  # degenerate
    offs, counts = np.unique(off[~leftover], return_counts=True)
    order = np.argsort(-counts)
    families = []
    for oi in order[:max_families]:
        o = int(offs[oi])
        sel = np.nonzero((off == o) & ~leftover)[0]
        starts = lo[sel]
        first = np.unique(starts, return_index=True)[1]  # dedupe (o, i) slots
        take = sel[first]
        r = np.zeros(n - o, np.float32)
        s = np.zeros(n - o, np.float32)
        v = np.zeros(n - o, bool)
        r[lo[take]] = rest[take]
        s[lo[take]] = stiffness[take]
        v[lo[take]] = True
        families.append((o, r, s, v))
        claimed = np.zeros(len(idx), bool)
        claimed[take] = True
        leftover |= (off == o) & ~claimed
        off = np.where(claimed, -1, off)  # retire converted springs
    if not families:
        return None, np.ones(len(idx), bool)
    return make_offset_springs(n, families), leftover


class ClusterMatmul(NamedTuple):
    """Membership-matrix form of the shape-matching cluster pass.

    The gather formulation reads (C, K) member rows + an (N, D) incidence
    table every iteration — at rope scale (384x640) that is ~250k gathered
    rows per iteration and dominates the whole frame (measured 1.28 ms of
    the 1.44 ms rope iteration). With the 0/1 membership matrix M (C, N),
    every segment reduction becomes an MXU matmul:

      com_c   = (M @ pos) / count_c
      A_c     = M @ (pos_i (x) pos0_i) - count_c * com_c (x) com0_c
      delta_i = M^T @ [b | S | s | valid]  ->  b_i + S_i pos0_i - s_i pos_i

    where pos0 = spec.rest_pos and rest[c, i] = pos0_i - com0_c (exactly how
    make_clusters builds rest offsets; attach_incidence verifies this before
    enabling the path). Exact for overlapping clusters; only valid while no
    plastic flow has reshaped the rest offsets (cluster_rest is None).
    """

    matrix: jnp.ndarray  # (C, N) f32 0/1 membership (valid members only)
    com0: jnp.ndarray    # (C, 3) member-mean rest COM (used in A)
    # goal-reference point per cluster: rest[c, i] = pos0_i - com0_goal_c.
    # Equal to com0 for ordinary clusters; differs for a folded-in global
    # cluster whose rest offsets are centered on the ALL-particle mean while
    # its membership (and hence com0) excludes pinned particles. A is
    # invariant to this reference (sum of centered positions is zero), the
    # goal term is not.
    com0_goal: jnp.ndarray  # (C, 3)
    count: jnp.ndarray   # (C,) f32 member counts (>=1 for valid clusters)
    # static rest covariance sum_i (pos0_i - com0_c)(x)(pos0_i - com0_c),
    # accumulated host-side in f64. The solver computes
    # A = a00 + M @ (u (x) pos0) - cnt * (com - com0) (x) com0 with
    # u = pos - pos0: the naive M @ (pos (x) pos0) form cancels ~|pos|^2
    # magnitudes down to ~|cluster size|^2, and the resulting deterministic
    # jitter (~1e-4 relative on A) acts like lubrication on rigid clusters
    # (measured: granular friction band ratio collapsed 1.74 -> 1.16)
    a00: jnp.ndarray     # (C, 9)


def build_cluster_matmul(clusters: ClusterSet, rest_pos, n: int) -> ClusterMatmul | None:
    """Host-side membership matrix; returns None when the rest offsets are
    not consistent with rest_pos (the factorization would be wrong)."""
    member = np.asarray(clusters.member)
    mvalid = np.asarray(clusters.member_valid) & np.asarray(clusters.valid)[:, None]
    rest_pos = np.asarray(rest_pos)[:n]
    c = member.shape[0]
    mat = np.zeros((c, n), dtype=np.float32)
    com0 = np.zeros((c, 3), dtype=np.float32)
    cnt = np.ones((c,), dtype=np.float32)
    a00 = np.zeros((c, 9), dtype=np.float32)
    rest64 = rest_pos.astype(np.float64)
    for ci in range(c):
        m = member[ci][mvalid[ci]]
        if len(m) == 0:
            continue
        mat[ci, m] = 1.0
        co64 = rest64[m].mean(axis=0)
        com0[ci] = co64.astype(np.float32)
        cnt[ci] = float(len(m))
        cen = rest64[m] - co64
        a00[ci] = np.einsum("ki,kj->ij", cen, cen).reshape(9).astype(np.float32)
        if not np.allclose(cen.astype(np.float32),
                           np.asarray(clusters.rest)[ci][mvalid[ci]],
                           atol=1e-4):
            return None
    return ClusterMatmul(matrix=jnp.array(mat), com0=jnp.array(com0),
                         com0_goal=jnp.array(com0), count=jnp.array(cnt),
                         a00=jnp.array(a00))


def fold_global_cluster(spec, particles) -> "SceneSpec":
    """Fold the global shape-matching cluster (flexExtSoft.cpp:592-616) into
    a free padding row of the membership-matrix cluster pass: its rotation
    extraction then batches with the ordinary clusters instead of running a
    ~260 us/iteration chain of scalar ops on a single quaternion. Only
    applied when the scene uses the matmul path, has a free cluster row, and
    no plasticity (the fallback paths would lose the global term). The
    membership mask snapshots build-time (active & inv_mass > 0) — exact
    while inv_mass is static, which holds for rope (the only global-cluster
    material; grasp-driven inv_mass edits only occur in cloth scenes)."""
    if spec.global_rest.shape[0] == 0 or spec.cluster_mm is None:
        return spec
    if float(np.asarray(spec.global_stiffness)) <= 0.0:
        return spec  # stiffness-0 global adds no delta AND no count
    cl = spec.clusters
    valid = np.asarray(cl.valid)
    free = np.nonzero(~valid)[0]
    if len(free) == 0:
        return spec
    row = int(free[0])
    inv_mass = np.asarray(particles.inv_mass)
    active = np.asarray(particles.active)
    mm = spec.cluster_mm
    n = mm.matrix.shape[1]
    mask = (active[:n] & (inv_mass[:n] > 0)).astype(np.float32)
    cnt = max(float(mask.sum()), 1.0)
    rest_pos = np.asarray(spec.rest_pos)[:n].astype(np.float64)
    com0_memb = (rest_pos * mask[:, None]).sum(0) / cnt
    # global_rest = rest_pos - c0: recover the goal reference point c0
    sel = active[:n]
    c0 = rest_pos[sel] - np.asarray(spec.global_rest)[:n][sel]
    c0 = c0.mean(0)
    mat = np.asarray(mm.matrix).copy()
    com0 = np.asarray(mm.com0).copy()
    com0_goal = np.asarray(mm.com0_goal).copy()
    count = np.asarray(mm.count).copy()
    a00 = np.asarray(mm.a00).copy()
    mat[row] = mask
    com0[row] = com0_memb.astype(np.float32)
    com0_goal[row] = c0.astype(np.float32)
    count[row] = cnt
    cen = (rest_pos - com0_memb) * mask[:, None]
    a00[row] = np.einsum("ki,kj->ij", cen, cen).reshape(9).astype(np.float32)
    stiff = np.asarray(cl.stiffness).copy()
    cvalid = valid.copy()
    stiff[row] = float(np.asarray(spec.global_stiffness))
    cvalid[row] = True
    return spec._replace(
        clusters=cl._replace(stiffness=jnp.array(stiff), valid=jnp.array(cvalid)),
        cluster_mm=ClusterMatmul(matrix=jnp.array(mat), com0=jnp.array(com0),
                                 com0_goal=jnp.array(com0_goal),
                                 count=jnp.array(count), a00=jnp.array(a00)),
        global_rest=jnp.zeros((0, 3), dtype=jnp.float32),
    )


def trim_cluster_matmul(spec) -> "SceneSpec":
    """Trim the membership-matrix cluster pass to the valid-row prefix.

    Builders emit valid clusters as a contiguous prefix of the cap-C
    cluster set, so the padding rows of the (C, N) membership matrix are
    all zero — yet both per-iteration matmuls still stream them from HBM.
    The pass is bandwidth-bound on exactly that traffic: at the bench rope
    point (42 valid clusters of C=1024 cap, N=5120) the measured ~54
    us/iteration matches the 2 x 21 MB matrix reads at v5e HBM speed, and
    ~96% of it is padding. Rows are cut to the prefix rounded up to a
    multiple of 8 (f32 sublane tile). The per-cluster STATE (cluster_rot)
    keeps its cap-C shape — `_cluster_deltas_matmul` slices the prefix and
    stitches the untouched tail back, so the trim is exact (trimmed rows
    have zero membership, zero stiffness, valid=False).

    Run AFTER fold_global_cluster (the fold claims the first free row past
    the valid prefix). No-op when the pass is absent or already trim."""
    mm = spec.cluster_mm
    if mm is None:
        return spec
    c = mm.matrix.shape[0]
    valid = np.asarray(spec.clusters.valid)[:c]
    nz = np.asarray(mm.matrix).any(axis=1)
    used = valid | nz
    nv = int(np.nonzero(used)[0].max()) + 1 if used.any() else 1
    ct = min(c, -(-nv // 8) * 8)
    if ct >= c:
        return spec
    if nz[ct:].any():  # non-prefix layout: trimming would drop members
        return spec
    return spec._replace(cluster_mm=ClusterMatmul(
        matrix=mm.matrix[:ct], com0=mm.com0[:ct],
        com0_goal=mm.com0_goal[:ct], count=mm.count[:ct], a00=mm.a00[:ct]))


def pad_cluster_matmul(mm: "ClusterMatmul", ct: int) -> "ClusterMatmul":
    """Re-pad a trimmed membership-matrix pass back to `ct` rows with inert
    zero rows (zero membership -> zero delta; count 1 keeps the divide
    benign; identity-preserving rotation extraction on a zero covariance).
    Used by batched envs to align trimmed widths across a batch."""
    c = mm.matrix.shape[0]
    if c >= ct:
        return mm
    p = ct - c
    return ClusterMatmul(
        matrix=jnp.concatenate(
            [mm.matrix, jnp.zeros((p, mm.matrix.shape[1]),
                                  mm.matrix.dtype)], axis=0),
        com0=jnp.concatenate([mm.com0, jnp.zeros((p, 3))], axis=0),
        com0_goal=jnp.concatenate([mm.com0_goal, jnp.zeros((p, 3))], axis=0),
        count=jnp.concatenate([mm.count, jnp.ones((p,))], axis=0),
        a00=jnp.concatenate([mm.a00, jnp.zeros((p, 9))], axis=0))


class ClusterSegments(NamedTuple):
    """Contiguous-segment form of the cluster pass, for scenes whose
    clusters are DISJOINT, CONTIGUOUS index ranges in build order (granular:
    particles are appended granule by granule, build_granular). Segment
    reductions become cumsum + a (C,)-row boundary gather, and the
    per-particle broadcast-back a (N,)-row gather of a small (C+1, .)
    table — replacing the (C, K) member gather (491k gathered rows per
    iteration at the granular 768x640 caps)."""

    starts: jnp.ndarray  # (C+1,) int32 cumulative boundaries (starts[-1] = end)
    cid: jnp.ndarray     # (N,) int32 cluster id per particle, C = "none"
    com0: jnp.ndarray    # (C, 3) rest COM per cluster
    count: jnp.ndarray   # (C,) f32 member counts (>=1)
    # static rest covariance per cluster, f64-accumulated host-side; lets the
    # solver use the displacement form A = a00 + seg(u (x) pos0) - cnt *
    # ubar (x) com0 (one fused (N, 12) segment reduction per iteration
    # instead of two reductions + a com broadcast-back gather). Same
    # cancellation rationale as ClusterMatmul.a00.
    a00: jnp.ndarray     # (C, 9)


def build_cluster_segments(clusters: ClusterSet, rest_pos, n: int) -> "ClusterSegments | None":
    """Host-side detection + table build; returns None unless every valid
    cluster is a contiguous ascending range, ranges are disjoint and ordered,
    and rest offsets derive from rest_pos (same consistency rule as
    build_cluster_matmul)."""
    member = np.asarray(clusters.member)
    mvalid = np.asarray(clusters.member_valid) & np.asarray(clusters.valid)[:, None]
    rest_pos = np.asarray(rest_pos)[:n]
    c_rows = member.shape[0]
    starts, com0, cnt, a00 = [], [], [], []
    cid = np.full((n,), 0, dtype=np.int32)
    rest64 = rest_pos.astype(np.float64)
    cursor = 0
    n_valid = 0
    for ci in range(c_rows):
        m = member[ci][mvalid[ci]]
        if len(m) == 0:
            continue
        if ci != n_valid:  # valid clusters must be a compact prefix, so the
            return None    # per-cluster tables stay aligned with ClusterSet rows
        if not (m[0] == cursor and np.array_equal(m, np.arange(m[0], m[0] + len(m)))):
            return None
        co64 = rest64[m].mean(axis=0)
        co = co64.astype(np.float32)
        if not np.allclose(rest_pos[m] - co,
                           np.asarray(clusters.rest)[ci][mvalid[ci]], atol=1e-4):
            return None
        cen = rest64[m] - co64
        a00.append(np.einsum("ki,kj->ij", cen, cen).reshape(9).astype(np.float32))
        starts.append(cursor)
        com0.append(co64)
        cnt.append(float(len(m)))
        cid[m] = n_valid
        n_valid += 1
        cursor += len(m)
    if n_valid == 0:
        return None
    # pad the per-cluster tables to the static cap so batched scenes stack
    starts = starts + [cursor] * (c_rows - n_valid + 1)
    com0 = com0 + [np.zeros(3, np.float64)] * (c_rows - n_valid)
    cnt = cnt + [1.0] * (c_rows - n_valid)
    a00 = a00 + [np.zeros(9, np.float32)] * (c_rows - n_valid)
    cid[cursor:] = c_rows  # padding particles -> "none" row
    return ClusterSegments(
        starts=jnp.array(np.asarray(starts, np.int32)),
        cid=jnp.array(cid),
        com0=jnp.array(np.stack(com0).astype(np.float32)),
        count=jnp.array(np.asarray(cnt, np.float32)),
        a00=jnp.array(np.stack(a00)))


class ClusterIncidence(NamedTuple):
    """Per-particle incident (cluster, slot) table — the cluster-pass
    analogue of SpringIncidence. idx indexes the flattened (C*K,) member
    axis of ClusterSet corrections; valid marks real entries. Degree = how
    many clusters overlap a particle (1 for granular rigid granules, a few
    for the rope's ball cover)."""

    idx: jnp.ndarray  # (N, D) int32 into flattened (C*K,)
    valid: jnp.ndarray  # (N, D) bool


def build_cluster_incidence(clusters: ClusterSet, n: int,
                            d_max: int | None = None) -> ClusterIncidence:
    """Host-side transpose of cluster membership (numpy)."""
    member = np.asarray(clusters.member)
    mvalid = np.asarray(clusters.member_valid) & np.asarray(clusters.valid)[:, None]
    c, k = member.shape
    flat = member.reshape(-1)
    fvalid = mvalid.reshape(-1)
    slot = np.arange(c * k)
    flat, slot = flat[fvalid], slot[fvalid]
    deg = np.bincount(flat, minlength=n) if len(flat) else np.zeros(n, np.int64)
    d = int(d_max if d_max is not None else max(int(deg.max(initial=0)), 1))
    inc_idx = np.zeros((n, d), dtype=np.int32)
    inc_valid = np.zeros((n, d), dtype=bool)
    order = np.argsort(flat, kind="stable")
    fs = flat[order]
    first = np.searchsorted(fs, fs, side="left")
    rank = np.arange(len(fs)) - first
    ok = rank < d
    inc_idx[fs[ok], rank[ok]] = slot[order][ok]
    inc_valid[fs[ok], rank[ok]] = True
    assert ok.all() or d_max is not None, "cluster incidence overflow"
    return ClusterIncidence(idx=jnp.array(inc_idx), valid=jnp.array(inc_valid))


class ClusterSet(NamedTuple):
    """Shape-matching clusters (NvFlexSetRigids): possibly-overlapping groups
    of particles pulled toward a rigidly-transformed rest shape."""

    member: jnp.ndarray  # (C, K) int32 particle indices (0-padded)
    member_valid: jnp.ndarray  # (C, K) bool
    rest: jnp.ndarray  # (C, K, 3) f32 rest offsets from cluster COM
    stiffness: jnp.ndarray  # (C,) f32
    valid: jnp.ndarray  # (C,) bool


class ShapeSet(NamedTuple):
    """Kinematic collision shapes (table boxes, robot tool + arm links) — the
    engine-side mirror of pyflex shape states (14-dim: pos, prev_pos, quat,
    prev_quat; pyflex.cpp:3154-3237). CONVEX shapes (the analogue of
    pyflex_add_mesh's triangle-mesh shapes, pyflex.cpp:2828, here as the
    mesh's convex hull) carry `planes`: local halfspaces n·x <= d, rows
    (nx, ny, nz, d), zero-normal rows = padding."""

    kind: jnp.ndarray  # (M,) int32 in {BOX, CAPSULE, PLANE, CONVEX}
    size: jnp.ndarray  # (M, 3) box half-edges / capsule (radius, half_len, _)
    pos: jnp.ndarray  # (M, 3)
    quat: jnp.ndarray  # (M, 4) xyzw
    prev_pos: jnp.ndarray  # (M, 3)
    prev_quat: jnp.ndarray  # (M, 4)
    valid: jnp.ndarray  # (M,) bool
    planes: jnp.ndarray  # (M, P, 4) convex-hull halfspaces (P may be 0)

    def moved_to(self, pos, quat) -> "ShapeSet":
        """New pose; the old current pose becomes prev (one sim frame)."""
        return self._replace(prev_pos=self.pos, prev_quat=self.quat, pos=pos, quat=quat)


class SolverParams(NamedTuple):
    """Per-scene solver parameters — the used subset of NvFlexParams
    (NvFlex.h:95-154) as configured by the three scenes
    (by_softrope.h:186-224, by_granular.h:74-84, by_softgym_cloth.h:140-154).
    All floats (traceable); iteration counts are static args to the solver.
    """

    dt: jnp.ndarray = 1.0 / 60.0
    gravity: jnp.ndarray = -9.8
    radius: jnp.ndarray = 0.03  # interaction radius
    solid_rest_distance: jnp.ndarray = 0.03  # particle-particle rest separation
    collision_distance: jnp.ndarray = 0.015  # particle-shape contact offset
    shape_collision_margin: jnp.ndarray = 0.0
    dynamic_friction: jnp.ndarray = 0.1
    particle_friction: jnp.ndarray = 0.25
    static_friction: jnp.ndarray = 0.0
    damping: jnp.ndarray = 0.0  # viscous drag on velocity
    dissipation: jnp.ndarray = 0.0  # contact-count-based velocity loss
    sleep_threshold: jnp.ndarray = 0.0
    relaxation_factor: jnp.ndarray = 1.0  # SOR factor for Jacobi projection
    max_speed: jnp.ndarray = 1e6
    restitution: jnp.ndarray = 0.0
    # eNvFlexPhaseSelfCollideFilter: same-group pairs closer than this in the
    # REST configuration never collide (NvFlex.h:160-170). 0 disables.
    collide_filter_dist: jnp.ndarray = 0.0
    # shape-matching plasticity (NvFlexParams plasticThreshold/plasticCreep,
    # NvFlex.h:95-154): when a cluster's mean deformation from its rest shape
    # exceeds the threshold, rest offsets creep toward the deformed
    # configuration at `plastic_creep` per substep. Both zero in all three
    # reference scenes; enabled by passing `cluster_rest` in SceneState.
    plastic_threshold: jnp.ndarray = 0.0
    plastic_creep: jnp.ndarray = 0.0


class SceneSpec(NamedTuple):
    """Static scene description (constraint topology + solver params)."""

    springs: SpringSet
    clusters: ClusterSet
    global_stiffness: jnp.ndarray  # scalar softness of the global cluster
    # (N, 3) rest offsets for the global cluster, or shape (0, 3) for "this
    # scene has no global cluster" — the zero-row form compiles the whole
    # pass away (don't pass (N, 3) zeros with stiffness 0: that keeps the
    # per-iteration polar decomposition in the program)
    global_rest: jnp.ndarray
    rest_pos: jnp.ndarray  # (N, 3) rest positions (for the collide filter)
    params: SolverParams
    # per-particle incident-spring table (build_spring_incidence): when
    # present the spring pass runs gather-only (no TPU scatter); None falls
    # back to the scatter-add formulation
    spring_inc: SpringIncidence | None = None
    # same for the shape-matching cluster pass (build_cluster_incidence)
    cluster_inc: ClusterIncidence | None = None
    # membership-matrix cluster pass (build_cluster_matmul): when present
    # (and no plastic flow is active) the cluster pass runs as two MXU
    # matmuls with zero gathers — preferred at small-N scenes (rope)
    cluster_mm: "ClusterMatmul | None" = None
    # contiguous-segment cluster pass (build_cluster_segments) — cumsum
    # form for disjoint granule layouts at large N (granular)
    cluster_seg: "ClusterSegments | None" = None
    # static-offset spring families (make_offset_springs) — the gather-free
    # spring pass for grid/chain topologies; applied IN ADDITION to
    # `springs` (use empty_springs(0) when all springs are offset families)
    offset_springs: OffsetSprings | None = None


class SceneState(NamedTuple):
    """Evolving state threaded through `xpbd_step`."""

    particles: ParticleState
    shapes: ShapeSet
    cluster_rot: jnp.ndarray  # (C, 4) warm-started shape-match rotations
    global_rot: jnp.ndarray  # (4,) rotation of the global cluster
    # plastic rest offsets (C, K, 3): None = elastic clusters (rest shape
    # stays spec.clusters.rest). Seed with jnp.array(spec.clusters.rest) to
    # enable plastic flow governed by params.plastic_threshold/creep.
    cluster_rest: jnp.ndarray | None = None
    # running count of AABB-overlapping tile pairs dropped by the block
    # contact sweep's per-row cap (tile_overlap_blocks max_blocks):
    # nonzero means particle contacts were silently skipped this frame —
    # callers fold a per-push delta into their explosion ('bad') guard
    contact_overflow: jnp.ndarray | int = 0


def make_particles(pos, inv_mass=None, group=None, self_collide=False, n_max=None) -> ParticleState:
    """Build a padded ParticleState from a concrete (n, 3) position array."""
    pos = np.asarray(pos, dtype=np.float32)
    n = pos.shape[0]
    n_max = n_max or n
    if inv_mass is None:
        inv_mass = np.ones((n,), dtype=np.float32)
    else:
        inv_mass = np.broadcast_to(np.asarray(inv_mass, dtype=np.float32), (n,)).copy()
    if group is None:
        group = np.zeros((n,), dtype=np.int32)
    else:
        group = np.broadcast_to(np.asarray(group, dtype=np.int32), (n,)).copy()
    sc = np.broadcast_to(np.asarray(self_collide, dtype=bool), (n,)).copy()

    def pad(a, fill=0):
        out = np.full((n_max,) + a.shape[1:], fill, dtype=a.dtype)
        out[:n] = a
        return out

    return ParticleState(
        pos=jnp.array(pad(pos)),
        vel=jnp.zeros((n_max, 3), dtype=jnp.float32),
        inv_mass=jnp.array(pad(inv_mass)),
        group=jnp.array(pad(group, fill=-1)),
        self_collide=jnp.array(pad(sc, fill=False)),
        active=jnp.array(pad(np.ones(n, dtype=bool), fill=False)),
    )


def empty_springs(capacity: int) -> SpringSet:
    return SpringSet(
        idx=jnp.zeros((capacity, 2), dtype=jnp.int32),
        rest=jnp.zeros((capacity,), dtype=jnp.float32),
        stiffness=jnp.zeros((capacity,), dtype=jnp.float32),
        valid=jnp.zeros((capacity,), dtype=bool),
    )


def make_springs(idx, rest, stiffness, capacity=None) -> SpringSet:
    # pure numpy until the final device put: scene construction is host-side
    # and must not dispatch tiny device ops (slow over remote-TPU tunnels)
    idx = np.asarray(idx, dtype=np.int32).reshape(-1, 2)
    s = idx.shape[0]
    capacity = capacity or s
    idx_p = np.zeros((capacity, 2), dtype=np.int32)
    rest_p = np.zeros((capacity,), dtype=np.float32)
    stiff_p = np.zeros((capacity,), dtype=np.float32)
    valid_p = np.zeros((capacity,), dtype=bool)
    idx_p[:s] = idx
    rest_p[:s] = np.broadcast_to(np.asarray(rest, dtype=np.float32), (s,))
    stiff_p[:s] = np.broadcast_to(np.asarray(stiffness, dtype=np.float32), (s,))
    valid_p[:s] = True
    return SpringSet(idx=jnp.array(idx_p), rest=jnp.array(rest_p),
                     stiffness=jnp.array(stiff_p), valid=jnp.array(valid_p))


def empty_clusters(c: int, k: int) -> ClusterSet:
    return ClusterSet(
        member=jnp.zeros((c, k), dtype=jnp.int32),
        member_valid=jnp.zeros((c, k), dtype=bool),
        rest=jnp.zeros((c, k, 3), dtype=jnp.float32),
        stiffness=jnp.zeros((c,), dtype=jnp.float32),
        valid=jnp.zeros((c,), dtype=bool),
    )


def make_clusters(members: list, positions, stiffness, c_max=None, k_max=None) -> ClusterSet:
    """members: list of index lists; rest offsets are computed from
    `positions` relative to each cluster's (uniform-mass) COM."""
    positions = np.asarray(positions, dtype=np.float32)
    c = len(members)
    c_max = c_max or max(c, 1)
    k_max = k_max or max((len(m) for m in members), default=1)
    member = np.zeros((c_max, k_max), dtype=np.int32)
    mvalid = np.zeros((c_max, k_max), dtype=bool)
    rest = np.zeros((c_max, k_max, 3), dtype=np.float32)
    stiff = np.zeros((c_max,), dtype=np.float32)
    cvalid = np.zeros((c_max,), dtype=bool)
    stiffness = np.broadcast_to(np.asarray(stiffness, dtype=np.float32), (c,))
    for ci, m in enumerate(members):
        m = np.asarray(m, dtype=np.int32)
        k = len(m)
        assert k <= k_max, f"cluster {ci} has {k} members > k_max={k_max}"
        member[ci, :k] = m
        mvalid[ci, :k] = True
        com = positions[m].mean(axis=0)
        rest[ci, :k] = positions[m] - com
        stiff[ci] = stiffness[ci]
        cvalid[ci] = True
    return ClusterSet(
        member=jnp.array(member), member_valid=jnp.array(mvalid), rest=jnp.array(rest),
        stiffness=jnp.array(stiff), valid=jnp.array(cvalid),
    )


def make_shapes(kinds, sizes, poses, quats, m_max=None, planes=None,
                p_max=0) -> ShapeSet:
    """planes: optional list (len m) of (p_i, 4) arrays of local halfspaces
    for CONVEX shapes (None entries allowed); padded to (m_max, p_max, 4).
    A zero p_max means "this scene has no convex shapes" and the convex
    branch of the contact pass compiles away."""
    kinds = np.asarray(kinds, dtype=np.int32).reshape(-1)
    m = kinds.shape[0]
    m_max = m_max or m
    sizes = np.asarray(sizes, dtype=np.float32).reshape(m, 3)
    poses = np.asarray(poses, dtype=np.float32).reshape(m, 3)
    quats = np.asarray(quats, dtype=np.float32).reshape(m, 4)
    if planes is not None:
        p_max = max(p_max, max((0 if p is None else len(p)) for p in planes))
    planes_p = np.zeros((m_max, p_max, 4), dtype=np.float32)
    if planes is not None:
        for i, p in enumerate(planes):
            if p is not None and len(p):
                planes_p[i, : len(p)] = np.asarray(p, dtype=np.float32)

    def pad(a, fill=0.0):
        out = np.full((m_max,) + a.shape[1:], fill, dtype=a.dtype)
        out[:m] = a
        return out

    qpad = pad(quats)
    qpad[m:, 3] = 1.0
    return ShapeSet(
        kind=jnp.array(pad(kinds)),
        size=jnp.array(pad(sizes)),
        pos=jnp.array(pad(poses)),
        quat=jnp.array(qpad),
        prev_pos=jnp.array(pad(poses)),
        prev_quat=jnp.array(qpad),
        valid=jnp.array(pad(np.ones(m, dtype=bool), fill=False)),
        planes=jnp.array(planes_p),
    )
