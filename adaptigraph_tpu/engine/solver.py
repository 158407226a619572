"""XPBD particle solver — the TPU-native core replacing NvFlexUpdateSolver.

Semantics follow the unified-particle PBD pipeline the reference drives
through the closed CUDA solver (SURVEY.md §3.5; params NvFlex.h:95-154;
per-scene substep/iteration counts by_softrope.h:191,198 (2/4),
by_granular.h:74-76 (12/6), by_softgym_cloth.h:145-146 (4/50)):

  per substep: integrate -> neighbor find -> `iterations` x Jacobi projection
  of {distance springs, shape-matching clusters, particle contacts+friction,
  kinematic-shape contacts+friction} -> velocity update (damping, sleeping).

TPU mapping:
  * all constraint projections are gather/segment-sum passes over fixed-size
    padded sets — no sorting, no atomics, no dynamic shapes;
  * Jacobi with constraint-count averaging (the parallel-friendly analogue of
    FleX's local relaxation mode) instead of Gauss-Seidel;
  * substeps run under `lax.scan`, iterations under `lax.fori_loop`, so one
    outer `xpbd_step` is a single compiled program; `rollout_steps` scans
    entire pushes on device;
  * shape-matching rotations are extracted with the warm-started iterative
    quaternion method (utils.geometry.extract_rotation) — no batched SVD.

The whole step vmaps over a leading env axis for multi-env data generation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from adaptigraph_tpu.engine.cells import cell_list_neighbors
from adaptigraph_tpu.engine.neighbors import neighbor_list
from adaptigraph_tpu.engine.pallas_kernels import (
    DENSE_CONTACT_MAX_N, block_sparse_contact_deltas_packed,
    dense_contact_deltas, pack_contact_tables, refine_overlap_blocks_packed,
    tile_overlap_blocks, update_contact_tables)
from adaptigraph_tpu.engine.collisions import shape_contact_deltas
from adaptigraph_tpu.engine.state import (
    ParticleState,
    SceneSpec,
    SceneState,
    ShapeSet,
)
from adaptigraph_tpu.utils import geometry as geo

_EPS = 1e-9
_TILE = 128


def auto_contact_mode(n: int) -> str:
    """Contact-sweep implementation for an `n`-particle scene: small scenes
    use the plain dense sweep (no culling overhead); at scale the
    AABB-culled block sweep skips far tile pairs. SINGLE source of truth —
    callers that pre-pack contact tables (SimEnv/BatchSimEnv/rollout_steps)
    must agree with xpbd_step or they pack tables it ignores (ADVICE r4 #3).
    """
    return "dense" if n <= 2048 else "block"


def auto_tile_j(n: int) -> int:
    """Contact-sweep column-tile width for an `n`-row scene. At 32k rows the
    128-wide sweep needs >64 column blocks per row tile for dense piles, but
    (nb, maxb) SMEM at 256x128 blows the ~64 KB budget — coarsen to 256-wide
    tiles (half the blocks, nb halves, maxb stays 128). Overflowing blocks
    are a HARD failure (folded into the explosion guard), so this threshold
    must match between the packer and the sweep."""
    return 256 if n > 16384 else _TILE


def pack_tables_for(particles: ParticleState, spec: SceneSpec):
    """Pack the frame-constant contact attribute tables for `particles` iff
    the auto-selected contact mode is 'block'; None otherwise (the dense
    sweep takes no tables). Use this from every pre-packing call site so the
    mode/tile thresholds stay in lockstep with xpbd_step's auto-selection."""
    from adaptigraph_tpu.engine.pallas_kernels import pack_contact_tables

    n = particles.pos.shape[0]
    if auto_contact_mode(n) != "block":
        return None
    return pack_contact_tables(
        particles.pos, particles.pos, particles.group, particles.inv_mass,
        particles.self_collide, particles.active, spec.rest_pos,
        tile_j=auto_tile_j(n))


def _pad_tile(x, t: int = _TILE):
    return jnp.pad(x, ((0, (-x.shape[0]) % t),) + ((0, 0),) * (x.ndim - 1))


def _pad_tile_mask(m, t: int = _TILE):
    return jnp.pad(m, (0, (-m.shape[0]) % t))


def _spring_deltas(pos, inv_mass, springs):
    """Distance-constraint corrections, scatter-added per endpoint."""
    i, j = springs.idx[:, 0], springs.idx[:, 1]
    pi, pj = pos[i], pos[j]
    d = pi - pj
    length = jnp.linalg.norm(d, axis=-1)
    direction = d / (length[:, None] + _EPS)
    c = length - springs.rest
    wi, wj = inv_mass[i], inv_mass[j]
    wsum = wi + wj
    ok = springs.valid & (wsum > 0)
    corr = -(springs.stiffness * c / (wsum + _EPS))[:, None] * direction
    corr = jnp.where(ok[:, None], corr, 0.0)
    n = pos.shape[0]
    delta = jnp.zeros((n, 3), dtype=pos.dtype)
    delta = delta.at[i].add(wi[:, None] * corr)
    delta = delta.at[j].add(-wj[:, None] * corr)
    cnt = jnp.zeros((n,), dtype=pos.dtype)
    okf = ok.astype(pos.dtype)
    cnt = cnt.at[i].add(okf)
    cnt = cnt.at[j].add(okf)
    return delta, cnt


def _spring_deltas_gather(pos, inv_mass, springs, inc):
    """Distance-constraint corrections via the precomputed incidence table
    (state.SpringIncidence): per-spring corrections are gathered back to
    endpoints instead of scatter-added — scatters are the slowest op in the
    TPU solver loop (~60% of a 5k rope frame measured)."""
    i, j = springs.idx[:, 0], springs.idx[:, 1]
    d = pos[i] - pos[j]
    length = jnp.linalg.norm(d, axis=-1)
    direction = d / (length[:, None] + _EPS)
    c = length - springs.rest
    wi, wj = inv_mass[i], inv_mass[j]
    wsum = wi + wj
    ok = springs.valid & (wsum > 0)
    corr = -(springs.stiffness * c / (wsum + _EPS))[:, None] * direction
    corr = jnp.where(ok[:, None], corr, 0.0)
    g = corr[inc.idx]  # (N, D, 3) — the only non-endpoint gather
    delta = jnp.sum(g * inc.sign[..., None], axis=1) * inv_mass[:, None]
    okg = ok[inc.idx] & (inc.sign != 0)
    cnt = jnp.sum(okg, axis=1).astype(pos.dtype)
    return delta, cnt


def _spring_deltas_offset(pos, inv_mass, os):
    """Distance constraints for static-offset spring families
    (state.OffsetSprings): endpoint reads are slices and the reduction is a
    zero-padded concatenate + elementwise sum — zero gathers/scatters, zero
    dynamic-update-slices, pure VPU. (The earlier .at[].add form chained
    ~4 serial full-array DUS ops per family, which XLA would not fuse —
    ~178 us/iteration at the cloth design point vs a few us for this
    fully-fusible tree.)

    The whole pass runs COMPONENT-SPLIT on (N,) arrays: a (N, 3) f32 array
    tiles on TPU with the minor dim lane-padded 3 -> 128, so every
    elementwise op on it moves ~42x the payload; (N,) vectors pack lanes
    densely. Split once, restack once."""
    n = pos.shape[0]
    px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]
    ax = jnp.zeros((n,), dtype=pos.dtype)
    ay = jnp.zeros((n,), dtype=pos.dtype)
    az = jnp.zeros((n,), dtype=pos.dtype)
    cnt = jnp.zeros((n,), dtype=pos.dtype)
    for f, o in enumerate(os.offsets):
        dx = px[: n - o] - px[o:]
        dy = py[: n - o] - py[o:]
        dz = pz[: n - o] - pz[o:]
        d2 = dx * dx + dy * dy + dz * dz
        inv_len = jax.lax.rsqrt(d2 + _EPS)
        length = d2 * inv_len
        c = length - os.rest[f, : n - o]
        wi = inv_mass[: n - o]
        wj = inv_mass[o:]
        wsum = wi + wj
        ok = os.valid[f, : n - o] & (wsum > 0)
        okf = ok.astype(pos.dtype)
        mag = -(os.stiffness[f, : n - o] * c / (wsum + _EPS)) * inv_len * okf
        cx, cy, cz = mag * dx, mag * dy, mag * dz
        z1 = jnp.zeros((o,), dtype=pos.dtype)
        ax = ax + jnp.concatenate([wi * cx, z1]) - jnp.concatenate([z1, wj * cx])
        ay = ay + jnp.concatenate([wi * cy, z1]) - jnp.concatenate([z1, wj * cy])
        az = az + jnp.concatenate([wi * cz, z1]) - jnp.concatenate([z1, wj * cz])
        cnt = cnt + jnp.concatenate([okf, z1])
        cnt = cnt + jnp.concatenate([z1, okf])
    return jnp.stack([ax, ay, az], axis=-1), cnt


def precompute_contact_static(inv_mass, group, self_collide, active, nbr_idx, nbr_valid,
                              rest_pos=None, filter_dist=0.0):
    """Per-frame invariants of the particle-contact pass: pair eligibility
    (group / self-collide / rest-distance filter — the
    eNvFlexPhaseSelfCollideFilter semantics, phases set at
    by_softrope.h:303) and mass shares. Computing these once per frame
    leaves a single pos gather per solver iteration."""
    gi = group[:, None]
    gj = group[nbr_idx]
    collide = (gi != gj) | (self_collide[:, None] & self_collide[nbr_idx])
    if rest_pos is not None:
        rest_d = jnp.linalg.norm(rest_pos[:, None, :] - rest_pos[nbr_idx], axis=-1)
        collide = collide & ~((gi == gj) & (rest_d < filter_dist))
    wi = inv_mass[:, None]
    wj = inv_mass[nbr_idx]
    wsum = wi + wj
    eligible = nbr_valid & collide & (wsum > 0)
    share = wi / (wsum + _EPS)
    return eligible, share


def _particle_contact_deltas(pos, pos_prev, nbr_idx, eligible, share,
                             rest_dist, particle_friction, pj_prev=None):
    """Particle-particle non-penetration + friction from the fixed-K neighbor
    list. Pure gather: each pair is handled from both sides symmetrically.
    `pj_prev` (substep-start neighbor positions) is hoisted by the caller so
    the iteration loop performs a single gather."""
    pj = pos[nbr_idx]  # (N, K, 3) — the only per-iteration gather
    if pj_prev is None:
        pj_prev = pos_prev[nbr_idx]
    d = pos[:, None, :] - pj
    dist = jnp.linalg.norm(d, axis=-1)
    direction = d / (dist[..., None] + _EPS)
    overlap = rest_dist - dist  # > 0 when penetrating
    contact = eligible & (overlap > 0)
    delta_n = direction * (share * overlap)[..., None]
    # friction: tangential relative displacement over the substep
    rel = (pos - pos_prev)[:, None, :] - (pj - pj_prev)
    rel_t = rel - direction * jnp.sum(rel * direction, axis=-1, keepdims=True)
    rel_t_norm = jnp.linalg.norm(rel_t, axis=-1, keepdims=True)
    max_slide = particle_friction * overlap[..., None]
    scale = jnp.minimum(1.0, jnp.maximum(max_slide, 0.0) / (rel_t_norm + _EPS))
    delta_f = -rel_t * scale * share[..., None]
    delta = jnp.where(contact[..., None], delta_n + delta_f, 0.0)
    return jnp.sum(delta, axis=1), jnp.sum(contact.astype(pos.dtype), axis=1)


def _cluster_deltas(pos, clusters, cluster_rot, rest=None, inc=None):
    """Shape-matching corrections (NvFlex rigids / soft clusters,
    flexExtSoft.cpp:551). `rest` overrides clusters.rest when plasticity has
    reshaped the rest configuration. `inc` (state.ClusterIncidence) switches
    the endpoint reduction from scatter-add to a pure gather (TPU scatters
    dominate the solver loop otherwise). Returns (delta, count,
    new_rotations)."""
    member = clusters.member  # (C, K)
    mvalid = clusters.member_valid
    if rest is None:
        rest = clusters.rest
    p = pos[member]  # (C, K, 3)
    mv = mvalid.astype(pos.dtype)[..., None]
    nmem = jnp.maximum(jnp.sum(mv, axis=1), 1.0)  # (C, 1)
    com = jnp.sum(p * mv, axis=1) / nmem
    centered = (p - com[:, None, :]) * mv
    a = jnp.einsum("cki,ckj->cij", centered, rest * mv,
                   precision=jax.lax.Precision.HIGHEST)
    q_new = geo.extract_rotation(a, cluster_rot, iterations=6)
    q_new = jnp.where(clusters.valid[:, None], q_new, cluster_rot)
    goal = com[:, None, :] + geo.quat_rotate(q_new[:, None, :], rest)
    corr = (goal - p) * clusters.stiffness[:, None, None]
    ok = mvalid & clusters.valid[:, None]
    corr = jnp.where(ok[..., None], corr, 0.0)
    n = pos.shape[0]
    if inc is not None:
        cflat = corr.reshape(-1, 3)
        okflat = ok.reshape(-1)
        g = cflat[inc.idx]  # (N, D, 3)
        gv = (okflat[inc.idx] & inc.valid).astype(pos.dtype)
        delta = jnp.sum(g * gv[..., None], axis=1)
        cnt = jnp.sum(gv, axis=1)
    else:
        delta = jnp.zeros((n, 3), dtype=pos.dtype).at[member.reshape(-1)].add(
            corr.reshape(-1, 3))
        cnt = jnp.zeros((n,), dtype=pos.dtype).at[member.reshape(-1)].add(
            ok.astype(pos.dtype).reshape(-1))
    return delta, cnt, q_new


def _cluster_deltas_matmul(pos, pos0, clusters, cluster_rot, mm):
    """Shape-matching corrections via the membership matrix (state.ClusterMatmul):
    segment reductions as two MXU matmuls, zero gathers. Exact reformulation
    of `_cluster_deltas` for elastic clusters whose rest offsets derive from
    `pos0` (= spec.rest_pos); see ClusterMatmul's docstring for the algebra.
    Replaces the dominant rope-frame cost (measured 1.28 ms/iteration of
    member gathers at C=384, K=640 -> ~25 us of matmul)."""
    hi = jax.lax.Precision.HIGHEST
    m = mm.matrix  # (C_t, N) — possibly trimmed to the valid-row prefix
    # state.trim_cluster_matmul cuts the all-zero padding rows the matmuls
    # would otherwise stream from HBM every iteration; per-cluster state and
    # ClusterSet stay cap-C sized, so slice their prefix and stitch the
    # untouched tail back on return
    ct = m.shape[0]
    rot_tail = cluster_rot[ct:]
    cluster_rot = cluster_rot[:ct]
    cl_valid = clusters.valid[:ct]
    cl_stiff = clusters.stiffness[:ct]
    cnt = jnp.maximum(mm.count, 1.0)[:, None]  # (C_t, 1)
    # displacement form: u magnitudes (motion since build) are far smaller
    # than absolute coordinates, so the matmul-and-subtract below loses
    # ~|u||pos0| instead of ~|pos||pos0| to cancellation (see ClusterMatmul
    # .a00); com and A come out of ONE fused matmul
    u = pos - pos0  # (N, 3)
    outer = (u[:, :, None] * pos0[:, None, :]).reshape(-1, 9)  # (N, 9)
    uo = jnp.concatenate([u, outer], axis=1)  # (N, 12)
    g12 = jnp.dot(m, uo, precision=hi)  # (C, 12)
    ubar = g12[:, :3] / cnt  # (C, 3) mean displacement
    com = mm.com0 + ubar
    a = mm.a00.reshape(-1, 3, 3) + g12[:, 3:].reshape(-1, 3, 3) \
        - cnt[..., None] * (ubar[:, :, None] * mm.com0[:, None, :])
    q_new = geo.extract_rotation(a, cluster_rot, iterations=6)
    q_new = jnp.where(cl_valid[:, None], q_new, cluster_rot)
    r = geo.quat_to_matrix(q_new)  # (C_t, 3, 3)
    s = cl_stiff  # (C_t,)
    # R @ com0_goal written out elementwise: tiny einsums lower to
    # dot_general, whose DEFAULT precision is lossy (bf16-class) on both
    # the TPU and the forced-host CPU test platform — enough per-iteration
    # noise to wash out granular stick-slip friction over a push
    b = s[:, None] * (com - _mat3_apply(r, mm.com0_goal))  # (C_t, 3)
    packed = jnp.concatenate(
        [b, (s[:, None, None] * r).reshape(-1, 9), s[:, None],
         cl_valid.astype(pos.dtype)[:, None]], axis=1)  # (C_t, 14)
    g = jnp.dot(m.T, packed, precision=hi)  # (N, 14)
    delta = g[:, :3] + _mat3_apply(g[:, 3:12].reshape(-1, 3, 3), pos0) \
        - g[:, 12:13] * pos
    cnt_p = g[:, 13]
    return delta, cnt_p, jnp.concatenate([q_new, rot_tail], axis=0)


def _mat3_apply(m3, v):
    """(..., 3, 3) @ (..., 3) as explicit FMAs (full f32, no dot_general)."""
    return jnp.stack(
        [m3[..., 0, 0] * v[..., 0] + m3[..., 0, 1] * v[..., 1] + m3[..., 0, 2] * v[..., 2],
         m3[..., 1, 0] * v[..., 0] + m3[..., 1, 1] * v[..., 1] + m3[..., 1, 2] * v[..., 2],
         m3[..., 2, 0] * v[..., 0] + m3[..., 2, 1] * v[..., 1] + m3[..., 2, 2] * v[..., 2]],
        axis=-1)


def _cluster_deltas_segments(pos, pos0, clusters, cluster_rot, seg):
    """Shape-matching corrections for disjoint contiguous clusters
    (state.ClusterSegments — the granular granule layout): one fused sorted
    segment reduction + one (N,)-row broadcast-back gather of a small
    (C+1, 14) table. Same algebra as `_cluster_deltas_matmul`."""
    n = pos.shape[0]
    c_rows = seg.count.shape[0]
    cnt = jnp.maximum(seg.count, 1.0)[:, None]
    # displacement form (see ClusterSegments.a00): ONE fused (N, 12)
    # segment reduction over the SORTED contiguous ids yields both the mean
    # displacement and the dynamic part of the covariance — no com
    # broadcast-back gather, no second reduction pass. u magnitudes are
    # ~motion-since-build, so the matmul-and-subtract loses ~|u||pos0| to
    # cancellation instead of ~|pos||pos0| (the rigid-granule friction
    # rationale in ClusterMatmul.a00 applies unchanged).
    u = pos - pos0
    outer = (u[:, :, None] * pos0[:, None, :]).reshape(n, 9)
    uo = jnp.concatenate([u, outer], axis=1)  # (N, 12)
    # contiguous segments: the reduction is an inclusive cumsum + boundary
    # differencing — no scatter at all (the scatter-add segment_sum form
    # measured 1.4x slower at the 27k granular design point; XLA lowers
    # cumsum to log-depth shifted adds, so the f32 error is ~eps*log2(N) of
    # the RUNNING sum, validated against the exact member-gather pass by
    # test_cluster_segments_match_gather_granular_scene)
    cs = jnp.concatenate([jnp.zeros((1, 12), pos.dtype),
                          jnp.cumsum(uo, axis=0)], axis=0)
    bnd = cs[seg.starts]  # (C+1, 12) tiny boundary gather
    g12 = bnd[1:] - bnd[:-1]
    ubar = g12[:, :3] / cnt
    com = seg.com0 + ubar
    a = (seg.a00.reshape(-1, 3, 3) + g12[:, 3:].reshape(-1, 3, 3)
         - cnt[..., None] * (ubar[:, :, None] * seg.com0[:, None, :]))
    q_new = geo.extract_rotation(a, cluster_rot, iterations=6)
    q_new = jnp.where(clusters.valid[:, None], q_new, cluster_rot)
    r = geo.quat_to_matrix(q_new)
    s = clusters.stiffness
    b = s[:, None] * (com - _mat3_apply(r, seg.com0))  # full-f32 (see matmul pass)
    table = jnp.concatenate(
        [b, (s[:, None, None] * r).reshape(-1, 9), s[:, None],
         clusters.valid.astype(pos.dtype)[:, None]], axis=1)  # (C, 14)
    table = jnp.concatenate([table, jnp.zeros((1, 14), pos.dtype)], axis=0)
    g = table[seg.cid]  # (N, 14) — the only large gather
    delta = g[:, :3] + _mat3_apply(g[:, 3:12].reshape(-1, 3, 3), pos0) \
        - g[:, 12:13] * pos
    return delta, g[:, 13], q_new


def _plastic_flow(pos, clusters, cluster_rot, rest, threshold, creep):
    """Shape-matching plasticity (NvFlexParams plasticThreshold/plasticCreep,
    NvFlex.h:95-154): once per substep, clusters whose RMS deviation from the
    rest shape (measured in the rotated-back local frame) exceeds `threshold`
    absorb `creep` of the deformation into their rest offsets. Rest offsets
    are re-centered so the cluster COM stays well-defined."""
    member = clusters.member
    mv = clusters.member_valid.astype(pos.dtype)[..., None]
    nmem = jnp.maximum(jnp.sum(mv, axis=1), 1.0)
    p = pos[member]
    com = jnp.sum(p * mv, axis=1) / nmem
    # rotate the deformed configuration back into the rest frame
    local = geo.quat_rotate(geo.quat_conjugate(cluster_rot)[:, None, :],
                            (p - com[:, None, :])) * mv
    dev = (local - rest) * mv
    rms = jnp.sqrt(jnp.sum(dev * dev, axis=(1, 2)) / nmem[:, 0])  # (C,)
    flow = (rms > threshold) & clusters.valid
    new_rest = rest + jnp.where(flow[:, None, None], creep, 0.0) * dev
    new_rest = (new_rest - jnp.sum(new_rest * mv, axis=1, keepdims=True) / nmem[:, :, None]) * mv
    return new_rest


def _global_cluster_deltas(pos, active, inv_mass, rest, stiffness, q_prev):
    """One shape-matching cluster spanning every active particle — the
    rope's material-stiffness knob (globalStiffness,
    flexExtSoft.cpp:592-616)."""
    m = (active & (inv_mass > 0)).astype(pos.dtype)[:, None]
    nmem = jnp.maximum(jnp.sum(m), 1.0)
    com = jnp.sum(pos * m, axis=0) / nmem
    centered = (pos - com) * m
    a = jnp.einsum("ki,kj->ij", centered, rest * m, precision=jax.lax.Precision.HIGHEST)
    q_new = geo.extract_rotation(a, q_prev, iterations=6)
    goal = com + geo.quat_rotate(q_new, rest)
    delta = (goal - pos) * stiffness * m
    cnt = (m[:, 0] > 0).astype(pos.dtype) * jnp.where(stiffness > 0, 1.0, 0.0)
    return delta, cnt, q_new


def _nlerp(q0, q1, t):
    q1 = jnp.where(jnp.sum(q0 * q1, axis=-1, keepdims=True) < 0, -q1, q1)
    return geo.quat_normalize(q0 + (q1 - q0) * t)


def _substep(particles: ParticleState, cluster_rot, global_rot, spec: SceneSpec,
             shapes: ShapeSet, s_pos, s_quat, s_vel, nbr_idx, eligible, share,
             dt, iterations: int, mode: str = "sparse", interpret: bool = False,
             cluster_rest=None, blocks=None, tables=None,
             rest_filter: bool = True, tile_j: int | None = None,
             n_shapes_active: int | None = None):
    p = particles
    prm = spec.params
    movable = (p.inv_mass > 0) & p.active
    mov = movable.astype(p.pos.dtype)[:, None]
    # static structure flags: zero-capacity spring/cluster sets are the
    # builders' "none" encoding — those passes compile away entirely
    has_springs = spec.springs.idx.shape[0] > 0
    has_offset_springs = (spec.offset_springs is not None
                          and len(spec.offset_springs.offsets) > 0)
    has_clusters = spec.clusters.member.shape[0] > 0 and spec.clusters.member.shape[1] > 0
    # zero-row global_rest = "no global cluster": the whole pass (einsum +
    # iterative polar decomposition) compiles away for granular/cloth scenes
    has_global = spec.global_rest.shape[0] > 0

    vel = p.vel + jnp.array([0.0, 1.0, 0.0]) * (prm.gravity * dt)
    vel = vel * jnp.maximum(0.0, 1.0 - prm.damping * dt)
    speed = jnp.linalg.norm(vel, axis=-1, keepdims=True)
    vel = vel * jnp.minimum(1.0, prm.max_speed / (speed + _EPS))
    vel = vel * mov
    pos_prev = p.pos
    pos = pos_prev + vel * dt
    pj_prev = pos_prev[nbr_idx] if mode == "sparse" else None
    fuse_shapes = mode == "block" and bool(n_shapes_active)
    shp = planes2d = shape_params = None
    if mode == "block":
        # substep-start position rows (pos_prev / friction reference) are
        # fixed across the solver iterations; refresh them once here
        rows_t, cols_t = update_contact_tables(*tables, pos_prev,
                                               pos_prev=pos_prev)
        if fuse_shapes:
            # pack this substep's shape table for the in-kernel stage
            # (_shape_stage): only the statically-known active slots
            a = n_shapes_active
            f32 = pos.dtype
            shp = jnp.concatenate([
                shapes.kind[:a, None].astype(f32),
                shapes.valid[:a, None].astype(f32),
                shapes.size[:a], s_pos[:a], s_quat[:a], s_vel[:a],
                jnp.zeros((a, 1), f32)], axis=1)
            if shapes.planes.shape[-2] > 0:
                planes2d = shapes.planes[:a].reshape(-1, 4)
            shape_params = (prm.collision_distance,
                            prm.shape_collision_margin,
                            prm.dynamic_friction, dt)

    def iter_body(_, carry):
        pos, cl_rot, gl_rot = carry
        if mode == "dense":
            # all-pairs Pallas tile sweep: no neighbor list, no gathers
            delta_c, cnt = dense_contact_deltas(
                pos, pos_prev, p.group, p.inv_mass, p.self_collide, p.active,
                spec.rest_pos, prm.solid_rest_distance, prm.particle_friction,
                prm.collide_filter_dist, interpret=interpret)
        elif mode == "block":
            # AABB-culled Pallas tile sweep: only spatially-near blocks pay.
            # Only the three current-position attribute rows change per
            # iteration; everything else rides the frame-packed tables.
            block_idx, block_cnt = blocks
            rows_i, cols_i = update_contact_tables(rows_t, cols_t, pos)
            delta_c, cnt = block_sparse_contact_deltas_packed(
                pos.shape[0], rows_i, cols_i, prm.solid_rest_distance,
                prm.particle_friction, prm.collide_filter_dist,
                block_idx, block_cnt, interpret=interpret,
                rest_filter=rest_filter, tile_j=tile_j,
                shp=shp, planes2d=planes2d, shape_params=shape_params)
        else:
            delta_c, cnt = _particle_contact_deltas(
                pos, pos_prev, nbr_idx, eligible, share,
                prm.solid_rest_distance, prm.particle_friction, pj_prev=pj_prev)
        delta = delta_c
        if not fuse_shapes:
            delta_k, cnt_k = shape_contact_deltas(
                pos, pos_prev, shapes, s_pos, s_quat, s_vel,
                prm.collision_distance, prm.shape_collision_margin,
                prm.dynamic_friction, dt)
            delta = delta + delta_k
            cnt = cnt + cnt_k
        if has_offset_springs:
            delta_o, cnt_o = _spring_deltas_offset(pos, p.inv_mass,
                                                   spec.offset_springs)
            delta = delta + delta_o
            cnt = cnt + cnt_o
        if has_springs:
            if spec.spring_inc is not None:
                delta_s, cnt_s = _spring_deltas_gather(
                    pos, p.inv_mass, spec.springs, spec.spring_inc)
            else:
                delta_s, cnt_s = _spring_deltas(pos, p.inv_mass, spec.springs)
            delta = delta + delta_s
            cnt = cnt + cnt_s
        if has_clusters:
            if spec.cluster_mm is not None and cluster_rest is None:
                delta_m, cnt_m, cl_rot = _cluster_deltas_matmul(
                    pos, spec.rest_pos, spec.clusters, cl_rot, spec.cluster_mm)
            elif spec.cluster_seg is not None and cluster_rest is None:
                delta_m, cnt_m, cl_rot = _cluster_deltas_segments(
                    pos, spec.rest_pos, spec.clusters, cl_rot, spec.cluster_seg)
            else:
                delta_m, cnt_m, cl_rot = _cluster_deltas(pos, spec.clusters, cl_rot,
                                                         rest=cluster_rest,
                                                         inc=spec.cluster_inc)
            delta = delta + delta_m
            cnt = cnt + cnt_m
        if has_global:
            delta_g, cnt_g, gl_rot = _global_cluster_deltas(
                pos, p.active, p.inv_mass, spec.global_rest, spec.global_stiffness,
                gl_rot)
            delta = delta + delta_g
            cnt = cnt + cnt_g
        pos = pos + prm.relaxation_factor * delta / jnp.maximum(cnt, 1.0)[:, None] * mov
        return pos, cl_rot, gl_rot

    pos, cluster_rot, global_rot = jax.lax.fori_loop(
        0, iterations, iter_body, (pos, cluster_rot, global_rot))

    if has_clusters and cluster_rest is not None:
        cluster_rest = _plastic_flow(pos, spec.clusters, cluster_rot, cluster_rest,
                                     prm.plastic_threshold, prm.plastic_creep)

    vel = (pos - pos_prev) / dt
    # dissipation: velocity loss proportional to contact count is approximated
    # as plain viscous loss here (granular scenes rely on friction+damping)
    vel = vel * jnp.maximum(0.0, 1.0 - prm.dissipation * dt)
    # sleeping: freeze particles moving slower than the threshold
    slow = jnp.linalg.norm(vel, axis=-1, keepdims=True) < prm.sleep_threshold
    pos = jnp.where(slow, pos_prev, pos)
    vel = jnp.where(slow, 0.0, vel)
    return p._replace(pos=pos, vel=vel), cluster_rot, global_rot, cluster_rest


@partial(jax.jit, static_argnames=("substeps", "iterations", "neighbor_k",
                                   "dense_contacts", "contact_mode",
                                   "rest_filter", "contact_tile_j",
                                   "n_shapes_active"))
def xpbd_step(state: SceneState, spec: SceneSpec, substeps: int, iterations: int,
              neighbor_k: int = 24, dense_contacts: bool | None = None,
              contact_mode: str | None = None,
              rest_filter: bool | None = None,
              contact_tile_j: int | None = None,
              n_shapes_active: int | None = None,
              packed_tables=None) -> SceneState:
    """One outer sim frame (dt = params.dt), matching pyflex.step semantics:
    kinematic shapes move from their prev pose to their current pose across
    the substeps; particles respond.

    contact_mode: 'dense' (all-pairs Pallas sweep), 'block' (AABB-culled
    Pallas tile sweep — the scalable default; relies on spatially coherent
    particle order, which scene builders produce), or 'sparse' (fixed-K
    neighbor-list gathers — the CPU-friendly fallback). None = auto.
    `dense_contacts` is the legacy boolean form of the same switch.

    Callers update shape targets via `state.shapes.moved_to(pos, quat)`
    before stepping (the analogue of pyflex.set_shape_states,
    pyflex.cpp:3187).

    rest_filter: static hint that some particle has the self-collide phase
    bit set (NvFlex eNvFlexPhaseSelfCollide + the rest-distance filter,
    eNvFlexPhaseSelfCollideFilter). Scenes where no particle self-collides
    (granular: one group per rigid granule) may pass False and the contact
    kernels drop the statically-dead rest-distance pair math (~45% of the
    detection stage's VPU ops). None = True (always-correct default)."""
    prm = spec.params
    dt_sub = prm.dt / substeps
    shapes = state.shapes
    s_vel = (shapes.pos - shapes.prev_pos) / prm.dt

    p0 = state.particles
    n = p0.pos.shape[0]
    if contact_mode is None:
        if dense_contacts is True:
            contact_mode = "dense"
        elif dense_contacts is False:
            contact_mode = "sparse"
        else:
            contact_mode = auto_contact_mode(n)
    interpret = jax.default_backend() == "cpu"
    rest_filter = True if rest_filter is None else rest_filter
    tj = contact_tile_j or auto_tile_j(n)
    nbr_idx = eligible = share = blocks = tables = None
    overflow = jnp.int32(0)
    if contact_mode == "block":
        # frame-constant attribute tables for the contact kernels: packed
        # ONCE here; substeps/iterations refresh only the position rows.
        # `packed_tables` (rollout_steps) hoists even that: the 13 attribute
        # rows are EPISODE-constant when nothing mutates inv_mass/active
        # mid-rollout, so a caller-packed table only needs its position
        # rows refreshed per frame (two (N, 3) transposes instead of the
        # full 7-DUS attribute pack + (16, N) relayout).
        if packed_tables is not None:
            tables = update_contact_tables(*packed_tables, p0.pos,
                                           pos_prev=p0.pos)
        else:
            tables = pack_contact_tables(
                p0.pos, p0.pos, p0.group, p0.inv_mass, p0.self_collide,
                p0.active, spec.rest_pos, tile_j=tj)
        # block structure ONCE per outer frame (like the NvFlex hash grid):
        # inflation radius*1.5 covers a frame of particle drift. The block
        # index table lives in SMEM inside the kernel; cap its width at
        # scale so (nb, maxb) stays within the ~64 KB budget that the
        # 16k/128-wide case measured as safe.
        nb_j = (n + tj - 1) // tj
        maxb = min(nb_j, 128 if nb_j <= 128 else 64)
        block_idx, block_cnt, overflow = tile_overlap_blocks(
            _pad_tile(p0.pos, tj), _pad_tile_mask(p0.active, tj),
            prm.radius * 1.5, max_blocks=maxb, tile_j=tj)
        # pair-level refinement ONCE per frame: keep only blocks holding an
        # eligible pair within a velocity-adaptive keep distance — the
        # NvFlexParams::particleCollisionMargin idea (NvFlex.h:146): the
        # neighbor radius is the contact distance plus a margin covering one
        # frame of drift. Settled scenes (vmax~0) prune nearly everything
        # (flat cloth's unfiltered 2-ring pairs sit at 1.11x rest_dist);
        # fast frames widen the margin, capped at the AABB inflation.
        # Shape velocity is included because grasp attachments teleport
        # particles with the tool without updating their stored velocity.
        # (Flex defaults particleCollisionMargin to 0 — neighbor find at
        # exactly `radius`, no drift margin, pyflex.cpp:700 — so the 2%
        # slack + velocity term here is strictly more conservative than the
        # reference. Gravity is excluded: it produces no RELATIVE approach
        # between free particles.)
        vmax_p = jnp.max(jnp.where(p0.active,
                                   jnp.linalg.norm(p0.vel, axis=-1), 0.0))
        vmax_s = jnp.max(jnp.linalg.norm(s_vel, axis=-1))
        vmax = jnp.maximum(vmax_p, vmax_s)
        keep_dist = jnp.clip(
            jnp.maximum(prm.radius, prm.solid_rest_distance) * 1.02
            + 2.0 * vmax * prm.dt,
            prm.solid_rest_distance * 1.02,
            jnp.maximum(prm.radius * 1.5, prm.solid_rest_distance * 1.05))
        block_idx, block_cnt = refine_overlap_blocks_packed(
            p0.pos.shape[0], *tables, keep_dist, prm.collide_filter_dist,
            block_idx, block_cnt, interpret=interpret,
            rest_filter=rest_filter, tile_j=tj)
        blocks = (block_idx, block_cnt)
    elif contact_mode == "sparse":
        # neighbor find ONCE per outer frame: dense masked top-k for tiny
        # scenes, hashed cell list at scale
        nfind = neighbor_list if n <= 1024 else cell_list_neighbors
        nbr_idx, nbr_valid = nfind(p0.pos, prm.radius * 1.5, p0.active, k=neighbor_k)
        eligible, share = precompute_contact_static(
            p0.inv_mass, p0.group, p0.self_collide, p0.active, nbr_idx, nbr_valid,
            rest_pos=spec.rest_pos, filter_dist=prm.collide_filter_dist)

    ts = (jnp.arange(substeps, dtype=jnp.float32) + 1.0) / substeps

    def sub(carry, t):
        particles, cl_rot, gl_rot, cl_rest = carry
        s_pos = shapes.prev_pos + (shapes.pos - shapes.prev_pos) * t
        s_quat = _nlerp(shapes.prev_quat, shapes.quat, t)
        particles, cl_rot, gl_rot, cl_rest = _substep(
            particles, cl_rot, gl_rot, spec, shapes, s_pos, s_quat, s_vel,
            nbr_idx, eligible, share, dt_sub, iterations,
            mode=contact_mode, interpret=interpret,
            cluster_rest=cl_rest, blocks=blocks, tables=tables,
            rest_filter=rest_filter, tile_j=tj,
            n_shapes_active=n_shapes_active)
        return (particles, cl_rot, gl_rot, cl_rest), None

    (particles, cl_rot, gl_rot, cl_rest), _ = jax.lax.scan(
        sub, (state.particles, state.cluster_rot, state.global_rot,
              state.cluster_rest), ts)
    return SceneState(particles=particles, shapes=shapes, cluster_rot=cl_rot,
                      global_rot=gl_rot, cluster_rest=cl_rest,
                      contact_overflow=jnp.asarray(
                          state.contact_overflow, jnp.int32) + overflow)


@partial(jax.jit, static_argnames=("substeps", "iterations", "neighbor_k",
                                   "record", "contact_mode", "rest_filter",
                                   "contact_tile_j", "n_shapes_active"))
def rollout_steps(state: SceneState, spec: SceneSpec, shape_pos_traj, shape_quat_traj,
                  substeps: int, iterations: int, neighbor_k: int = 24,
                  record: bool = True, contact_mode: str | None = None,
                  rest_filter: bool | None = None,
                  contact_tile_j: int | None = None,
                  n_shapes_active: int | None = None):
    """Scan a whole tool trajectory on device (T outer frames).

    shape_pos_traj: (T, M, 3), shape_quat_traj: (T, M, 4) — per-frame target
    poses for every kinematic shape. Returns (final_state, recorded particle
    positions (T, N, 3) if `record`). `contact_mode` forwards to xpbd_step
    (None = auto; 'sparse' avoids interpret-mode Pallas on CPU hosts).
    """

    # hoist the contact-table attribute pack out of the frame scan: nothing
    # in a pure shape-driven rollout mutates the 13 frame-constant rows
    # (group / inv_mass / phase / active / rest), so pack once and let each
    # frame refresh only the position rows (callers that DO mutate
    # inv_mass mid-scan — SimEnv grasp attachments — use xpbd_step's
    # per-frame pack instead)
    p = state.particles
    n = p.pos.shape[0]
    eff_mode = contact_mode
    if eff_mode is None:
        eff_mode = auto_contact_mode(n)
    tables0 = None
    if eff_mode == "block":
        tj = contact_tile_j or auto_tile_j(n)
        tables0 = pack_contact_tables(p.pos, p.pos, p.group, p.inv_mass,
                                      p.self_collide, p.active, spec.rest_pos,
                                      tile_j=tj)

    def body(st, tgt):
        pos_t, quat_t = tgt
        st = st._replace(shapes=st.shapes.moved_to(pos_t, quat_t))
        st = xpbd_step(st, spec, substeps, iterations, neighbor_k,
                       contact_mode=contact_mode, rest_filter=rest_filter,
                       contact_tile_j=contact_tile_j,
                       n_shapes_active=n_shapes_active,
                       packed_tables=tables0)
        out = st.particles.pos if record else None
        return st, out

    final, rec = jax.lax.scan(body, state, (shape_pos_traj, shape_quat_traj))
    return final, rec
