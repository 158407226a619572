"""Pallas TPU kernels for the solver hot loop.

`dense_contact_deltas` replaces the neighbor-list + gather contact pipeline
(engine/neighbors.py + solver._particle_contact_deltas) with an all-pairs
TILED sweep: the grid walks (row-tile, col-tile) pairs; each invocation
broadcasts a (TILE, 1) column of row-particle coordinates against a
(1, TILE) row of col-particle coordinates on the VPU — no sorting, no
top_k, no dynamic gathers, and the contact radius test happens inline.
Corrections for a row tile accumulate across the col-tile grid dimension
into a revisited output block (the standard reduction-grid pattern).

Particle data is packed in two layouts so both broadcast orientations are
natural tile loads:
  * cols:  (16, N)  — attribute rows, lane-major over particles;
  * rows:  (N, 16)  — the transpose, sublane-major.
Attribute rows: 0-2 pos, 3-5 pos_prev, 6 group, 7 inv_mass,
8 self_collide, 9-11 rest_pos, 12 active.

At 5k particles this is ~25M pairs x ~40 VPU flops per solver iteration —
about 1 GFLOP, microseconds of VPU time — versus milliseconds of
top_k + gather traffic for the sparse formulation. Cost grows O(N^2), so
the sparse path remains the fallback above `DENSE_CONTACT_MAX_N`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128          # row-tile (sublane-major)
TILE_J = 512        # col-tile: wider lanes amortize grid-step overhead
DENSE_CONTACT_MAX_N = 8192
_EPS = 1e-9


def _contact_kernel(scal_ref, rows_ref, cols_ref, out_ref):
    """One (row-tile i, col-tile j) pair.

    scal_ref: (1, 4) SMEM [rest_dist, particle_friction, filter_dist, n]
    rows_ref: (TILE, 16) row-particle attributes (sublane-major)
    cols_ref: (16, TILE_J) col-particle attributes (lane-major)
    out_ref:  (TILE, 8) accumulated [delta_xyz, count, 0...] for row tile i
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    rest_dist = scal_ref[0, 0]
    friction = scal_ref[0, 1]
    filter_dist = scal_ref[0, 2]

    acc = _pair_block(rows_ref[:], cols_ref[:], i * TILE, j * TILE_J,
                      rest_dist, friction, filter_dist)
    block = jnp.concatenate([acc, jnp.zeros((TILE, 4), jnp.float32)], axis=1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = block

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + block


def _pack(pos, pos_prev, group, inv_mass, self_collide, active, rest_pos, n_pad):
    n = pos.shape[0]
    cols = jnp.zeros((16, n_pad), dtype=jnp.float32)
    cols = cols.at[0:3, :n].set(pos.T)
    cols = cols.at[3:6, :n].set(pos_prev.T)
    cols = cols.at[6, :n].set(group.astype(jnp.float32))
    cols = cols.at[7, :n].set(inv_mass)
    cols = cols.at[8, :n].set(self_collide.astype(jnp.float32))
    cols = cols.at[9:12, :n].set(rest_pos.T)
    cols = cols.at[12, :n].set(active.astype(jnp.float32))
    return cols


def _pair_block(r, c, i_row0, j_col0, rest_dist, friction, filter_dist):
    """Contact corrections of one (TILE, TJ) particle-pair block.

    r: (TILE, 16) row attrs, c: (16, TJ) col attrs; i_row0/j_col0 absolute
    particle offsets of the block. Returns (TILE, 4) [delta_xyz, count]."""
    xi, yi, zi = r[:, 0:1], r[:, 1:2], r[:, 2:3]
    xj, yj, zj = c[0:1, :], c[1:2, :], c[2:3, :]
    dx = xi - xj
    dy = yi - yj
    dz = zi - zj
    d2 = dx * dx + dy * dy + dz * dz
    # rsqrt-only distance math: sqrt+div chains run at a fraction of VPU
    # rate and dominated the pair cost
    inv_dist = jax.lax.rsqrt(d2 + _EPS)
    dist = d2 * inv_dist
    overlap = rest_dist - dist

    gi, gj = r[:, 6:7], c[6:7, :]
    sci, scj = r[:, 8:9], c[8:9, :]
    wi, wj = r[:, 7:8], c[7:8, :]
    ai, aj = r[:, 12:13], c[12:13, :]
    same_group = jnp.abs(gi - gj) < 0.5
    pair_sc = (sci > 0.5) & (scj > 0.5)
    rdx = r[:, 9:10] - c[9:10, :]
    rdy = r[:, 10:11] - c[10:11, :]
    rdz = r[:, 11:12] - c[11:12, :]
    rest_near = rdx * rdx + rdy * rdy + rdz * rdz < filter_dist * filter_dist
    collide = (~same_group) | (pair_sc & ~rest_near)

    # d2 > tiny doubles as the self-pair exclusion (identical formulation
    # to the block-sparse kernel so the two paths agree bit-for-bit)
    wsum = wi + wj
    contact = ((d2 < rest_dist * rest_dist) & (d2 > 1e-14) & collide
               & (wsum > 0.0) & (ai > 0.5) & (aj > 0.5))
    share = wi * pl.reciprocal(wsum + _EPS, approx=False)
    cf = jnp.where(contact, 1.0, 0.0)
    mag = share * overlap * inv_dist * cf

    mx = (xi - r[:, 3:4]) - (xj - c[3:4, :])
    my = (yi - r[:, 4:5]) - (yj - c[4:5, :])
    mz = (zi - r[:, 5:6]) - (zj - c[5:6, :])
    rel_n = (mx * dx + my * dy + mz * dz) * (inv_dist * inv_dist)
    tx = mx - rel_n * dx
    ty = my - rel_n * dy
    tz = mz - rel_n * dz
    inv_tnorm = jax.lax.rsqrt(tx * tx + ty * ty + tz * tz + _EPS)
    max_slide = jnp.maximum(friction * overlap, 0.0)
    fscale = jnp.minimum(1.0, max_slide * inv_tnorm) * share * cf

    ddx = jnp.sum(dx * mag - tx * fscale, axis=1)
    ddy = jnp.sum(dy * mag - ty * fscale, axis=1)
    ddz = jnp.sum(dz * mag - tz * fscale, axis=1)
    cnt = jnp.sum(cf, axis=1)
    return jnp.stack([ddx, ddy, ddz, cnt], axis=1)  # (TILE, 4)


def _shape_stage(shp_ref, planes_ref, c_i, n_shapes: int, n_planes: int,
                 cd, margin, dyn_friction, dt):
    """Fused kinematic-shape contact stage for one row tile, LANE-MAJOR.

    Identical math to collisions.shape_contact_deltas (parity-tested), but
    computed on (1, tile) lane vectors inside the sweep kernel — the XLA
    pass pays the (N, 3) lane-3->128 padding tax on ~15 ops every solver
    iteration; here each op is one full vreg row and the whole stage is a
    few hundred VPU ops per row tile.

    shp_ref: SMEM (M, 16) f32 [kind, valid, size012, pos012, quat0123,
    vel012, 0]; planes_ref: SMEM (M*P, 4) local halfspaces (None if P==0);
    c_i: (16, tile) this row tile's lane-major attribute columns.
    Returns (ax, ay, az, cnt) each (1, tile).
    """
    from adaptigraph_tpu.engine.state import (
        SHAPE_BOX as _B, SHAPE_CAPSULE as _C, SHAPE_CONVEX as _X)

    px, py, pz = c_i[0:1, :], c_i[1:2, :], c_i[2:3, :]
    ux = px - c_i[3:4, :]
    uy = py - c_i[4:5, :]
    uz = pz - c_i[5:6, :]
    zero = jnp.zeros_like(px)
    ax = ay = az = cnt = zero
    for m in range(n_shapes):
        kind = shp_ref[m, 0]
        valid = shp_ref[m, 1]
        hx, hy, hz = shp_ref[m, 2], shp_ref[m, 3], shp_ref[m, 4]
        sx, sy, sz = shp_ref[m, 5], shp_ref[m, 6], shp_ref[m, 7]
        qx_, qy_, qz_, qw_ = (shp_ref[m, 8], shp_ref[m, 9], shp_ref[m, 10],
                              shp_ref[m, 11])
        vx, vy, vz = shp_ref[m, 12], shp_ref[m, 13], shp_ref[m, 14]
        # rotation matrix R from the quaternion; world->local uses R^T
        r00 = 1 - 2 * (qy_ * qy_ + qz_ * qz_)
        r01 = 2 * (qx_ * qy_ - qz_ * qw_)
        r02 = 2 * (qx_ * qz_ + qy_ * qw_)
        r10 = 2 * (qx_ * qy_ + qz_ * qw_)
        r11 = 1 - 2 * (qx_ * qx_ + qz_ * qz_)
        r12 = 2 * (qy_ * qz_ - qx_ * qw_)
        r20 = 2 * (qx_ * qz_ - qy_ * qw_)
        r21 = 2 * (qy_ * qz_ + qx_ * qw_)
        r22 = 1 - 2 * (qx_ * qx_ + qy_ * qy_)
        wx, wy, wz = px - sx, py - sy, pz - sz
        qxp = r00 * wx + r10 * wy + r20 * wz
        qyp = r01 * wx + r11 * wy + r21 * wz
        qzp = r02 * wx + r12 * wy + r22 * wz

        # ---- box ----
        dxb = jnp.abs(qxp) - hx
        dyb = jnp.abs(qyp) - hy
        dzb = jnp.abs(qzp) - hz
        ox = jnp.maximum(dxb, 0.0)
        oy = jnp.maximum(dyb, 0.0)
        oz = jnp.maximum(dzb, 0.0)
        d2o = ox * ox + oy * oy + oz * oz
        inv_out = jax.lax.rsqrt(d2o + _EPS * _EPS)
        dist_out = d2o * inv_out
        max_d = jnp.maximum(dxb, jnp.maximum(dyb, dzb))
        sd_box = dist_out + jnp.minimum(max_d, 0.0)
        nbx_o = ox * jnp.sign(qxp) * inv_out
        nby_o = oy * jnp.sign(qyp) * inv_out
        nbz_o = oz * jnp.sign(qzp) * inv_out
        # inside: face of least penetration, first-axis ties like argmax
        is_x = (dxb >= dyb) & (dxb >= dzb)
        is_y = (~is_x) & (dyb >= dzb)
        is_z = ~(is_x | is_y)
        nbx_i = jnp.where(is_x, jnp.sign(qxp), 0.0)
        nby_i = jnp.where(is_y, jnp.sign(qyp), 0.0)
        nbz_i = jnp.where(is_z, jnp.sign(qzp), 0.0)
        out_side = max_d > 0.0
        nbx = jnp.where(out_side, nbx_o, nbx_i)
        nby = jnp.where(out_side, nby_o, nby_i)
        nbz = jnp.where(out_side, nbz_o, nbz_i)

        # ---- capsule (axis +x; size = radius, half_len, _) ----
        a_c = jnp.clip(qxp, -hy, hy)  # hy slot = half_len
        cdx = qxp - a_c
        d2c = cdx * cdx + qyp * qyp + qzp * qzp
        inv_dc = jax.lax.rsqrt(d2c + _EPS * _EPS)
        sd_cap = d2c * inv_dc - hx  # hx slot = radius
        ncx = cdx * inv_dc
        ncy = qyp * inv_dc
        ncz = qzp * inv_dc

        # ---- plane (local y-up) ----
        is_box = kind == float(_B)
        is_cap = kind == float(_C)
        sd = jnp.where(is_box, sd_box, jnp.where(is_cap, sd_cap, qyp))
        nlx = jnp.where(is_box, nbx, jnp.where(is_cap, ncx, 0.0))
        nly = jnp.where(is_box, nby, jnp.where(is_cap, ncy, 1.0))
        nlz = jnp.where(is_box, nbz, jnp.where(is_cap, ncz, 0.0))

        if n_planes > 0:
            # ---- convex polytope: running max over halfspaces ----
            sd_cx = jnp.full_like(px, -3e37)
            nxx = nxy = nxz = zero
            any_valid = False
            for p_i in range(n_planes):
                n0 = planes_ref[m * n_planes + p_i, 0]
                n1 = planes_ref[m * n_planes + p_i, 1]
                n2 = planes_ref[m * n_planes + p_i, 2]
                pd = planes_ref[m * n_planes + p_i, 3]
                pv = n0 * n0 + n1 * n1 + n2 * n2 > 0.25
                sp = qxp * n0 + qyp * n1 + qzp * n2 - pd
                sp = jnp.where(pv, sp, -3e37)
                take = sp > sd_cx  # strict: first max wins ties, like argmax
                sd_cx = jnp.where(take, sp, sd_cx)
                nxx = jnp.where(take, n0, nxx)
                nxy = jnp.where(take, n1, nxy)
                nxz = jnp.where(take, n2, nxz)
                any_valid = jnp.logical_or(any_valid, pv)
            sd_cx = jnp.where(any_valid, sd_cx, 3e37)
            is_cx = kind == float(_X)
            sd = jnp.where(is_cx, sd_cx, sd)
            nlx = jnp.where(is_cx, nxx, nlx)
            nly = jnp.where(is_cx, nxy, nly)
            nlz = jnp.where(is_cx, nxz, nlz)

        # local->world normal (R @ n)
        nwx = r00 * nlx + r01 * nly + r02 * nlz
        nwy = r10 * nlx + r11 * nly + r12 * nlz
        nwz = r20 * nlx + r21 * nly + r22 * nlz

        pen = cd - sd
        cf = jnp.where((pen > 0.0) & (valid > 0.5), 1.0, 0.0)
        # Coulomb friction on the tangential relative displacement
        rx = ux - vx * dt
        ry = uy - vy * dt
        rz = uz - vz * dt
        rel_n = rx * nwx + ry * nwy + rz * nwz
        tx = rx - nwx * rel_n
        ty = ry - nwy * rel_n
        tz = rz - nwz * rel_n
        t2 = tx * tx + ty * ty + tz * tz
        inv_t = jax.lax.rsqrt(t2 + _EPS * _EPS)
        t_norm = t2 * inv_t
        max_slide = dyn_friction * jnp.abs(pen)
        scale = jnp.minimum(1.0, max_slide / (t_norm + _EPS)) * cf
        ax = ax + nwx * (pen * cf) - tx * scale
        ay = ay + nwy * (pen * cf) - ty * scale
        az = az + nwz * (pen * cf) - tz * scale
        cnt = cnt + cf
    return ax, ay, az, cnt


def _make_block_sparse_kernel(tile: int, rest_filter: bool = True,
                              tile_j: int | None = None, n_shapes: int = 0,
                              n_planes: int = 0):
    tile_j = tile_j or tile

    def kernel(scal_ref, cnt_ref, idx_ref, *rest):
        """One row tile i: loop only its AABB-overlapping col blocks.

        scal_ref: (1, 8) SMEM [rest_dist, friction, filter_dist, n, cd,
                  margin, dyn_friction, dt]
        cnt_ref:  (nb, 1) SMEM whole array — overlapping col-block counts
        idx_ref:  (nb, MAXB) SMEM whole array int32 — their block indices
        rows_ref: (tile, 16) row-particle attributes
        cols_ref: (16, N_pad) the FULL lane-major attribute array (VMEM)
        out_ref:  (tile, 8) [delta_xyz, count, 0...]

        With n_shapes > 0 the kinematic-shape contact stage is FUSED in:
        extra SMEM inputs shp_ref (M, 16) [+ planes_ref (M*P, 4)] and a
        second lane-major output out2_ref (8, tile) carrying this row
        tile's [shape_delta_xyz, shape_count] rows (see _shape_stage).

        Two-stage pair math: a ~20-op detection stage (distance + pair
        eligibility) runs on every block; the ~60-op projection/friction
        stage runs under lax.cond only when the block has at least one
        actual contact. AABB culling admits blocks that are NEAR; in the
        sparse-contact regimes (rope at rest spacing > rest_dist after the
        self-collide filter, flat cloth) almost no admitted block has a
        true contact, so the cold path dominates.
        """
        if n_shapes > 0:
            if n_planes > 0:
                shp_ref, planes_ref, rows_ref, cols_ref, out_ref, out2_ref = rest
            else:
                shp_ref, rows_ref, cols_ref, out_ref, out2_ref = rest
                planes_ref = None
        else:
            rows_ref, cols_ref, out_ref = rest
        i = pl.program_id(0)
        rest_dist = scal_ref[0, 0]
        friction = scal_ref[0, 1]
        filter_dist = scal_ref[0, 2]
        r = rows_ref[:]
        xi, yi, zi = r[:, 0:1], r[:, 1:2], r[:, 2:3]

        def body(k, acc):
            j = idx_ref[i, k]
            c = cols_ref[:, pl.ds(pl.multiple_of(j * tile_j, tile_j), tile_j)]
            # ---- stage 1: detection ----
            dx = xi - c[0:1, :]
            dy = yi - c[1:2, :]
            dz = zi - c[2:3, :]
            d2 = dx * dx + dy * dy + dz * dz
            same_group = jnp.abs(r[:, 6:7] - c[6:7, :]) < 0.5
            if rest_filter:
                pair_sc = (r[:, 8:9] > 0.5) & (c[8:9, :] > 0.5)
                rdx = r[:, 9:10] - c[9:10, :]
                rdy = r[:, 10:11] - c[10:11, :]
                rdz = r[:, 11:12] - c[11:12, :]
                rest_near = (rdx * rdx + rdy * rdy + rdz * rdz
                             < filter_dist * filter_dist)
                collide = (~same_group) | (pair_sc & ~rest_near)
            else:
                # no particle has self-collide set (e.g. granular: each
                # rigid granule is its own group): the rest-distance filter
                # is statically dead and detection drops ~45% of its VPU ops
                collide = ~same_group
            # d2 > tiny doubles as the self-pair exclusion (and coincident
            # distinct particles produce ~zero delta anyway)
            contact = ((d2 < rest_dist * rest_dist) & (d2 > 1e-14) & collide
                       & (r[:, 12:13] > 0.5) & (c[12:13, :] > 0.5))

            def full(_):
                wi, wj = r[:, 7:8], c[7:8, :]
                wsum = wi + wj
                cf = jnp.where(contact & (wsum > 0.0), 1.0, 0.0)
                inv_dist = jax.lax.rsqrt(d2 + _EPS)
                dist = d2 * inv_dist
                overlap = rest_dist - dist
                share = wi * pl.reciprocal(wsum + _EPS, approx=False)
                mag = share * overlap * inv_dist * cf
                mx = (xi - r[:, 3:4]) - (c[0:1, :] - c[3:4, :])
                my = (yi - r[:, 4:5]) - (c[1:2, :] - c[4:5, :])
                mz = (zi - r[:, 5:6]) - (c[2:3, :] - c[5:6, :])
                rel_n = (mx * dx + my * dy + mz * dz) * (inv_dist * inv_dist)
                tx = mx - rel_n * dx
                ty = my - rel_n * dy
                tz = mz - rel_n * dz
                inv_tnorm = jax.lax.rsqrt(tx * tx + ty * ty + tz * tz + _EPS)
                max_slide = jnp.maximum(friction * overlap, 0.0)
                fscale = jnp.minimum(1.0, max_slide * inv_tnorm) * share * cf
                ddx = jnp.sum(dx * mag - tx * fscale, axis=1)
                ddy = jnp.sum(dy * mag - ty * fscale, axis=1)
                ddz = jnp.sum(dz * mag - tz * fscale, axis=1)
                return jnp.stack([ddx, ddy, ddz, jnp.sum(cf, axis=1)], axis=1)

            contrib = jax.lax.cond(
                jnp.any(contact), full,
                lambda _: jnp.zeros((tile, 4), jnp.float32), 0)
            return acc + contrib

        acc = jax.lax.fori_loop(0, cnt_ref[i, 0],
                                body, jnp.zeros((tile, 4), jnp.float32))
        out_ref[:] = jnp.concatenate([acc, jnp.zeros((tile, 4), jnp.float32)],
                                     axis=1)

        if n_shapes > 0:
            cd = scal_ref[0, 4]
            margin = scal_ref[0, 5]
            dyn_friction = scal_ref[0, 6]
            dt = scal_ref[0, 7]
            # this row tile's lane-major attribute columns
            c_i = cols_ref[:, pl.ds(pl.multiple_of(i * tile, tile), tile)]
            ax, ay, az, scnt = _shape_stage(shp_ref, planes_ref, c_i,
                                            n_shapes, n_planes, cd, margin,
                                            dyn_friction, dt)
            out2_ref[:] = jnp.concatenate(
                [ax, ay, az, scnt, jnp.zeros((4, tile), jnp.float32)], axis=0)

    return kernel


def _make_refine_kernel(tile: int, rest_filter: bool = True,
                        tile_j: int | None = None):
    tile_j = tile_j or tile

    def kernel(scal_ref, cnt_ref, idx_ref, rows_ref, cols_ref, out_ref):
        """Pair-level refinement of one row tile's AABB-admitted col blocks.

        Runs the detection stage of the block-sparse sweep ONCE with the
        inflated keep distance and flags which admitted blocks contain at
        least one ELIGIBLE near pair (distance + group/self-collide/rest
        filter + inv-mass + active — identical eligibility math to the
        sweep kernel). Blocks with no such pair produce exactly zero in the
        per-iteration sweep, so dropping them is lossless up to the
        per-frame drift assumption shared with tile_overlap_blocks (NvFlex
        finds neighbors once per NvFlexUpdateSolver frame the same way).

        scal_ref: (1, 4) SMEM [keep_dist, _, filter_dist, n]
        cnt_ref:  (nb, 1) SMEM; idx_ref: (nb, MAXB) SMEM
        rows_ref: (tile, 16); cols_ref: (16, N_pad)
        out_ref:  (8, MAXB_pad) f32 — 1.0 where slot k's block survives
        (8 identical sublane rows: Mosaic requires sublane blocks of 8)
        """
        i = pl.program_id(0)
        keep_dist = scal_ref[0, 0]
        filter_dist = scal_ref[0, 2]
        r = rows_ref[:]
        xi, yi, zi = r[:, 0:1], r[:, 1:2], r[:, 2:3]
        maxb = out_ref.shape[1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, maxb), 1)

        def body(k, flags):
            j = idx_ref[i, k]
            c = cols_ref[:, pl.ds(pl.multiple_of(j * tile_j, tile_j), tile_j)]
            dx = xi - c[0:1, :]
            dy = yi - c[1:2, :]
            dz = zi - c[2:3, :]
            d2 = dx * dx + dy * dy + dz * dz
            same_group = jnp.abs(r[:, 6:7] - c[6:7, :]) < 0.5
            if rest_filter:
                pair_sc = (r[:, 8:9] > 0.5) & (c[8:9, :] > 0.5)
                rdx = r[:, 9:10] - c[9:10, :]
                rdy = r[:, 10:11] - c[10:11, :]
                rdz = r[:, 11:12] - c[11:12, :]
                rest_near = (rdx * rdx + rdy * rdy + rdz * rdz
                             < filter_dist * filter_dist)
                collide = (~same_group) | (pair_sc & ~rest_near)
            else:
                collide = ~same_group
            wsum = r[:, 7:8] + c[7:8, :]
            near = ((d2 < keep_dist * keep_dist) & (d2 > 1e-14) & collide
                    & (wsum > 0.0)
                    & (r[:, 12:13] > 0.5) & (c[12:13, :] > 0.5))
            flag = jnp.where(jnp.any(near), 1.0, 0.0)
            return jnp.where(lane == k, flag, flags)

        flags = jax.lax.fori_loop(0, cnt_ref[i, 0], body,
                                  jnp.zeros((1, maxb), jnp.float32))
        out_ref[:] = jnp.broadcast_to(flags, out_ref.shape)

    return kernel


@partial(jax.jit, static_argnames=("interpret", "tile", "rest_filter",
                                   "tile_j"))
def refine_overlap_blocks(pos, pos_prev, group, inv_mass, self_collide, active,
                          rest_pos, keep_dist, filter_dist, block_idx,
                          block_cnt, interpret: bool = False, tile: int = TILE,
                          rest_filter: bool = True,
                          tile_j: int | None = None):
    """Shrink tile_overlap_blocks' AABB-admitted lists to blocks holding an
    eligible pair within `keep_dist` (computed once per frame; the solver
    iterations then sweep only these). Returns (block_idx, block_cnt) in
    the same layout; counts only ever shrink, so no new overflow."""
    rows, cols = pack_contact_tables(pos, pos_prev, group, inv_mass,
                                     self_collide, active, rest_pos, tile=tile,
                                     tile_j=tile_j)
    return refine_overlap_blocks_packed(pos.shape[0], rows, cols, keep_dist,
                                        filter_dist, block_idx, block_cnt,
                                        interpret=interpret, tile=tile,
                                        rest_filter=rest_filter, tile_j=tile_j)


@partial(jax.jit, static_argnames=("n", "interpret", "tile", "rest_filter",
                                   "tile_j"))
def refine_overlap_blocks_packed(n: int, rows, cols, keep_dist, filter_dist,
                                 block_idx, block_cnt,
                                 interpret: bool = False, tile: int = TILE,
                                 rest_filter: bool = True,
                                 tile_j: int | None = None):
    """refine_overlap_blocks over prepacked attribute tables. `tile_j` is
    the col-block width (a multiple of `tile`; block_idx/block_cnt must
    come from tile_overlap_blocks with the same tile_j)."""
    tile_j = tile_j or tile
    n_pad = cols.shape[1]
    assert n_pad % tile_j == 0, (n_pad, tile_j)
    scal = jnp.array([[keep_dist, 0.0, filter_dist, float(n)]],
                     dtype=jnp.float32)
    nb = n_pad // tile
    maxb = block_idx.shape[1]
    # flags lane dim must be a multiple of 128 for the Mosaic output tiling;
    # only the first maxb lanes are ever written (slot k < cnt <= maxb)
    maxb_pad = -(-maxb // 128) * 128
    cnt2d = block_cnt.reshape(nb, 1).astype(jnp.int32)

    flags = pl.pallas_call(
        _make_refine_kernel(tile, rest_filter, tile_j),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, maxb_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * 8, maxb_pad), jnp.float32),
        interpret=interpret,
    )(scal, cnt2d, block_idx, rows, cols)
    flags = flags.reshape(nb, 8, maxb_pad)[:, 0, :maxb]
    # compact surviving slots to the front (top_k over 1/0 scores is stable,
    # preserving the original near-diagonal-first slot order)
    _, kk = jax.lax.top_k(flags, maxb)
    new_idx = jnp.take_along_axis(block_idx, kk, axis=1)
    new_cnt = jnp.sum(flags > 0.5, axis=1).astype(jnp.int32)
    return new_idx, new_cnt


def tile_overlap_blocks(pos, active, inflate, tile: int = TILE,
                        max_blocks: int | None = None,
                        tile_j: int | None = None):
    """Per-row-tile lists of col blocks whose inflated AABBs intersect.

    The solver's contact sweep only needs particle pairs closer than the
    search radius; with spatially coherent particle ordering (scene builders
    emit chains/grids; see morton_order for arbitrary clouds) most tile
    pairs are provably far apart and their O(TILE*TILE_J) pair math is
    skipped. Row AABBs are at `tile` granularity; col AABBs at `tile_j`
    (a multiple of `tile`, default = tile) — wider col blocks admit a
    coarser superset of pairs but cut the sweep kernel's per-block loop
    overhead proportionally.

    `pos` must be padded to a multiple of max(tile, tile_j) with
    active=False padding rows.

    Returns (block_idx (nb_rows, MAXB) int32 indices into the nb_cols
             col-block space, block_cnt (nb_rows,) int32,
             overflow int32 — number of overlapping blocks dropped by the
             MAXB cap; keep 0 by sizing max_blocks).
    """
    tile_j = tile_j or tile
    n = pos.shape[0]
    nb_i = n // tile
    nb_j = n // tile_j
    big = jnp.float32(3e37)
    p_lo = jnp.where(active[:, None], pos, big)  # inactive never overlap
    p_hi = jnp.where(active[:, None], pos, -big)
    lo_i = jnp.min(p_lo.reshape(nb_i, tile, 3), axis=1)
    hi_i = jnp.max(p_hi.reshape(nb_i, tile, 3), axis=1)
    lo_j = jnp.min(p_lo.reshape(nb_j, tile_j, 3), axis=1)
    hi_j = jnp.max(p_hi.reshape(nb_j, tile_j, 3), axis=1)
    # intersect test with symmetric inflation
    sep = (lo_i[:, None, :] > hi_j[None, :, :] + inflate) | \
          (lo_j[None, :, :] > hi_i[:, None, :] + inflate)
    overlap = ~jnp.any(sep, axis=-1)  # (nb_i, nb_j) bool
    maxb = max_blocks or min(nb_j, 128)
    # overlapping blocks first (scores 1), stable padding with zeros after
    score = overlap.astype(jnp.float32)
    _, idx = jax.lax.top_k(score, maxb)
    cnt = jnp.minimum(jnp.sum(overlap, axis=1), maxb).astype(jnp.int32)
    overflow = jnp.sum(jnp.maximum(jnp.sum(overlap, axis=1) - maxb, 0))
    return idx.astype(jnp.int32), cnt, overflow.astype(jnp.int32)


def pack_contact_tables(pos, pos_prev, group, inv_mass, self_collide, active,
                        rest_pos, tile: int = TILE, tile_j: int | None = None):
    """Build the (rows (N_pad, 16), cols (16, N_pad)) attribute tables the
    block-sparse sweep reads. 13 of the 16 attribute rows are FRAME-constant
    (group/mass/phase/rest/active) and pos_prev is SUBSTEP-constant, so the
    solver packs once per frame and per-iteration updates touch only the
    three position rows (update_contact_tables) — the full 7-DUS pack + the
    (16, N) transpose measured as the bulk of the per-iteration contact cost
    at the rope design point."""
    t = max(tile, tile_j or tile)
    n_pad = -(-pos.shape[0] // t) * t
    cols = _pack(pos, pos_prev, group, inv_mass, self_collide, active, rest_pos,
                 n_pad)
    return cols.T, cols


def update_contact_tables(rows, cols, pos, pos_prev=None):
    """Refresh the position rows of prepacked contact tables. `pos` updates
    attribute rows 0-2 every solver iteration; `pos_prev` (rows 3-5) only at
    substep starts. The rows-table update is layout-aligned ((N, 3) into
    (N_pad, 16) minor columns — no relayout); the cols update pays the one
    unavoidable (N, 3) -> (3, N) transpose."""
    n = pos.shape[0]
    rows = rows.at[:n, 0:3].set(pos)
    cols = cols.at[0:3, :n].set(pos.T)
    if pos_prev is not None:
        rows = rows.at[:n, 3:6].set(pos_prev)
        cols = cols.at[3:6, :n].set(pos_prev.T)
    return rows, cols


@partial(jax.jit, static_argnames=("interpret", "tile", "rest_filter",
                                   "tile_j"))
def block_sparse_contact_deltas(pos, pos_prev, group, inv_mass, self_collide,
                                active, rest_pos, rest_dist, particle_friction,
                                filter_dist, block_idx, block_cnt,
                                interpret: bool = False, tile: int = TILE,
                                rest_filter: bool = True,
                                tile_j: int | None = None):
    """All-pairs contact corrections restricted to AABB-overlapping tile
    blocks (the scalable O(N·K_blocks) path; same contract as
    dense_contact_deltas). block_idx/block_cnt come from
    tile_overlap_blocks(tile=same tile), computed once per frame."""
    rows, cols = pack_contact_tables(pos, pos_prev, group, inv_mass,
                                     self_collide, active, rest_pos, tile=tile,
                                     tile_j=tile_j)
    return block_sparse_contact_deltas_packed(
        pos.shape[0], rows, cols, rest_dist, particle_friction, filter_dist,
        block_idx, block_cnt, interpret=interpret, tile=tile,
        rest_filter=rest_filter, tile_j=tile_j)


@partial(jax.jit, static_argnames=("n", "interpret", "tile", "rest_filter",
                                   "tile_j"))
def block_sparse_contact_deltas_packed(n: int, rows, cols, rest_dist,
                                       particle_friction, filter_dist,
                                       block_idx, block_cnt,
                                       interpret: bool = False,
                                       tile: int = TILE,
                                       rest_filter: bool = True,
                                       tile_j: int | None = None,
                                       shp=None, planes2d=None,
                                       shape_params=None):
    """Block-sparse contact sweep over prepacked attribute tables (see
    pack_contact_tables). Returns (delta (n, 3), count (n,)).

    tile_j: col-block width, a multiple of `tile` (default = tile). The
    fori_loop's per-block overhead (dynamic VMEM slice + bounds + cond)
    dominates over pair math at ~10% VPU utilization, so wider col blocks
    trade near-free extra pair lanes for 2-4x fewer loop trips.

    Fused kinematic-shape contacts: pass shp (M_active, 16) f32 rows
    [kind, valid, size012, pos012, quat0123(xyzw), vel012, 0], optional
    planes2d (M_active*P, 4) local halfspaces, and shape_params =
    (collision_distance, margin, dynamic_friction, dt). The returned
    delta/count then INCLUDE the shape-contact corrections — the separate
    lane-3-padded XLA shape pass (collisions.shape_contact_deltas) is
    replaced by a lane-major in-kernel stage (see _shape_stage)."""
    tile_j = tile_j or tile
    n_pad = cols.shape[1]
    assert n_pad % tile_j == 0, (n_pad, tile_j)
    fuse = shp is not None
    n_shapes = shp.shape[0] if fuse else 0
    n_planes = (planes2d.shape[0] // max(n_shapes, 1)
                if (fuse and planes2d is not None) else 0)
    cd, margin, dyn_friction, dt = (shape_params if fuse
                                    else (0.0, 0.0, 0.0, 0.0))
    scal = jnp.stack([jnp.asarray(v, jnp.float32) for v in
                      (rest_dist, particle_friction, filter_dist, float(n),
                       cd, margin, dyn_friction, dt)]).reshape(1, 8)
    nb = n_pad // tile
    cnt2d = block_cnt.reshape(nb, 1).astype(jnp.int32)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [pl.BlockSpec((1, 8), lambda i: (0, 0),
                             memory_space=pltpu.SMEM), smem, smem]
    args = [scal, cnt2d, block_idx]
    if fuse:
        in_specs.append(smem)
        args.append(shp.astype(jnp.float32))
        if n_planes > 0:
            in_specs.append(smem)
            args.append(planes2d.astype(jnp.float32))
    in_specs += [
        pl.BlockSpec((tile, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((16, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args += [rows, cols]

    out_specs = pl.BlockSpec((tile, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_pad, 8), jnp.float32)
    if fuse:
        out_specs = [out_specs, pl.BlockSpec((8, tile), lambda i: (0, i),
                                             memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((8, n_pad), jnp.float32)]

    out = pl.pallas_call(
        _make_block_sparse_kernel(tile, rest_filter, tile_j, n_shapes,
                                  n_planes),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    if fuse:
        out, out2 = out
        delta = out[:n, :3] + out2[0:3, :n].T
        return delta, out[:n, 3] + out2[3, :n]
    return out[:n, :3], out[:n, 3]


@partial(jax.jit, static_argnames=("interpret",))
def dense_contact_deltas(pos, pos_prev, group, inv_mass, self_collide, active,
                         rest_pos, rest_dist, particle_friction, filter_dist,
                         interpret: bool = False):
    """All-pairs particle contact corrections.

    Same contract as solver._particle_contact_deltas but with no neighbor
    list: returns (delta (N, 3), count (N,)).
    """
    n = pos.shape[0]
    lcm = TILE if TILE % TILE_J == 0 else (TILE_J if TILE_J % TILE == 0
                                           else TILE * TILE_J)
    n_pad = -(-n // lcm) * lcm
    cols = _pack(pos, pos_prev, group, inv_mass, self_collide, active, rest_pos,
                 n_pad)
    rows = cols.T  # (n_pad, 16)
    scal = jnp.array([[rest_dist, particle_friction, filter_dist, float(n)]],
                     dtype=jnp.float32)

    grid = (n_pad // TILE, n_pad // TILE_J)
    out = pl.pallas_call(
        _contact_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 16), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, TILE_J), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 8), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        interpret=interpret,
    )(scal, rows, cols)
    return out[:n, :3], out[:n, 3]
