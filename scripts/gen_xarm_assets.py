"""Generate xArm6 link collision/render assets -> data/assets/xarm6_links.npz.

Reads the xArm6 URDF collision meshes (VHACD OBJs referenced by
src/sim/assets/xarm/xarm6_robot.urdf in the upstream dataset assets; all
collision origins are identity, so mesh frames == link frames) and derives,
per link:
  * convex-hull halfspaces (n·x <= d, link-local, URDF meters) for the
    engine's SHAPE_CONVEX kinematic shapes — the TPU-native stand-in for
    pyflex_add_mesh triangle shapes (PyFleX/bindings/pyflex.cpp:2828);
  * area-weighted surface point samples + normals for point-splat rendering
    of the arm (robot links visible in captured frames like the reference's
    GL mesh draw).

Run once; the npz is committed so runtime never needs the reference tree.
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
from scipy.spatial import ConvexHull

from adaptigraph_tpu.scenes.mesh import import_obj

MESH_DIR = "/root/reference/src/sim/assets/xarm/xarm_description/meshes/xarm6/collision"
OUT = "/root/repo/data/assets/xarm6_links.npz"
LINKS = ["base", "link1", "link2", "link3", "link4", "link5", "link6"]
MAX_PLANES = 40
N_SURF = 320


def hull_planes(verts, max_planes=MAX_PLANES):
    hull = ConvexHull(verts)
    # equations rows are [n, -d] with n·x + (-d) <= 0 -> n·x <= d
    eqs = hull.equations
    planes = np.concatenate([eqs[:, :3], -eqs[:, 3:4]], axis=1)
    # dedupe near-parallel planes (keep the outermost d)
    keep = []
    for p in planes:
        merged = False
        for q in keep:
            if np.dot(p[:3], q[:3]) > 0.995 and abs(p[3] - q[3]) < 5e-3:
                q[3] = max(q[3], p[3])
                merged = True
                break
        if not merged:
            keep.append(p.copy())
    planes = np.array(keep, dtype=np.float32)
    if len(planes) > max_planes:
        # keep the planes supporting the most hull vertices (biggest faces)
        support = ((verts @ planes[:, :3].T) - planes[None, :, 3] > -1e-3).sum(0)
        planes = planes[np.argsort(-support)[:max_planes]]
    return planes


def surface_samples(mesh, n=N_SURF, rng=None):
    rng = rng or np.random.RandomState(0)
    tri = mesh.triangles()
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    nrm = np.cross(e1, e2)
    area = 0.5 * np.linalg.norm(nrm, axis=1)
    nrm = nrm / (np.linalg.norm(nrm, axis=1, keepdims=True) + 1e-12)
    p = area / max(area.sum(), 1e-12)
    pick = rng.choice(len(tri), size=n, p=p)
    u = rng.rand(n, 1)
    v = rng.rand(n, 1)
    flip = (u + v) > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    pts = tri[pick, 0] + u * e1[pick] + v * e2[pick]
    return pts.astype(np.float32), nrm[pick].astype(np.float32)


def main():
    out = {}
    for name in LINKS:
        candidates = [f for f in os.listdir(MESH_DIR)
                      if f.startswith(f"{name}_vhacd") and f.endswith(".obj")]
        verts_all, pts_all, nrm_all = [], [], []
        for f in sorted(candidates):
            m = import_obj(os.path.join(MESH_DIR, f))
            verts_all.append(m.vertices)
            pts, nrm = surface_samples(m, n=N_SURF // len(candidates))
            pts_all.append(pts)
            nrm_all.append(nrm)
        verts = np.concatenate(verts_all)
        planes = hull_planes(verts)
        print(f"{name}: {len(verts)} verts -> {len(planes)} hull planes, "
              f"bounds {verts.min(0).round(3)}..{verts.max(0).round(3)}")
        out[f"{name}_planes"] = planes
        out[f"{name}_surf"] = np.concatenate(pts_all)
        out[f"{name}_surf_n"] = np.concatenate(nrm_all)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, links=np.array(LINKS), **out)
    print("wrote", OUT, os.path.getsize(OUT), "bytes")


if __name__ == "__main__":
    main()
