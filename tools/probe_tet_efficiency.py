"""Tetrahedralizer efficiency parity vs the reference's Delaunay assets
(VERDICT r3 #4 / Missing #1).

For each reference tet asset family (Assets/SoftBody/Generated), take the
asset's own boundary surface as the input mesh and measure what
topology_from_mesh (voxel 5-tet + surface snap) produces across a
resolution sweep: V/E/T, volume error vs the input surface volume, and
two-sided mean surface distance (our boundary verts -> input surface
tris, input verts -> our boundary tris), normalized by the bbox diagonal.

"Matched fidelity" row = the coarsest resolution whose |volume error|
<= 1% and mean surface distance <= the asset's own mean edge length / 4.
The constraint ratio at that row is the sim-cost multiplier every
downstream second pays (VERDICT: >2x means interior coarsening is
needed).

Run: python tools/probe_tet_efficiency.py  (CPU, ~minutes)
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

ASSETS = [
    ("bunny", "Bunny-LowPoly_Tet 1.asset"),
    ("icosphere", "Icosphere_Tet 1.asset"),
    ("icosphere001", "Icosphere.001_Tet 1.asset"),
    ("cirno", "default_Tet 1.asset"),
]
GEN = "/root/reference/Assets/SoftBody/Generated"


def mesh_volume(verts, tris):
    p = verts[tris]
    return float(np.einsum(
        "ti,ti->t", np.cross(p[:, 1], p[:, 2]), p[:, 0]).sum() / 6.0)


def point_tri_dist(points, verts, tris, sample=2000):
    """Mean distance from (sampled) points to the triangle soup."""
    rng = np.random.default_rng(0)
    if len(points) > sample:
        points = points[rng.choice(len(points), sample, replace=False)]
    a, b, c = (verts[tris[:, i]] for i in range(3))
    ab, ac = b - a, c - a
    d = np.zeros(len(points))
    for i, p in enumerate(points):
        ap = p - a
        d1 = np.einsum("td,td->t", ab, ap)
        d2 = np.einsum("td,td->t", ac, ap)
        d3 = np.einsum("td,td->t", ab, p - b)
        d4 = np.einsum("td,td->t", ac, p - b)
        d5 = np.einsum("td,td->t", ab, p - c)
        d6 = np.einsum("td,td->t", ac, p - c)
        va = d3 * d6 - d5 * d4
        vb = d5 * d2 - d1 * d6
        vc = d1 * d4 - d3 * d2
        denom = np.maximum(va + vb + vc, 1e-30)
        u = np.clip(vb / denom, 0, 1)
        v = np.clip(vc / denom, 0, 1)
        # clamp barycentric to the triangle (approximate but tight enough
        # for a mean-distance fidelity metric)
        w = np.clip(1 - u - v, 0, 1)
        s = u + v + w
        u, v, w = u / s, v / s, w / s
        q = a * w[:, None] + b * u[:, None] + c * v[:, None]
        d[i] = np.sqrt(((q - p) ** 2).sum(1)).min()
    return float(d.mean())


def main():
    from softbodysim_tpu.core.tetrahedralize import topology_from_mesh
    from softbodysim_tpu.io.unity_assets import load_tet_asset

    out = []
    for name, fname in ASSETS:
        ref = load_tet_asset(f"{GEN}/{fname}")
        sv = np.asarray(ref.vertices, np.float64)
        st = np.asarray(ref.surface_tris)
        vol_in = mesh_volume(sv, st)
        bbox = float(np.linalg.norm(sv.max(0) - sv.min(0)))
        e = ref.edges
        mel = float(np.linalg.norm(
            sv[e[:, 1]] - sv[e[:, 0]], axis=1).mean())
        row = {"mesh": name, "ref": {"V": ref.num_particles,
                                     "E": ref.num_edges,
                                     "T": ref.num_tets},
               "vol_in": vol_in, "sweep": []}
        for res in (4, 5, 6, 8, 10, 12, 16):
            t0 = time.time()
            try:
                topo = topology_from_mesh(sv, st, resolution=res)
            except ValueError as ex:
                row["sweep"].append({"res": res, "fail": str(ex)})
                continue
            tv = np.asarray(topo.vertices, np.float64)
            verr = (mesh_volume(tv, topo.surface_tris) - vol_in) / vol_in
            bverts = np.unique(topo.surface_tris)
            d_ours = point_tri_dist(tv[bverts], sv, st)
            d_ref = point_tri_dist(sv, tv, topo.surface_tris)
            cons_ratio = ((topo.num_edges + topo.num_tets)
                          / (ref.num_edges + ref.num_tets))
            row["sweep"].append({
                "res": res, "V": topo.num_particles, "E": topo.num_edges,
                "T": topo.num_tets, "vol_err": round(float(verr), 4),
                "surf_d": round((d_ours + d_ref) / 2 / bbox, 5),
                "surf_tol": round(mel / 4 / bbox, 5),
                "cons_ratio": round(float(cons_ratio), 2),
                "wall_s": round(time.time() - t0, 1)})
            print(json.dumps(row["sweep"][-1]), flush=True)
        out.append(row)
        print(f"== {name}: ref V={ref.num_particles} E={ref.num_edges} "
              f"T={ref.num_tets} ==", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
