"""Closed render mesh -> simulation-ready tetrahedral mesh.

Capability parity with the reference's L0-L2 mesh pipeline
(Tetrahedralizer native plugin + SoftBodyTetMeshAsset.TryCreateFromMesh,
SoftBodyTetMeshAsset.cs:25-81): any closed triangle mesh becomes vertices +
tets + unique edges + boundary surface.  The algorithm differs by design --
the plugin is a binary-only constrained Delaunay code; here a *voxel*
tetrahedralizer (cell-center parity ray casts -> conforming 5-tet cells)
runs natively (native/softtopo.cpp) with a vectorized NumPy fallback.

Voxel meshes are the standard choice for soft-body volumes (graphics-quality
boundaries are rendered by embedding the render mesh, not by the sim mesh),
and they produce well-conditioned, uniform tets -- better for XPBD than
sliver-prone Delaunay output, with no degenerate-tet filtering needed
(cf. the plugin's degenerateTetrahedronRatio knob).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .topology import Topology, build_topology


def voxelize_numpy(vertices: np.ndarray, triangles: np.ndarray,
                   cell: float) -> Tuple[np.ndarray, np.ndarray]:
    """NumPy fallback voxel tetrahedralizer (same semantics as the native
    st_voxelize): returns (verts (V,3) f32, tets (T,4) i32)."""
    v = np.asarray(vertices, np.float64).reshape(-1, 3)
    tri = np.asarray(triangles, np.int64).reshape(-1, 3)
    if len(v) == 0 or len(tri) == 0 or cell <= 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 4), np.int32)

    lo = v.min(axis=0)
    hi = v.max(axis=0)
    nx, ny, nz = [max(1, int(np.ceil((hi[k] - lo[k]) / cell)))
                  for k in range(3)]

    # cell centers
    cy = lo[1] + (np.arange(ny) + 0.5) * cell
    cz = lo[2] + (np.arange(nz) + 0.5) * cell
    cx = lo[0] + (np.arange(nx) + 0.5) * cell

    p0 = v[tri[:, 0]]
    p1 = v[tri[:, 1]]
    p2 = v[tri[:, 2]]
    d0 = p1 - p0
    d1 = p2 - p0
    det = d0[:, 1] * d1[:, 2] - d0[:, 2] * d1[:, 1]       # (F,)
    ok = np.abs(det) > 1e-18

    inside = np.zeros((nx, ny, nz), bool)
    # per (y, z) ray: barycentric test in the yz plane, solve x crossings
    for j in range(ny):
        wy = cy[j] - p0[:, 1]
        for k in range(nz):
            wz = cz[k] - p0[:, 2]
            safe_det = np.where(ok, det, 1.0)
            u = (wy * d1[:, 2] - wz * d1[:, 1]) / safe_det
            w = (d0[:, 1] * wz - d0[:, 2] * wy) / safe_det
            hit = ok & (u >= 0) & (w >= 0) & (u + w <= 1)
            if not hit.any():
                continue
            xs = np.sort(p0[hit, 0] + u[hit] * d0[hit, 0] + w[hit] * d1[hit, 0])
            crossings_after = len(xs) - np.searchsorted(xs, cx)
            inside[:, j, k] = (crossings_after % 2) == 1

    ii, jj, kk = np.nonzero(inside)
    if len(ii) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 4), np.int32)

    # shared grid vertex ids
    def corner_key(i, j, k):
        return (i.astype(np.int64) * (ny + 2) + j) * (nz + 2) + k

    corners = np.stack([
        corner_key(ii + di, jj + dj, kk + dk)
        for di in (0, 1) for dj in (0, 1) for dk in (0, 1)
    ], axis=1)  # (C, 8) ordered c000,c001,c010,c011,c100,c101,c110,c111
    uniq, inv = np.unique(corners, return_inverse=True)
    inv = inv.reshape(corners.shape)

    gi = uniq // ((ny + 2) * (nz + 2))
    rem = uniq % ((ny + 2) * (nz + 2))
    gj = rem // (nz + 2)
    gk = rem % (nz + 2)
    verts = np.stack([lo[0] + gi * cell, lo[1] + gj * cell,
                      lo[2] + gk * cell], axis=1).astype(np.float32)

    even = np.array([[0, 1, 2, 4], [1, 3, 2, 7], [1, 4, 5, 7],
                     [2, 4, 7, 6], [1, 2, 4, 7]])
    odd = np.array([[0, 1, 3, 5], [0, 3, 2, 6], [0, 5, 4, 6],
                    [3, 5, 6, 7], [0, 3, 5, 6]])
    parity = (ii + jj + kk) % 2
    tets = np.where(
        (parity == 0)[:, None, None],
        inv[:, even],          # (C, 5, 4)
        inv[:, odd])
    return verts, tets.reshape(-1, 4).astype(np.int32)


def tetrahedralize(vertices: np.ndarray, triangles: np.ndarray,
                   cell: Optional[float] = None,
                   resolution: int = 12) -> Tuple[np.ndarray, np.ndarray]:
    """(verts, tets) for a closed mesh.  ``cell`` defaults to
    max_extent / resolution.  Uses the native lib when available."""
    v = np.asarray(vertices, np.float32).reshape(-1, 3)
    tri = np.asarray(triangles, np.int64).reshape(-1, 3)
    if cell is None:
        extent = float((v.max(axis=0) - v.min(axis=0)).max()) if len(v) else 1.0
        cell = extent / max(1, resolution)

    from .native import native_voxelize

    out = native_voxelize(v, tri, cell)
    if out is None:
        out = voxelize_numpy(v, tri, cell)
    return out


def topology_from_mesh(vertices: np.ndarray, triangles: np.ndarray,
                       cell: Optional[float] = None,
                       resolution: int = 12) -> Topology:
    """Full pipeline: closed render mesh -> Topology (the
    TryCreateFromMesh equivalent)."""
    verts, tets = tetrahedralize(vertices, triangles, cell=cell,
                                 resolution=resolution)
    if len(tets) == 0:
        raise ValueError(
            "tetrahedralization produced no tets (mesh not closed, or "
            "resolution too coarse)")
    return build_topology(verts, tets)


def topology_from_obj(path: str, cell: Optional[float] = None,
                      resolution: int = 12) -> Topology:
    from .meshes import load_obj

    verts, faces = load_obj(path)
    return topology_from_mesh(verts, faces, cell=cell, resolution=resolution)
