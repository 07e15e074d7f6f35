"""CSR adjacency builders + multi-body topology merging.

CSR builders reproduce the reference's exactly (counting pass -> prefix sum
-> fill in constraint order):
  BuildEdgeAdjacency  SoftBodySolver.cs:1082-1125  (particle -> (edge, other))
  BuildTetAdjacency   SoftBodySolver.cs:1127-1171  (particle -> (tet, role))
  BuildTriAdjacency   SoftBodySolver.cs:1173-1212  (particle -> tri)

The TPU solvers use segment-sums instead of CSR gathers, but CSR (and its
padded-dense form) is exposed for custom gather-style kernels and analysis.

``combine_topologies`` merges N bodies into one scene with offset indices --
the TPU-native multi-body form: one state, one step, and spatial-hash
collision then resolves *inter-body* contacts for free (the hash doesn't
care which body a particle belongs to).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from .topology import Topology, build_topology


def build_edge_adjacency(num_particles: int, edges: np.ndarray):
    """Returns (offsets (V+1,), other (2E,), edge_index (2E,))."""
    edges = np.asarray(edges, np.int64).reshape(-1, 2)
    counts = np.bincount(edges.ravel(), minlength=num_particles)
    offsets = np.zeros(num_particles + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    other = np.empty(2 * len(edges), np.int64)
    edge_index = np.empty(2 * len(edges), np.int64)
    cur = offsets[:-1].copy()
    for e, (a, b) in enumerate(edges):
        ka = cur[a]; cur[a] += 1
        other[ka] = b; edge_index[ka] = e
        kb = cur[b]; cur[b] += 1
        other[kb] = a; edge_index[kb] = e
    return offsets, other, edge_index


def build_tet_adjacency(num_particles: int, tets: np.ndarray):
    """Returns (offsets (V+1,), tet_index (4T,), role (4T,))."""
    tets = np.asarray(tets, np.int64).reshape(-1, 4)
    counts = np.bincount(tets.ravel(), minlength=num_particles)
    offsets = np.zeros(num_particles + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    tet_index = np.empty(4 * len(tets), np.int64)
    role = np.empty(4 * len(tets), np.int64)
    cur = offsets[:-1].copy()
    for t, tet in enumerate(tets):
        for r, v in enumerate(tet):
            k = cur[v]; cur[v] += 1
            tet_index[k] = t; role[k] = r
    return offsets, tet_index, role


def build_tri_adjacency(num_particles: int, tris: np.ndarray):
    """Returns (offsets (V+1,), tri_index (3S,))."""
    tris = np.asarray(tris, np.int64).reshape(-1, 3)
    counts = np.bincount(tris.ravel(), minlength=num_particles)
    offsets = np.zeros(num_particles + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    tri_index = np.empty(3 * len(tris), np.int64)
    cur = offsets[:-1].copy()
    for t, tri in enumerate(tris):
        for v in tri:
            k = cur[v]; cur[v] += 1
            tri_index[k] = t
    return offsets, tri_index


def csr_to_padded(offsets: np.ndarray, *values: np.ndarray,
                  fill: int = 0) -> Tuple[np.ndarray, ...]:
    """CSR -> dense (V, max_degree) arrays + mask, for fixed-degree TPU
    gathers (SURVEY.md section 7 'pad CSR rows to fixed degree')."""
    v = len(offsets) - 1
    deg = np.diff(offsets)
    dmax = int(deg.max()) if v else 0
    mask = np.arange(dmax)[None, :] < deg[:, None]
    outs = []
    for val in values:
        out = np.full((v, dmax), fill, val.dtype)
        out[mask] = val
        outs.append(out)
    return (*outs, mask)


def padded_edge_adjacency(num_particles: int, edges: np.ndarray):
    """Vectorized padded-dense edge adjacency: (other (V,D), edge_idx (V,D),
    mask (V,D)) with D = max degree.  Row-internal order is by-endpoint-role
    then edge index (summation order only; the solvers reduce over rows).

    This is the (fixed-degree-padded) CSR the reference's GPU kernels walk
    (K_EdgeGather, SoftBodyCompute.compute:243-274) -- on TPU the padded
    gather form avoids scatters entirely.
    """
    edges = np.asarray(edges, np.int64).reshape(-1, 2)
    e_count = len(edges)
    if e_count == 0:
        return (np.zeros((num_particles, 1), np.int32),
                np.zeros((num_particles, 1), np.int32),
                np.zeros((num_particles, 1), bool))
    endpoints = np.concatenate([edges[:, 0], edges[:, 1]])
    others = np.concatenate([edges[:, 1], edges[:, 0]])
    eidx = np.tile(np.arange(e_count, dtype=np.int64), 2)

    order = np.argsort(endpoints, kind="stable")
    sv = endpoints[order]
    deg = np.bincount(endpoints, minlength=num_particles)
    dmax = int(deg.max())
    row_start = np.zeros(num_particles + 1, np.int64)
    np.cumsum(deg, out=row_start[1:])
    pos = np.arange(2 * e_count) - row_start[sv]

    other_p = np.zeros((num_particles, dmax), np.int32)
    eidx_p = np.zeros((num_particles, dmax), np.int32)
    mask = np.zeros((num_particles, dmax), bool)
    other_p[sv, pos] = others[order]
    eidx_p[sv, pos] = eidx[order]
    mask[sv, pos] = True
    return other_p, eidx_p, mask


def padded_tet_adjacency(num_particles: int, tets: np.ndarray):
    """Vectorized padded-dense tet adjacency: (tet_idx (V,D), role (V,D),
    mask (V,D)) -- the K_VolumeGather walk (SoftBodyCompute.compute:294-370).
    """
    tets = np.asarray(tets, np.int64).reshape(-1, 4)
    t_count = len(tets)
    if t_count == 0:
        return (np.zeros((num_particles, 1), np.int32),
                np.zeros((num_particles, 1), np.int32),
                np.zeros((num_particles, 1), bool))
    verts = tets.ravel()
    tidx = np.repeat(np.arange(t_count, dtype=np.int64), 4)
    role = np.tile(np.arange(4, dtype=np.int64), t_count)

    order = np.argsort(verts, kind="stable")
    sv = verts[order]
    deg = np.bincount(verts, minlength=num_particles)
    dmax = int(deg.max())
    row_start = np.zeros(num_particles + 1, np.int64)
    np.cumsum(deg, out=row_start[1:])
    pos = np.arange(4 * t_count) - row_start[sv]

    tidx_p = np.zeros((num_particles, dmax), np.int32)
    role_p = np.zeros((num_particles, dmax), np.int32)
    mask = np.zeros((num_particles, dmax), bool)
    tidx_p[sv, pos] = tidx[order]
    role_p[sv, pos] = role[order]
    mask[sv, pos] = True
    return tidx_p, role_p, mask


def degree_buckets(deg: np.ndarray, quantiles=(0.5, 0.75, 0.9)):
    """Degree caps for bucketed padded adjacency.  Irregular meshes waste
    up to 8x on max-degree padding (the reference's 8.6k 'default' mesh:
    tet degree avg 12.1, max 101); bucketing vertices by degree and padding
    each bucket to its own cap recovers most of it."""
    deg = np.asarray(deg)
    if deg.size == 0 or deg.max() == 0:
        return [1]
    caps = sorted({max(1, int(np.ceil(np.quantile(deg, q))))
                   for q in quantiles})
    dmax = int(deg.max())
    caps = [c for c in caps if c < dmax] + [dmax]
    return caps


def bucket_vertices(deg: np.ndarray, caps):
    """Partition vertex ids by degree cap.  Returns (buckets, pos) where
    buckets[i] holds the vertex ids with caps[i-1] < deg <= caps[i] (ids
    ascending within a bucket) and pos maps vertex id -> row index in the
    bucket-concatenated order."""
    deg = np.asarray(deg)
    assign = np.searchsorted(caps, deg, side="left")
    buckets = [np.nonzero(assign == i)[0] for i in range(len(caps))]
    order = (np.concatenate(buckets) if len(deg)
             else np.zeros((0,), np.int64))
    pos = np.empty(len(deg), np.int64)
    pos[order] = np.arange(len(deg))
    return buckets, pos


def bucketize_padded(padded_arrays, mask: np.ndarray, deg: np.ndarray,
                     quantiles=(0.5, 0.75, 0.9)):
    """Slice global padded (V, Dmax) arrays into per-degree-bucket views.

    Returns (buckets_out, pos) with buckets_out a list of
    (vertex_ids, [arrays sliced to (Nb, Db)], mask_b).
    """
    caps = degree_buckets(deg, quantiles)
    buckets, pos = bucket_vertices(deg, caps)
    out = []
    for cap, vids in zip(caps, buckets):
        if len(vids) == 0:
            continue
        sliced = [a[vids, :cap] for a in padded_arrays]
        out.append((vids, sliced, mask[vids, :cap]))
    return out, pos


def combine_topologies(topologies: Sequence[Topology]
                       ) -> Tuple[Topology, List[slice]]:
    """Merge bodies into one scene topology with offset indices.

    Returns (merged, slices) where slices[i] selects body i's particles in
    the merged vertex array.  Constraint colorings are rebuilt over the
    merged constraint lists (bodies are disjoint, so colors could be merged
    directly -- rebuilding keeps the canonical ordering contract).
    """
    verts, edges, tets, tris, slices = [], [], [], [], []
    off = 0
    for t in topologies:
        n = t.num_particles
        slices.append(slice(off, off + n))
        verts.append(t.vertices)
        if t.num_edges:
            edges.append(t.edges.astype(np.int64) + off)
        if t.num_tets:
            tets.append(t.tets.astype(np.int64) + off)
        if len(t.surface_tris):
            tris.append(t.surface_tris.astype(np.int64) + off)
        off += n

    merged = build_topology(
        np.concatenate(verts, axis=0),
        np.concatenate(tets, axis=0) if tets else np.zeros((0, 4), np.int64),
        edges=(np.concatenate(edges, axis=0) if edges
               else np.zeros((0, 2), np.int64)),
        surface_tris=(np.concatenate(tris, axis=0) if tris
                      else np.zeros((0, 3), np.int64)),
        orient=False,  # bodies are already oriented
    )
    return merged, slices
