"""Topology building: edges, boundary surface, orientation, coloring."""

import numpy as np
import pytest

from softbodysim_tpu.core import meshes
from softbodysim_tpu.core.topology import (
    build_edges_and_surface, build_topology, color_groups, greedy_color,
    orient_tets_positive)


def _signed_vols(verts, tets):
    p = verts[tets]
    return np.einsum(
        "ti,ti->t",
        np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]),
        p[:, 3] - p[:, 0],
    ) / 6.0


def test_orient_tets_positive():
    topo = meshes.tet_cube(2, 2, 2)
    vols = _signed_vols(topo.vertices, topo.tets.astype(np.int64))
    assert (vols > 0).all()

    # deliberately flip some tets; orientation must fix them
    tets = topo.tets.astype(np.int64).copy()
    tets[::2, [1, 2]] = tets[::2, [2, 1]]
    fixed = orient_tets_positive(topo.vertices, tets)
    assert (_signed_vols(topo.vertices, fixed) > 0).all()


def test_unique_edges_cube():
    topo = meshes.tet_cube(2, 2, 2)
    e = topo.edges
    # sorted pairs, unique
    assert (e[:, 0] < e[:, 1]).all()
    assert len(np.unique(e, axis=0)) == len(e)
    # every tet edge is present
    tets = topo.tets
    for t in tets:
        for i in range(4):
            for j in range(i + 1, 4):
                a, b = sorted((t[i], t[j]))
                assert ((e[:, 0] == a) & (e[:, 1] == b)).any()


def test_surface_is_closed_and_outward():
    topo = meshes.tet_cube(2, 2, 2)
    tris = topo.surface_tris
    # boundary of a ball-like volume: every boundary edge shared by exactly 2 tris
    edge_count = {}
    for t in tris:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            key = (min(a, b), max(a, b))
            edge_count[key] = edge_count.get(key, 0) + 1
    assert all(c == 2 for c in edge_count.values())

    # outward winding: signed volume of the surface (divergence theorem) > 0
    v = topo.vertices
    vol6 = 0.0
    for t in tris:
        vol6 += np.dot(np.cross(v[t[1]] - v[t[0]], v[t[2]] - v[t[0]]),
                       v[t[0]])
    # for outward normals sum of dot(n, p0) over tris = 6*volume > 0... sign check
    assert vol6 > 0

    # expected surface area of unit cube = 6
    area = 0.0
    for t in tris:
        area += 0.5 * np.linalg.norm(
            np.cross(v[t[1]] - v[t[0]], v[t[2]] - v[t[0]]))
    assert area == pytest.approx(6.0, rel=1e-5)


def test_coloring_validity():
    topo = meshes.tet_cube(3, 3, 3)
    for cons, groups in ((topo.edges, topo.edge_colors),
                         (topo.tets, topo.tet_colors)):
        # within each color no vertex repeats
        for ci in range(groups.num_colors):
            ids = groups.idx[ci][groups.mask[ci]]
            vs = cons[ids].ravel()
            assert len(np.unique(vs)) == len(vs), f"color {ci} shares vertices"
        # order covers every constraint exactly once
        assert sorted(groups.order.tolist()) == list(range(len(cons)))


def test_greedy_color_small():
    cons = np.array([[0, 1], [1, 2], [2, 3], [0, 3], [0, 2]])
    colors = greedy_color(cons, 4)
    for i in range(len(cons)):
        for j in range(i + 1, len(cons)):
            if set(cons[i]) & set(cons[j]):
                assert colors[i] != colors[j]


def test_cloth_patch():
    topo, pinned = meshes.cloth_patch(4, 4, bending=True)
    assert topo.num_particles == 25
    assert topo.num_tets == 0
    assert len(pinned) == 4
    # structural 2*4*5=40, shear 2*16=32, bending 2*(3*5)=30
    assert topo.num_edges == 102
    assert topo.surface_tris.shape == (32, 3)


def test_tet_ball():
    topo = meshes.tet_ball(subdivisions=1, radius=0.5)
    assert topo.num_particles == 43  # 42 surface + center
    assert topo.num_tets == 80
    vols = _signed_vols(topo.vertices, topo.tets.astype(np.int64))
    assert (vols > 0).all()


def test_build_topology_with_explicit_edges():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    edges = np.array([[0, 1], [1, 2]], np.int64)
    topo = build_topology(verts, np.zeros((0, 4)), edges=edges,
                          surface_tris=np.zeros((0, 3)), orient=False)
    np.testing.assert_allclose(topo.edge_rest, [1.0, np.sqrt(2)], rtol=1e-6)
