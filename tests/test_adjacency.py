"""CSR adjacency builders, padded-dense conversion, topology merging."""

import numpy as np

from softbodysim_tpu.core import meshes
from softbodysim_tpu.core.adjacency import (
    build_edge_adjacency, build_tet_adjacency, build_tri_adjacency,
    combine_topologies, csr_to_padded)


def test_edge_adjacency_roundtrip():
    topo = meshes.tet_cube(2, 2, 2)
    off, other, eidx = build_edge_adjacency(topo.num_particles, topo.edges)
    assert off[-1] == 2 * topo.num_edges
    # every (i, k) entry maps back to an edge containing i
    for i in range(topo.num_particles):
        for k in range(off[i], off[i + 1]):
            e = topo.edges[eidx[k]]
            assert i in e and other[k] in e and other[k] != i


def test_tet_adjacency_roles():
    topo = meshes.tet_cube(2, 2, 2)
    off, tidx, role = build_tet_adjacency(topo.num_particles, topo.tets)
    assert off[-1] == 4 * topo.num_tets
    for i in range(topo.num_particles):
        for k in range(off[i], off[i + 1]):
            assert topo.tets[tidx[k], role[k]] == i


def test_tri_adjacency():
    topo = meshes.tet_cube(2, 2, 2)
    off, tridx = build_tri_adjacency(topo.num_particles, topo.surface_tris)
    assert off[-1] == 3 * len(topo.surface_tris)
    for i in range(topo.num_particles):
        for k in range(off[i], off[i + 1]):
            assert i in topo.surface_tris[tridx[k]]


def test_csr_to_padded():
    topo = meshes.tet_cube(2, 2, 2)
    off, other, eidx = build_edge_adjacency(topo.num_particles, topo.edges)
    other_p, eidx_p, mask = csr_to_padded(off, other, eidx)
    deg = np.diff(off)
    assert other_p.shape == (topo.num_particles, deg.max())
    assert (mask.sum(axis=1) == deg).all()
    np.testing.assert_array_equal(other_p[mask], other)


def test_combine_topologies():
    a = meshes.tet_ball(1, 0.2, (0.0, 0.5, 0.0))
    b = meshes.tet_cube(2, 2, 2, 0.3, (1.0, 0.5, 0.0))
    merged, slices = combine_topologies([a, b])
    assert merged.num_particles == a.num_particles + b.num_particles
    assert merged.num_edges == a.num_edges + b.num_edges
    assert merged.num_tets == a.num_tets + b.num_tets
    np.testing.assert_allclose(merged.vertices[slices[0]], a.vertices)
    np.testing.assert_allclose(merged.vertices[slices[1]], b.vertices)
    # indices of body b shifted into its slice
    assert merged.tets[a.num_tets:].min() >= a.num_particles
    # rest quantities preserved
    np.testing.assert_allclose(
        merged.edge_rest, np.concatenate([a.edge_rest, b.edge_rest]))


def test_merged_scene_simulates_independently():
    """Without inter-body coupling, a merged scene must reproduce the two
    separate engines exactly (disjoint constraints)."""
    from softbodysim_tpu import Engine, SolverParams

    a = meshes.tet_ball(1, 0.2, (0.0, 0.6, 0.0))
    b = meshes.tet_cube(2, 2, 2, 0.3, (1.0, 0.6, 0.0))
    merged, slices = combine_topologies([a, b])
    params = SolverParams(dialect="jacobi", substeps=2, iterations=4,
                          use_pallas="off")

    em = Engine(merged, params)
    ea = Engine(a, params)
    eb = Engine(b, params)
    # 15 steps = pre-ground-contact: after contact, ulp-level XLA fp
    # reordering between the differently-sized programs amplifies
    # chaotically (verified ~7e-11 at step 1, exploding only at contact)
    for _ in range(15):
        em.step(1 / 60)
        ea.step(1 / 60)
        eb.step(1 / 60)
    np.testing.assert_allclose(
        em.positions()[slices[0]], ea.positions(), atol=1e-6)
    np.testing.assert_allclose(
        em.positions()[slices[1]], eb.positions(), atol=1e-6)
