"""Jacobi backend equivalence: segment-sum vs padded-gather must agree."""

import numpy as np
import jax.numpy as jnp

from softbodysim_tpu import Engine, SolverParams
from softbodysim_tpu.core import meshes
from softbodysim_tpu.core.adjacency import (
    padded_edge_adjacency, padded_tet_adjacency)
from softbodysim_tpu.solver.jacobi import (
    edge_gather_deltas, edge_jacobi_deltas, tet_gather_deltas,
    tet_jacobi_deltas)

DT = 1.0 / 60.0


def _topo_state(seed=0):
    topo = meshes.tet_cube(3, 3, 3, center=(0.0, 0.6, 0.0))
    rng = np.random.default_rng(seed)
    x = topo.vertices + rng.normal(0, 0.01, topo.vertices.shape
                                   ).astype(np.float32)
    w = rng.uniform(0.5, 2.0, (topo.num_particles,)).astype(np.float32)
    w[::11] = 0.0
    return topo, jnp.asarray(x), jnp.asarray(w)


def test_edge_backends_agree():
    topo, x, w = _topo_state()
    d1, c1 = edge_jacobi_deltas(
        x, w, jnp.asarray(topo.edges, jnp.int32),
        jnp.asarray(topo.edge_rest), 0.9, topo.num_particles)
    other, eidx, mask = padded_edge_adjacency(topo.num_particles, topo.edges)
    d2, c2 = edge_gather_deltas(
        x, w, jnp.asarray(other), jnp.asarray(topo.edge_rest[eidx]),
        jnp.asarray(mask), 0.9)
    free = np.asarray(w) != 0.0
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(c1)[free], np.asarray(c2)[free])


def test_tet_backends_agree():
    topo, x, w = _topo_state(1)
    d1, c1 = tet_jacobi_deltas(
        x, w, jnp.asarray(topo.tets, jnp.int32),
        jnp.asarray(topo.tet_rest_vol), 0.98, topo.num_particles)
    tidx, role, mask = padded_tet_adjacency(topo.num_particles, topo.tets)
    slot = role.astype(np.int64) * topo.num_tets + tidx
    d2, c2 = tet_gather_deltas(
        x, w, jnp.asarray(topo.tets, jnp.int32),
        jnp.asarray(topo.tet_rest_vol), jnp.asarray(slot),
        jnp.asarray(tidx), jnp.asarray(mask), 0.98)
    free = np.asarray(w) != 0.0
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(c1)[free], np.asarray(c2)[free])


def test_whole_sim_backend_equivalence():
    topo = meshes.tet_ball(1, 0.3, (0.0, 0.7, 0.0))
    base = SolverParams(dialect="jacobi", substeps=2, iterations=6,
                        use_pallas="off")
    a = Engine(topo, base.replace(jacobi_backend="segment"))
    b = Engine(topo, base.replace(jacobi_backend="gather"))
    for _ in range(40):
        a.step(DT)
        b.step(DT)
    np.testing.assert_allclose(a.positions(), b.positions(), atol=2e-5)


def test_cloth_gather_backend():
    topo, pinned = meshes.cloth_patch(10, 10)
    base = SolverParams(dialect="jacobi", substeps=2, iterations=6,
                        ground_enabled=False)
    a = Engine(topo, base.replace(jacobi_backend="segment"), pinned=pinned)
    b = Engine(topo, base.replace(jacobi_backend="gather"), pinned=pinned)
    for _ in range(40):
        a.step(DT)
        b.step(DT)
    np.testing.assert_allclose(a.positions(), b.positions(), atol=2e-5)
