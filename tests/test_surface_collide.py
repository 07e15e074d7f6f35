"""Triangle-level vertex-triangle surface collision (solver/surface_collide)
-- the soft-soft surface contact the reference lacks entirely."""

import numpy as np
import jax.numpy as jnp

from softbodysim_tpu import Engine, SolverParams
from softbodysim_tpu.core import meshes, topology as T
from softbodysim_tpu.solver.surface_collide import (
    closest_point_triangle, surface_collision_deltas, suggested_cell_size)


def test_closest_point_regions():
    a = np.array([0.0, 0, 0]); b = np.array([1.0, 0, 0]); c = np.array([0, 1.0, 0])
    cases = [
        ([0.25, 0.25, 1.0], [0.25, 0.25, 0.0]),   # face
        ([-1.0, -1.0, 0.0], [0.0, 0.0, 0.0]),     # vertex a
        ([2.0, -1.0, 0.0], [1.0, 0.0, 0.0]),      # vertex b
        ([0.5, -1.0, 0.5], [0.5, 0.0, 0.0]),      # edge ab
        ([1.0, 1.0, 0.0], [0.5, 0.5, 0.0]),       # edge bc
    ]
    for p, want in cases:
        cp, bary = closest_point_triangle(
            jnp.asarray(p, jnp.float32), jnp.asarray(a, jnp.float32),
            jnp.asarray(b, jnp.float32), jnp.asarray(c, jnp.float32))
        np.testing.assert_allclose(np.asarray(cp), want, atol=1e-6, err_msg=str(p))
        np.testing.assert_allclose(float(jnp.sum(bary)), 1.0, atol=1e-6)


def test_vertex_triangle_pushout_two_way():
    # particle 3 hovers 0.005 above a unit triangle; thickness 0.02
    p = np.array([[0, 0, 0], [1, 0, 0], [0, 0, 1], [0.2, 0.005, 0.2]],
                 np.float32)
    tris = np.array([[0, 2, 1]])
    w = np.ones(4, np.float32)
    d = np.asarray(surface_collision_deltas(
        jnp.asarray(p), jnp.asarray(w), tris, 0.02, 0.5, 8))
    assert d[3, 1] > 1e-4            # particle pushed up
    assert d[0, 1] < 0 or d[2, 1] < 0 or d[1, 1] < 0   # corners react down
    # pinned triangle -> particle takes the whole correction
    w2 = np.array([0, 0, 0, 1], np.float32)
    d2 = np.asarray(surface_collision_deltas(
        jnp.asarray(p), jnp.asarray(w2), tris, 0.02, 0.5, 8))
    np.testing.assert_allclose(d2[:3], 0.0, atol=1e-7)
    assert d2[3, 1] > d[3, 1]


def test_own_triangles_ignored():
    p = np.array([[0, 0, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    tris = np.array([[0, 2, 1]])
    w = np.ones(3, np.float32)
    d = np.asarray(surface_collision_deltas(
        jnp.asarray(p), jnp.asarray(w), tris, 0.05, 0.5, 8))
    np.testing.assert_allclose(d, 0.0, atol=1e-7)


def test_two_balls_separate_via_surface_contact():
    """Two slightly-overlapping balls in one topology: with
    surface_collision on, their surfaces push apart."""
    b1 = meshes.tet_ball(subdivisions=1, radius=0.25, center=(0.0, 0.5, 0.0))
    b2 = meshes.tet_ball(subdivisions=1, radius=0.25, center=(0.44, 0.5, 0.0))
    n1 = b1.num_particles
    topo = T.build_topology(
        np.concatenate([b1.vertices, b2.vertices]),
        np.concatenate([b1.tets, b2.tets + n1]),
        edges=np.concatenate([b1.edges, b2.edges + n1]),
        surface_tris=np.concatenate([b1.surface_tris,
                                     b2.surface_tris + n1]))
    params = SolverParams(
        dialect="jacobi", substeps=1, iterations=4, gravity=(0, 0, 0),
        ground_enabled=False, surface_collision=True, surface_thickness=0.03,
        use_pallas="off")
    eng = Engine(topo, params, inv_mass_mode="density")
    eng.run(30, 1 / 60)
    pos = eng.positions()
    assert np.isfinite(pos).all()
    c1 = pos[:n1].mean(0)
    c2 = pos[n1:].mean(0)
    d0 = 0.44
    assert np.linalg.norm(c2 - c1) > d0 + 0.01   # centers pushed apart


def test_suggested_cell_size_positive():
    b = meshes.tet_ball(subdivisions=1, radius=0.25)
    c = suggested_cell_size(b.vertices, b.surface_tris, 0.02)
    assert 0.01 < c < 1.0
