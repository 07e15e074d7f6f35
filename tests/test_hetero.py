"""Heterogeneous batched scenes (mixed meshes, one vmapped program)."""

import numpy as np

from softbodysim_tpu import Engine, SolverParams
from softbodysim_tpu.core import meshes
from softbodysim_tpu.parallel.hetero import HeteroEngine

DT = 1.0 / 60.0


def test_hetero_matches_individual_engines():
    """Each body in the hetero batch must track its solo engine (same
    backend/formulation); pre-contact window for tight tolerance."""
    topos = [
        meshes.tet_ball(1, 0.2, (0.0, 0.8, 0.0)),
        meshes.tet_cube(2, 2, 2, 0.4, (1.0, 0.9, 0.0)),
        meshes.tet_ball(2, 0.15, (-1.0, 0.7, 0.0)),
    ]
    params = SolverParams(dialect="jacobi", substeps=2, iterations=4,
                          jacobi_backend="gather", use_pallas="off")
    het = HeteroEngine(topos, params)
    solos = [Engine(t, params) for t in topos]
    for _ in range(15):
        het.step(DT)
        for s in solos:
            s.step(DT)
    for got, solo in zip(het.positions(), solos):
        np.testing.assert_allclose(got, solo.positions(), atol=2e-5)


def test_hetero_padded_particles_stay_pinned():
    topos = [meshes.single_tet(), meshes.tet_cube(2, 2, 2, 0.4, (1, 1, 0))]
    params = SolverParams(dialect="jacobi", substeps=1, iterations=3,
                          use_pallas="off")
    het = HeteroEngine(topos, params)
    het.step(DT)
    xs = np.asarray(het.state.x)
    # padding rows of scene 0 (beyond its 4 particles) stay at origin
    assert np.abs(xs[0, 4:]).max() == 0.0
    assert np.isfinite(xs).all()


def test_hetero_with_cloth_body():
    """Mixed tet body + cloth (no tets) in one hetero batch."""
    cloth, pinned = meshes.cloth_patch(6, 6, size=0.5, height=0.8)
    ball = meshes.tet_ball(1, 0.2, (1.0, 0.8, 0.0))
    params = SolverParams(dialect="jacobi", substeps=1, iterations=4,
                          use_pallas="off", ground_enabled=False)
    het = HeteroEngine([cloth, ball], params, pinned=[pinned, None])
    for _ in range(20):
        het.step(DT)
    out = het.positions()
    assert np.isfinite(out[0]).all() and np.isfinite(out[1]).all()
    # cloth pins held; free cloth sagged; ball fell
    np.testing.assert_allclose(out[0][pinned], cloth.vertices[pinned],
                               atol=1e-6)
    assert out[1][:, 1].mean() < ball.vertices[:, 1].mean()


def test_hetero_extreme_test_layout():
    """ExtremeTest-shaped workload: 6 mixed bodies, one program, settles."""
    topos = []
    for i in range(4):
        topos.append(meshes.tet_ball(1, 0.15, (0.4 * i - 0.6, 0.6, 0.0)))
    for i in range(2):
        topos.append(meshes.tet_cube(2, 2, 2, 0.25,
                                     (0.4 * i - 0.2, 1.2, 0.4)))
    params = SolverParams(dialect="jacobi", substeps=2, iterations=6,
                          particle_radius=0.02, gravity=(0, -10.0, 0),
                          use_pallas="off")
    het = HeteroEngine(topos, params)
    for _ in range(120):
        het.step(DT)
    for pos in het.positions():
        assert np.isfinite(pos).all()
        assert pos[:, 1].min() > 0.0  # above ground (radius)
        assert pos[:, 1].min() < 0.1  # and settled near it
