"""Randomized property tests: random tet soups through every backend pair
and the oracle -- catches formulation bugs that structured meshes hide
(irregular degrees, degenerate tets, isolated vertices, duplicate-ish
points)."""

import numpy as np
import pytest

from softbodysim_tpu import Engine, SolverParams
from softbodysim_tpu.core.topology import build_topology

from oracle import JacobiOracle, XpbdOracle

DT = 1.0 / 60.0


def random_tet_soup(seed, nv=40, nt=60, with_isolated=True):
    rng = np.random.default_rng(seed)
    verts = rng.uniform(-0.5, 0.5, (nv, 3)).astype(np.float32)
    verts[:, 1] += 1.0
    # random tets over a subset (leaves some isolated vertices)
    hi = nv if not with_isolated else max(8, nv - 5)
    tets = rng.integers(0, hi, (nt, 4))
    # drop tets with repeated vertices
    ok = np.array([len(set(t)) == 4 for t in tets])
    tets = tets[ok]
    return build_topology(verts, tets)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_xpbd_backends_agree_on_random_soup(seed):
    topo = random_tet_soup(seed)
    base = SolverParams(dialect="xpbd", substeps=2, iterations=5,
                        edge_compliance=1e-3, volume_compliance=1e-6)
    a = Engine(topo, base.replace(xpbd_backend="scatter"))
    b = Engine(topo, base.replace(xpbd_backend="gather"))
    for _ in range(40):
        a.step(DT)
        b.step(DT)
    assert np.isfinite(a.positions()).all()
    np.testing.assert_allclose(a.positions(), b.positions(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(a.state.edge_lambda),
                               np.asarray(b.state.edge_lambda), atol=5e-4)


@pytest.mark.parametrize("seed", [3, 4])
def test_xpbd_matches_oracle_on_random_soup(seed):
    topo = random_tet_soup(seed, nv=25, nt=30)
    params = SolverParams(dialect="xpbd", substeps=2, iterations=5)
    eng = Engine(topo, params)
    oracle = XpbdOracle(topo, params)
    for _ in range(40):
        eng.step(DT)
        oracle.step(DT, edge_order=topo.edge_colors.order,
                    tet_order=topo.tet_colors.order)
    np.testing.assert_allclose(eng.positions(), oracle.x, atol=2e-4)


@pytest.mark.parametrize("seed", [5, 6])
def test_jacobi_backends_agree_on_random_soup(seed):
    topo = random_tet_soup(seed)
    base = SolverParams(dialect="jacobi", substeps=2, iterations=5,
                        use_pallas="off")
    a = Engine(topo, base.replace(jacobi_backend="segment"))
    b = Engine(topo, base.replace(jacobi_backend="gather"))
    for _ in range(40):
        a.step(DT)
        b.step(DT)
    assert np.isfinite(a.positions()).all()
    np.testing.assert_allclose(a.positions(), b.positions(), atol=5e-5)


def test_jacobi_matches_oracle_on_random_soup():
    topo = random_tet_soup(7, nv=22, nt=25)
    params = SolverParams(dialect="jacobi", substeps=2, iterations=5)
    eng = Engine(topo, params)
    oracle = JacobiOracle(topo, params)
    for _ in range(40):
        eng.step(DT)
        oracle.step(DT)
    np.testing.assert_allclose(eng.positions(), oracle.x, atol=3e-4)


def test_long_run_stability_xpbd():
    """600 steps on a structured body: positions bounded, on/above ground,
    velocities settle (regression guard against energy blowup)."""
    from softbodysim_tpu.core import meshes

    topo = meshes.tet_cube(3, 3, 3, size=0.5, center=(0.0, 1.0, 0.0))
    eng = Engine(topo, SolverParams(dialect="xpbd", substeps=2,
                                    iterations=6))
    for _ in range(600):
        eng.step(DT)
    pos = eng.positions()
    v = eng.velocities()
    assert np.isfinite(pos).all() and np.isfinite(v).all()
    assert pos[:, 1].min() >= -1e-4
    assert np.abs(pos).max() < 5.0
    assert np.abs(v).max() < 0.5      # friction settled it
