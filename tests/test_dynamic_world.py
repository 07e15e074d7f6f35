"""DynamicMergedWorld: mid-run scene growth, state carry, and automatic
backend re-selection (the TPU analog of the reference's per-frame
CPU<->GPU migration, SoftBodySolver.cs:237-253)."""

import numpy as np
import pytest

from softbodysim_tpu import DynamicMergedWorld, Engine, SolverParams
from softbodysim_tpu.core import meshes
from softbodysim_tpu.solver.select import resolve_backend

DT = 1.0 / 60.0


def _topo(n=3, center=(0.0, 0.6, 0.0)):
    return meshes.tet_cube(n, n, n, size=0.4, center=center)


def test_resolve_backend_thresholds():
    """The auto policy: Pallas only for >=100k constraints on real TPU."""
    small = _topo(2)
    big = meshes.tet_cube(30, 30, 30, size=1.0)   # ~370k constraints
    p = SolverParams(dialect="xpbd")
    assert resolve_backend(small, p, platform="tpu") == "gather"
    assert resolve_backend(big, p, platform="tpu") == "pallas"
    assert resolve_backend(big, p, platform="cpu") == "gather"
    # explicit choice wins over the policy
    assert resolve_backend(
        big, p.replace(xpbd_backend="scatter"), platform="tpu") == "scatter"
    # jacobi: local transforms block the pallas path
    pj = SolverParams(dialect="jacobi")
    assert resolve_backend(big, pj, platform="tpu") == "pallas"
    assert resolve_backend(big, pj, platform="tpu",
                           local_to_world=np.eye(4)) == "gather"


def test_engine_exposes_backend():
    eng = Engine(_topo(), SolverParams(dialect="xpbd"))
    assert eng.backend == "gather"          # CPU tests: auto -> gather


def test_growth_preserves_retained_body_trajectory():
    """Adding a body mid-run must not disturb a settled retained body:
    its positions/velocities/lambdas carry across the rebuild exactly
    (new bodies are placed far away, so physics stays independent)."""
    params = SolverParams(dialect="xpbd", substeps=2, iterations=4)
    w = DynamicMergedWorld(params)
    w.add_body("a", _topo(3, center=(0.0, 0.6, 0.0)))
    w.run(30, DT)
    xa = w.positions("a").copy()
    va = w.velocities("a").copy()
    ea = np.asarray(w.engine.state.edge_lambda).copy()

    # reference single-body continuation for the SAME trajectory
    ref = DynamicMergedWorld(params)
    ref.add_body("a", _topo(3, center=(0.0, 0.6, 0.0)))
    ref.run(30, DT)

    w.add_body("b", _topo(3, center=(10.0, 0.6, 0.0)))
    # the rebuild happens lazily here; state must carry exactly
    np.testing.assert_array_equal(w.positions("a"), xa)
    np.testing.assert_array_equal(w.velocities("a"), va)
    na = w._bodies["a"].num_edges
    np.testing.assert_array_equal(
        np.asarray(w.engine.state.edge_lambda)[:na], ea[:na])

    # continued trajectory of body a == single-body world (bodies are
    # constraint-disjoint and far apart; merged execution is exact)
    w.run(30, DT)
    ref.run(30, DT)
    np.testing.assert_allclose(w.positions("a"), ref.positions("a"),
                               atol=1e-5)
    # body b exists and simulates
    assert np.isfinite(w.positions("b")).all()


def test_remove_body_carries_remaining():
    params = SolverParams(dialect="xpbd", substeps=1, iterations=3)
    w = DynamicMergedWorld(params)
    w.add_body("a", _topo(3, center=(0.0, 0.6, 0.0)))
    w.add_body("b", _topo(2, center=(5.0, 0.6, 0.0)))
    w.run(20, DT)
    xb = w.positions("b").copy()
    w.remove_body("a")
    np.testing.assert_array_equal(w.positions("b"), xb)
    w.run(5, DT)
    assert np.isfinite(w.positions("b")).all()


def test_jacobi_dialect_growth():
    params = SolverParams(dialect="jacobi", substeps=2, iterations=4)
    w = DynamicMergedWorld(params)
    w.add_body("a", _topo(3))
    w.run(10, DT)
    xa = w.positions("a").copy()
    w.add_body("b", _topo(2, center=(4.0, 0.6, 0.0)))
    np.testing.assert_array_equal(w.positions("a"), xa)
    w.run(10, DT)
    assert np.isfinite(w.positions()).all()


def test_duplicate_and_missing_names():
    w = DynamicMergedWorld(SolverParams(dialect="xpbd"))
    w.add_body("a", _topo(2))
    with pytest.raises(ValueError):
        w.add_body("a", _topo(2))
    with pytest.raises(KeyError):
        w.remove_body("zz")
