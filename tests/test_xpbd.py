"""XPBD (server dialect) vs the sequential NumPy oracle.

The JAX solver runs colored Gauss-Seidel; the oracle replays the *same*
constraint ordering (color-major), so agreement is tight -- this is the
trace-parity contract from BASELINE.json ("positions match PBDServer to
1e-4").
"""

import numpy as np
import pytest

import jax

from softbodysim_tpu import Engine, SolverParams
from softbodysim_tpu.core import meshes
from softbodysim_tpu.core.state import init_state
from softbodysim_tpu.solver import make_xpbd_step

from oracle import XpbdOracle

DT = 1.0 / 60.0


def run_pair(topo, params, steps, pinned=None):
    eng = Engine(topo, params, pinned=pinned)
    oracle = XpbdOracle(topo, params, pinned=pinned)
    e_order = topo.edge_colors.order
    t_order = topo.tet_colors.order
    for _ in range(steps):
        eng.step(DT)
        oracle.step(DT, edge_order=e_order, tet_order=t_order)
    return eng, oracle


def test_single_tet_drop_matches_oracle():
    topo = meshes.single_tet()
    params = SolverParams(dialect="xpbd", substeps=2, iterations=6)
    eng, oracle = run_pair(topo, params, steps=120)
    np.testing.assert_allclose(eng.positions(), oracle.x, atol=1e-4)
    np.testing.assert_allclose(eng.velocities(), oracle.v, atol=1e-3)


def test_cube_drop_matches_oracle():
    topo = meshes.tet_cube(2, 2, 2, size=0.5, center=(0.0, 1.0, 0.0))
    params = SolverParams(dialect="xpbd", substeps=2, iterations=6,
                          edge_compliance=5e-4, volume_compliance=0.0)
    eng, oracle = run_pair(topo, params, steps=90)
    np.testing.assert_allclose(eng.positions(), oracle.x, atol=1e-4)


def test_cube_10_iters_default_scene():
    """BASELINE config #1: soft-body cube, distance constraints + ground,
    10 solver iterations."""
    topo = meshes.tet_cube(3, 3, 3, size=0.6, center=(0.0, 0.8, 0.0))
    params = SolverParams(dialect="xpbd", substeps=1, iterations=10)
    eng, oracle = run_pair(topo, params, steps=30)
    np.testing.assert_allclose(eng.positions(), oracle.x, atol=1e-4)


def test_lambda_persistence():
    """Lambdas accumulate across substeps/steps and are zeroed only at init
    (Sim.cpp:81-95) -- verify they are nonzero after stepping and that a
    reset zeroes them."""
    topo = meshes.tet_cube(2, 2, 2, center=(0.0, 0.2, 0.0))
    eng = Engine(topo, SolverParams(dialect="xpbd"))
    eng.run(10, DT)
    lam = np.asarray(eng.state.edge_lambda)
    assert np.abs(lam).max() > 0.0
    eng.reset()
    assert np.abs(np.asarray(eng.state.edge_lambda)).max() == 0.0


def test_pinned_particles_do_not_move():
    topo = meshes.tet_cube(2, 2, 2, center=(0.0, 2.0, 0.0))
    top = np.nonzero(
        topo.vertices[:, 1] >= topo.vertices[:, 1].max() - 1e-6)[0]
    eng = Engine(topo, SolverParams(dialect="xpbd"), pinned=top)
    x0 = eng.positions()
    eng.run(60, DT)
    x1 = eng.positions()
    np.testing.assert_allclose(x1[top], x0[top], atol=1e-7)
    # un-pinned particles sag under gravity
    free = np.setdiff1d(np.arange(topo.num_particles), top)
    assert (x1[free, 1] < x0[free, 1] - 1e-4).any()


def test_ground_contact():
    topo = meshes.tet_cube(2, 2, 2, size=0.4, center=(0.0, 0.3, 0.0))
    eng = Engine(topo, SolverParams(dialect="xpbd"))
    eng.run(180, DT)
    pos = eng.positions()
    assert pos[:, 1].min() >= -1e-5          # nothing below ground
    assert pos[:, 1].min() <= 1e-3           # resting on it


def test_volume_preservation_incompressible():
    """volume_compliance=0 == hard volume constraint: total volume after
    settling stays near rest volume."""
    topo = meshes.tet_cube(2, 2, 2, size=0.5, center=(0.0, 0.6, 0.0))
    rest_total = float(np.sum(topo.tet_rest_vol))
    params = SolverParams(dialect="xpbd", substeps=2, iterations=10,
                          edge_compliance=1e-3, volume_compliance=0.0)
    eng = Engine(topo, params)
    eng.run(240, DT)
    pos = eng.positions()
    p = pos[topo.tets.astype(np.int64)]
    vols = np.einsum(
        "ti,ti->t",
        np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]),
        p[:, 3] - p[:, 0]) / 6.0
    assert float(np.sum(vols)) == pytest.approx(rest_total, rel=0.05)


def test_nonzero_volume_compliance_matches_oracle():
    """volumeCompliance > 0 exercises the alpha*lambda feedback term in the
    tet solve (Sim.cpp:162-164), unused by the defaults."""
    topo = meshes.tet_cube(2, 2, 2, size=0.5, center=(0.0, 0.8, 0.0))
    params = SolverParams(dialect="xpbd", substeps=2, iterations=6,
                          edge_compliance=1e-3, volume_compliance=1e-5)
    eng, oracle = run_pair(topo, params, steps=90)
    np.testing.assert_allclose(eng.positions(), oracle.x, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(eng.state.tet_lambda), oracle.tet_lambda, atol=1e-3)


def test_xpbd_backends_agree():
    """Color-major gather backend must track the padded-scatter backend
    closely (identical math/order; only fp association differs)."""
    topo = meshes.tet_cube(2, 2, 2, size=0.5, center=(0.0, 0.8, 0.0))
    base = SolverParams(dialect="xpbd", substeps=2, iterations=6)
    a = Engine(topo, base.replace(xpbd_backend="scatter"))
    b = Engine(topo, base.replace(xpbd_backend="gather"))
    for _ in range(60):
        a.step(DT)
        b.step(DT)
    np.testing.assert_allclose(a.positions(), b.positions(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.state.edge_lambda),
                               np.asarray(b.state.edge_lambda), atol=1e-4)


def test_step_is_jittable_and_donatable():
    topo = meshes.tet_cube(2, 2, 2)
    params = SolverParams(dialect="xpbd")
    step = jax.jit(make_xpbd_step(topo, params), donate_argnums=0)
    state = init_state(topo)
    state = step(state, DT)
    state = step(state, DT)
    assert np.isfinite(np.asarray(state.x)).all()
