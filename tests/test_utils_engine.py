"""utils (config/trees) + Engine.switch_params migration."""

import numpy as np

from softbodysim_tpu import Engine, SolverParams
from softbodysim_tpu.core import meshes
from softbodysim_tpu.utils import (
    params_from_json, params_to_json, tree_bytes, tree_summary)

DT = 1.0 / 60.0


def test_params_json_roundtrip(tmp_path):
    p = SolverParams(dialect="jacobi", substeps=3, sor_omega=1.7,
                     gravity=(0.0, -5.0, 0.0))
    path = str(tmp_path / "p.json")
    params_to_json(p, path)
    q = params_from_json(path)
    assert q == p


def test_params_json_rejects_unknown():
    import pytest

    with pytest.raises(ValueError):
        params_from_json('{"not_a_field": 1}')


def test_tree_helpers():
    eng = Engine(meshes.single_tet(), SolverParams())
    nbytes = tree_bytes(eng.state)
    # 3 x (4,3) f32 + (4,) f32 + lambdas
    assert nbytes >= 4 * 3 * 4 * 3
    s = tree_summary(eng.state)
    assert "float32" in s and "total:" in s


def test_switch_params_preserves_state():
    """Mode migration mid-run (the CPU<->GPU switch analog): state carries
    over, solver config changes take effect."""
    topo = meshes.tet_cube(2, 2, 2, size=0.5, center=(0.0, 1.0, 0.0))
    eng = Engine(topo, SolverParams(dialect="xpbd", substeps=2,
                                    iterations=6))
    eng.run(30, DT)
    x_mid = eng.positions()
    v_mid = eng.velocities()

    # switch dialect: positions/velocities must be continuous
    eng.switch_params(SolverParams(dialect="jacobi", substeps=2,
                                   iterations=6, use_pallas="off"))
    np.testing.assert_array_equal(eng.positions(), x_mid)
    np.testing.assert_array_equal(eng.velocities(), v_mid)
    eng.run(30, DT)
    pos = eng.positions()
    assert np.isfinite(pos).all()
    # still respects ground under the new dialect (radius 0.02)
    assert pos[:, 1].min() > -1e-3


def test_switch_backend_midrun_continuity():
    topo = meshes.tet_cube(2, 2, 2, size=0.5, center=(0.0, 0.8, 0.0))
    base = SolverParams(dialect="xpbd")
    a = Engine(topo, base.replace(xpbd_backend="scatter"))
    b = Engine(topo, base.replace(xpbd_backend="scatter"))
    for _ in range(20):
        a.step(DT)
        b.step(DT)
    b.switch_params(base.replace(xpbd_backend="gather"))
    for _ in range(20):
        a.step(DT)
        b.step(DT)
    np.testing.assert_allclose(a.positions(), b.positions(), atol=1e-5)


def test_engine_carry_persistent_matches_step_n():
    """The carry-persistent Engine path (pack once, run_carry chunks, lazy
    public state) must produce exactly the trajectory of the one-call
    step_n program, and mid-run positions()/state access must not perturb
    it (unpack does not donate the carry)."""
    from softbodysim_tpu.core.state import init_state

    topo = meshes.tet_cube(5, 5, 5, size=0.5, center=(0.0, 0.8, 0.0))
    params = SolverParams(dialect="xpbd", substeps=2, iterations=2,
                          xpbd_backend="pallas")
    eng = Engine(topo, params)
    assert hasattr(eng._raw_step, "run_carry")

    st = init_state(topo)
    st = eng._raw_step.step_n(st, DT, 40)

    eng.run(32, DT)                      # one chunk on the carry
    mid = eng.positions()                # row-gather readback, keeps carry
    assert np.isfinite(mid).all()
    _ = eng.state                        # full materialization, keeps carry
    eng.run(8, DT)                       # remainder via n=1 carry program
    np.testing.assert_array_equal(eng.positions(), np.asarray(st.x))
    np.testing.assert_array_equal(np.asarray(eng.state.v), np.asarray(st.v))
    np.testing.assert_array_equal(np.asarray(eng.state.edge_lambda),
                                  np.asarray(st.edge_lambda))

    # setting state drops the carry; stepping resumes from the new state
    eng.state = init_state(topo)
    assert eng._carry is None
    eng.step(DT)
    assert np.isfinite(eng.positions()).all()


def test_engine_carry_persistent_jacobi_matches_step_n():
    """Same carry-persistent contract for the jacobi Pallas backend (its
    carry is just the (x8, v-rows) pair -- no lambda state)."""
    from softbodysim_tpu.core.state import init_state

    topo = meshes.tet_cube(5, 5, 5, size=0.5, center=(0.0, 0.8, 0.0))
    params = SolverParams(dialect="jacobi", substeps=2, iterations=2,
                          jacobi_backend="pallas", use_pallas="off")
    eng = Engine(topo, params)
    assert hasattr(eng._raw_step, "run_carry")

    # the jacobi dialect defaults to density-lumped inverse masses
    st = init_state(topo, inv_mass_mode="density")
    st = eng._raw_step.step_n(st, DT, 40)

    eng.run(32, DT)                      # one chunk on the carry
    mid = eng.positions()                # row-gather readback, keeps carry
    assert np.isfinite(mid).all()
    _ = eng.state                        # full materialization, keeps carry
    eng.run(8, DT)                       # remainder via n=1 carry program
    np.testing.assert_array_equal(eng.positions(), np.asarray(st.x))
    np.testing.assert_array_equal(np.asarray(eng.state.v), np.asarray(st.v))
