"""Grouped execution for the Jacobi Pallas passes (kernels/jacobi.py).

The pass kernels share the SuperPlan packing with the XPBD sweeps, so a
regrouped plan (sweep.regroup_plan) reaches them too.  Unlike the sweeps
the pass is a single gather+apply stage with a (delta, cnt) accumulator:
grouping splits it into one trimmed kernel per execution group, threading
the accumulator table through the sequence (group 0 zeroes, last group
applies the epilogue).  Jacobi reads one frozen snapshot, so block order
never matters physically -- the grouped chain must reproduce the single
full-config kernel on the same permuted plan up to fp reassociation: the
v7 ragged grouped kernels unroll per-slot-position layer profiles, so
XLA compiles a different (shorter) op sequence than the dense ungrouped
kernel and sums can associate differently at the ULP level.  The
contribution MAPPING stays exact (the cnt accumulator row is integral
and bit-identical -- verified while landing v7); positions agree to
~1e-6.

Step counts are small: interpret-mode pallas is ~seconds per sim step
(see test_jacobi_pallas.py docstring).
"""

import dataclasses
import functools

import numpy as np
import jax.numpy as jnp
import pytest

from softbodysim_tpu.core import meshes
from softbodysim_tpu.kernels import sweep as sw
from softbodysim_tpu.kernels.jacobi import make_jacobi_pass

from oracle import JacobiOracle

DT = 1.0 / 60.0


def _plan_for(topo, family):
    V = topo.num_particles
    nwin = -(-V // sw.LANES)
    if family == "edge":
        cons, rest, lcap = topo.edges, topo.edge_rest, 2
    else:
        cons, rest, lcap = topo.tets, topo.tet_rest_vol, 3
    plan = sw.pack_superblocks(np.asarray(cons, np.int64), rest, nwin,
                               slots_cap=8, layer_cap=lcap)
    return plan, nwin


@pytest.mark.parametrize("family", ["edge", "tet"])
def test_grouped_jacobi_pass_matches_ungrouped(family):
    topo = meshes.tet_cube(15, 15, 15, size=1.0, center=(0.0, 2.0, 0.0))
    plan, nwin = _plan_for(topo, family)
    g = sw.regroup_plan(plan, min_blocks=1)
    if g.groups is None:
        pytest.skip("regroup declined (uniform occupancy)")
    ung = dataclasses.replace(g, groups=None)   # same order, one kernel

    p_g = make_jacobi_pass(g, nwin, interpret=True)
    p_u = make_jacobi_pass(ung, nwin, interpret=True)
    assert p_g.grouped and not p_u.grouped
    assert isinstance(p_g.tables, tuple) and len(p_g.tables) == len(g.groups)

    V = topo.num_particles
    vpad = nwin * sw.LANES
    rng = np.random.default_rng(0)
    x8 = np.zeros((8, vpad), np.float32)
    x8[0:3, :V] = rng.random((3, V), np.float32)
    x8[3, :V] = 1.0
    x8g = x8u = jnp.asarray(x8)
    k = jnp.float32(0.7)
    om = jnp.float32(1.4)
    for _ in range(2):
        x8g = p_g(x8g, k, om, p_g.fill_w(x8g, p_g.tables))
        x8u = p_u(x8u, k, om, p_u.fill_w(x8u, p_u.tables))
    # rows 3-7 (masses + passthrough) stay bit-exact; positions agree up
    # to reassociation noise (module docstring).
    g_np, u_np = np.asarray(x8g), np.asarray(x8u)
    assert np.array_equal(g_np[3:], u_np[3:])
    np.testing.assert_allclose(g_np[0:3], u_np[0:3], rtol=1e-6, atol=1e-6)


def test_grouped_full_step_matches_oracle(monkeypatch):
    """Full jacobi Pallas step with grouping FORCED (min_blocks=1) on a
    mesh small enough for interpret mode: the grouped accumulator chain
    must keep exact-oracle parity like the ungrouped path (same contract
    as test_jacobi_pallas.py)."""
    from softbodysim_tpu import SolverParams
    from softbodysim_tpu.core.state import init_state
    from softbodysim_tpu.solver.jacobi_pallas import make_jacobi_pallas_step

    monkeypatch.setattr(
        sw, "regroup_plan", functools.partial(sw.regroup_plan, min_blocks=1))

    topo = meshes.tet_cube(12, 12, 12, size=1.0, center=(0.0, 0.8, 0.0))
    params = SolverParams(dialect="jacobi", substeps=1, iterations=2,
                          edge_stiffness=0.9, volume_stiffness=0.98,
                          sor_omega=1.4, particle_radius=0.02,
                          jacobi_backend="pallas", use_pallas="off")
    step = make_jacobi_pallas_step(topo, params, interpret=True)

    from softbodysim_tpu.solver.xpbd_pallas import _cached_plans
    _, _, _, e_plan, t_plan = _cached_plans(topo, "auto", None, None, True)
    if not any(p is not None and getattr(p, "groups", None)
               for p in (e_plan, t_plan)):
        pytest.skip("regroup declined on this mesh (uniform occupancy)")

    state = init_state(topo)
    oracle = JacobiOracle(topo, params)
    oracle.w = np.asarray(state.inv_mass).copy()
    for _ in range(6):
        state = step(state, DT)
        oracle.step(DT)
    np.testing.assert_allclose(np.asarray(state.x), oracle.x, atol=2e-4)
