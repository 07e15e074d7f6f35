"""Segmented Pallas execution (solver/xpbd_pallas.py, seg_windows) vs the
block-synchronous NumPy oracle.

Segmented execution lifts the flat path's single-chip VMEM ceiling
(~512k particles): windows split into contiguous segments, one trimmed
kernel chain per segment over (own + ghost windows), segments sequential.
Ghost windows are written back by REPLACEMENT, which makes the execution
bit-identical to a flat sweep over the concatenated block order -- so the
ordinary step_blocks oracle replay covers it with no new machinery.

Interpret-mode compiles are slow (~1 min/program); keep step counts small.
"""

import functools

import numpy as np
import jax

from softbodysim_tpu import SolverParams
from softbodysim_tpu.core import meshes
from softbodysim_tpu.core.state import init_state
from softbodysim_tpu.kernels import sweep as sw
from softbodysim_tpu.solver.xpbd_pallas import make_xpbd_pallas_step

from oracle import XpbdOracle

DT = 1.0 / 60.0


def _blocks(plan):
    if plan is None:
        return []
    width = sw.block_width(plan)
    rows = plan.perm.reshape(-1, width)
    scl = plan.scale.reshape(-1, width)
    return [(r[r >= 0], s[r >= 0]) for r, s in zip(rows, scl)
            if (r >= 0).any()]


@functools.lru_cache(maxsize=None)
def _setup():
    # V=343 -> 3 windows; seg_windows=1 -> 3 segments with real ghost lists
    topo = meshes.tet_cube(7, 7, 7, size=1.0, center=(0.0, 0.8, 0.0))
    params = SolverParams(dialect="xpbd", substeps=1, iterations=2)
    step = make_xpbd_pallas_step(topo, params, interpret=True,
                                 seg_windows=1)
    jitted = jax.jit(lambda s: step(s, DT))
    return topo, params, step, jitted


def test_seg_plan_partitions_all_constraints():
    topo, params, step, _ = _setup()
    for fam, n in (("edges", topo.num_edges), ("tets", topo.num_tets)):
        plan = step.block_order[fam]
        assert sw.block_width(plan) == 1024       # super-block granularity
        assert len(plan.segs) >= 2                # actually segmented
        assert any(s.ngw > 0 for s in plan.segs)  # ghost windows exercised
        ids = plan.perm[plan.perm >= 0]
        assert len(ids) == n
        assert len(np.unique(ids)) == n
        # pos_of is the inverse of perm on live entries
        live = np.flatnonzero(plan.perm >= 0)
        assert np.array_equal(np.sort(plan.pos_of), live)


def test_seg_matches_block_oracle():
    topo, params, step, jitted = _setup()
    state = init_state(topo)
    oracle = XpbdOracle(topo, params)
    oracle.w = np.asarray(state.inv_mass).copy()
    eb = _blocks(step.block_order["edges"])
    tb = _blocks(step.block_order["tets"])
    for _ in range(8):
        state = jitted(state)
        oracle.step_blocks(DT, edge_blocks=eb, tet_blocks=tb,
                           **step.block_scheme)
    np.testing.assert_allclose(np.asarray(state.x), oracle.x, atol=1e-4)
    np.testing.assert_allclose(np.asarray(state.v), oracle.v, atol=1e-3)
    np.testing.assert_allclose(np.asarray(state.edge_lambda),
                               oracle.edge_lambda, atol=1e-4)
    np.testing.assert_allclose(np.asarray(state.tet_lambda),
                               oracle.tet_lambda, atol=1e-4)


def test_seg_carry_api_round_trip():
    # pack -> run_carry(n) -> unpack == n x step (pack/unpack are exact
    # inverses, and run_carry runs the identical jitted substeps)
    topo, params, step, jitted = _setup()
    s_loop = init_state(topo)
    template = init_state(topo)
    carry = step.pack_state(template)
    for _ in range(3):
        s_loop = jitted(s_loop)
    carry = step.run_carry(carry, DT, 3)
    s_carry = step.unpack_state(carry, template)
    np.testing.assert_allclose(np.asarray(s_carry.x),
                               np.asarray(s_loop.x), atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_carry.edge_lambda),
                               np.asarray(s_loop.edge_lambda), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_carry.tet_lambda),
                               np.asarray(s_loop.tet_lambda), atol=1e-6)
    # carry_positions reads committed x without the lambda boundary
    np.testing.assert_allclose(np.asarray(step.carry_positions(carry)),
                               np.asarray(s_carry.x), atol=0)
