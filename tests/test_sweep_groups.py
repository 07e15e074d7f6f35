"""Grouped sweep execution (kernels/sweep.py::regroup_plan).

The branchless super-block kernels pay full (nslots x dmax) work per block;
regroup_plan sorts blocks by their actual required (slots, layers) and
partitions them into <=3 contiguous runs so make_sweep can build one trimmed
kernel per run.  The contract under test:

1. regroup_plan preserves the packed schedule exactly (same constraints,
   same per-lane scale/rest, consistent perm/pos_of) -- only block ORDER
   changes, and every block lands in a group whose (S_g, D_g) dominates its
   needs.
2. Grouped execution reproduces the single full-config kernel on the same
   (permuted) plan: the groups thread x8 sequentially in block order,
   which is exactly the block-synchronous GS sequence.  Since v7 the
   grouped kernels are RAGGED (per-slot layer profiles), a different
   static op sequence -- XLA may associate the sums differently at the
   ULP level, so the contract is exact mapping + 1e-6 values (see the
   note on the test).

Block order itself is allowed to change vs the ungrouped pack (same class of
reordering as the coloring/packing choices; the oracle replays whatever the
plan says via plan.perm).
"""

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from softbodysim_tpu.core import meshes
from softbodysim_tpu.kernels import sweep as sw


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


@pytest.mark.quick
@pytest.mark.parametrize("family", ["edge", "tet"])
def test_regroup_preserves_schedule(family):
    topo = meshes.tet_cube(15, 15, 15, size=1.0, center=(0.0, 2.0, 0.0))
    plan, _ = _plan_for(topo, family)
    g = sw.regroup_plan(plan, min_blocks=1)
    if g.groups is None:
        pytest.skip("regroup declined (uniform occupancy)")

    nb, S, D = plan.num_super, plan.nslots, plan.dmax
    assert sum(n for n, _, _ in g.groups) == nb
    # same constraint set, consistent inverse map
    valid = g.perm >= 0
    assert np.array_equal(np.sort(g.perm[valid]), np.sort(
        plan.perm[plan.perm >= 0]))
    assert np.array_equal(g.pos_of[g.perm[valid]], np.flatnonzero(valid))
    # per-lane data permuted with the constraints
    for fld in ("rest", "scale"):
        a = getattr(plan, fld).reshape(-1)[plan.perm >= 0]
        b = getattr(g, fld).reshape(-1)[valid]
        ia = np.argsort(plan.perm[plan.perm >= 0])
        ib = np.argsort(g.perm[valid])
        assert np.array_equal(a[ia], b[ib])
    # every block's needs dominated by its group's config
    occ = g.inv.reshape(nb, S, D, 8, sw.LANES) >= 0
    lay = occ.any(axis=(1, 3, 4))
    d_used = np.where(lay.any(axis=1), D - np.argmax(lay[:, ::-1], axis=1), 1)
    s_cnt = np.maximum(g.slots[:, S], 1)
    b0 = 0
    for nbg, Sg, Dg in g.groups:
        assert nbg % sw.SUBBLOCKS == 0 or len(g.groups) == 1
        assert (s_cnt[b0:b0 + nbg] <= Sg).all()
        assert (d_used[b0:b0 + nbg] <= Dg).all()
        b0 += nbg


@pytest.mark.parametrize("family", ["edge", "tet"])
def test_grouped_sweep_matches_ungrouped(family):
    # NOTE on tolerance: the v7 ragged grouped kernels unroll per-slot
    # layer profiles, so XLA compiles a different (shorter) op sequence
    # than the dense ungrouped kernel and sums MAY associate differently
    # at the ULP level (observed on the jacobi twin of this test,
    # test_jacobi_groups.py).  The mapping is exact; allow reassociation
    # noise on positions/lambdas, keep rows 3-7 (masses/passthrough)
    # bit-exact.
    topo = meshes.tet_cube(15, 15, 15, size=1.0, center=(0.0, 2.0, 0.0))
    plan, nwin = _plan_for(topo, family)
    g = sw.regroup_plan(plan, min_blocks=1)
    if g.groups is None:
        pytest.skip("regroup declined (uniform occupancy)")
    ung = dataclasses.replace(g, groups=None)   # same order, one kernel

    s_g = sw.make_sweep(g, nwin, interpret=True)
    s_u = sw.make_sweep(ung, nwin, interpret=True)
    assert s_g.grouped and not s_u.grouped

    V = topo.num_particles
    vpad = nwin * sw.LANES
    rng = np.random.default_rng(0)
    x8 = np.zeros((8, vpad), np.float32)
    x8[0:3, :V] = rng.random((3, V), np.float32)
    x8[3, :V] = 1.0
    x8g = x8u = jnp.asarray(x8)
    lam_u = jnp.zeros((sw.lam_rows(g), sw.LANES), jnp.float32)
    lam_g = sw.split_lambda(g, lam_u)
    assert isinstance(lam_g, tuple) and len(lam_g) == len(g.groups)
    alpha = jnp.float32(1e-4)
    tabs_g = s_g.fill_w(x8g, s_g.tables)   # v7 streamed-w prologue
    tabs_u = s_u.fill_w(x8u, s_u.tables)
    for _ in range(2):
        x8g, lam_g = s_g(x8g, lam_g, alpha, tabs_g)
        x8u, lam_u = s_u(x8u, lam_u, alpha, tabs_u)
    joined = sw.join_lambda(g, lam_g)
    g_np, u_np = np.asarray(x8g), np.asarray(x8u)
    assert np.array_equal(g_np[3:], u_np[3:])
    np.testing.assert_allclose(g_np[0:3], u_np[0:3], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(joined), np.asarray(lam_u),
                               rtol=1e-6, atol=1e-6)


def test_grouped_full_step_matches_block_oracle(monkeypatch):
    """Full xpbd_pallas step with grouping FORCED (min_blocks=1) on a mesh
    small enough for interpret mode: the split/join lambda boundary plumbing
    and the grouped sweeps must replay against the block oracle exactly like
    the ungrouped path (same 1e-4 contract as test_pallas_sweep)."""
    from softbodysim_tpu import SolverParams
    from softbodysim_tpu.core.state import init_state
    from softbodysim_tpu.solver import xpbd_pallas
    from oracle import XpbdOracle

    monkeypatch.setattr(
        sw, "regroup_plan",
        functools.partial(sw.regroup_plan.__wrapped__, min_blocks=1)
        if hasattr(sw.regroup_plan, "__wrapped__")
        else functools.partial(sw.regroup_plan, min_blocks=1))

    topo = meshes.tet_cube(12, 12, 12, size=1.0, center=(0.0, 0.8, 0.0))
    params = SolverParams(dialect="xpbd", substeps=1, iterations=2)
    step = xpbd_pallas.make_xpbd_pallas_step(topo, params, interpret=True)
    grouped = [p for p in (step.block_order["edges"], step.block_order["tets"])
               if p is not None and getattr(p, "groups", None)]
    if not grouped:
        pytest.skip("regroup declined on this mesh (uniform occupancy)")

    def blocks(plan):
        if plan is None:
            return []
        width = sw.block_width(plan)
        rows = plan.perm.reshape(-1, width)
        scl = plan.scale.reshape(-1, width)
        return [(r[r >= 0], s[r >= 0]) for r, s in zip(rows, scl)
                if (r >= 0).any()]

    dt = 1.0 / 60.0
    state = init_state(topo)
    oracle = XpbdOracle(topo, params)
    oracle.w = np.asarray(state.inv_mass).copy()
    eb = blocks(step.block_order["edges"])
    tb = blocks(step.block_order["tets"])
    jitted = jax.jit(lambda s: step(s, dt))
    for _ in range(6):
        state = jitted(state)
        oracle.step_blocks(dt, edge_blocks=eb, tet_blocks=tb,
                           **step.block_scheme)
    np.testing.assert_allclose(np.asarray(state.x), oracle.x, atol=1e-4)
    np.testing.assert_allclose(np.asarray(state.edge_lambda),
                               oracle.edge_lambda, atol=1e-4)
    np.testing.assert_allclose(np.asarray(state.tet_lambda),
                               oracle.tet_lambda, atol=1e-4)
