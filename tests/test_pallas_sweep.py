"""Pallas sweep backend (interpret mode on CPU) vs the block-synchronous
NumPy oracle -- the trace-parity contract for kernels/sweep.py.

Interpret-mode compiles are ~20 s each, so steps are jitted and shared
between tests via a module-level cache.
"""

import functools

import numpy as np
import pytest
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
def _setup(which, vertex_order="auto"):
    if which == "cube4":
        topo = meshes.tet_cube(4, 4, 4, size=0.5, center=(0.0, 0.6, 0.0))
        params = SolverParams(dialect="xpbd", substeps=2, iterations=4)
    elif which == "cube7":
        # V=343 -> 3 windows: exercises multi-slot blocks
        topo = meshes.tet_cube(7, 7, 7, size=1.0, center=(0.0, 0.8, 0.0))
        params = SolverParams(dialect="xpbd", substeps=1, iterations=2)
    elif which == "cloth":
        topo, _pinned = meshes.cloth_patch(6, 6)
        params = SolverParams(dialect="xpbd", substeps=2, iterations=4)
    else:
        raise KeyError(which)
    step = make_xpbd_pallas_step(topo, params, interpret=True,
                                 vertex_order=vertex_order)
    jitted = jax.jit(lambda s: step(s, DT))
    return topo, params, step, jitted


def run_pair(which, steps, pinned=None):
    topo, params, step, jitted = _setup(which)
    state = init_state(topo, pinned=pinned)
    oracle = XpbdOracle(topo, params, pinned=pinned)
    oracle.w = np.asarray(state.inv_mass).copy()  # incl. cloth uniform mass
    eb = _blocks(step.block_order["edges"])
    tb = _blocks(step.block_order["tets"])
    for _ in range(steps):
        state = jitted(state)
        # mirror whatever in-block scheme the step resolved to (the tuned
        # split defaults since round 4a)
        oracle.step_blocks(DT, edge_blocks=eb, tet_blocks=tb,
                           **step.block_scheme)
    return state, oracle


def test_packing_covers_all_constraints():
    topo = meshes.tet_cube(5, 5, 5)
    for cons, rest in ((topo.edges, topo.edge_rest),
                       (topo.tets, topo.tet_rest_vol)):
        plan = sw.pack_constraints(cons.astype(np.int64), rest,
                                   -(-topo.num_particles // 128))
        ids = plan.perm[plan.perm >= 0]
        assert len(ids) == len(cons)
        assert len(np.unique(ids)) == len(cons)
        assert np.array_equal(np.sort(plan.pos_of), np.sort(
            np.flatnonzero(plan.perm >= 0)))
        # vertex-multiplicity per (block, window, lane) respects dmax
        assert plan.dmax <= 3


def test_cube_drop_matches_block_oracle():
    # pre-contact horizon: tight parity (the 1e-4 contract)
    state, oracle = run_pair("cube4", steps=10)
    np.testing.assert_allclose(np.asarray(state.x), oracle.x, atol=1e-4)
    np.testing.assert_allclose(np.asarray(state.v), oracle.v, atol=1e-3)
    np.testing.assert_allclose(np.asarray(state.edge_lambda),
                               oracle.edge_lambda, atol=1e-4)
    np.testing.assert_allclose(np.asarray(state.tet_lambda),
                               oracle.tet_lambda, atol=1e-4)


def test_cube_drop_long_horizon_stays_close():
    # through ground contact, fp reduce-tree differences amplify chaotically;
    # the trajectories must still track each other closely and stay sane
    state, oracle = run_pair("cube4", steps=40)
    np.testing.assert_allclose(np.asarray(state.x), oracle.x, atol=1e-2)
    assert np.abs(np.asarray(state.x) - oracle.x).mean() < 1e-3
    assert np.asarray(state.x)[:, 1].min() > -1e-4


def test_multi_window_mesh_matches_block_oracle():
    state, oracle = run_pair("cube7", steps=8)
    np.testing.assert_allclose(np.asarray(state.x), oracle.x, atol=1e-4)


def test_pinned_vertices_hold():
    topo, params, step, jitted = _setup("cube4")
    pinned = [0, 1, 2]
    state, oracle = run_pair("cube4", steps=10, pinned=pinned)
    x = np.asarray(state.x)
    np.testing.assert_allclose(x[pinned], topo.vertices[pinned], atol=1e-6)
    np.testing.assert_allclose(x, oracle.x, atol=1e-4)


def test_edges_only_cloth():
    state, oracle = run_pair("cloth", steps=25)
    np.testing.assert_allclose(np.asarray(state.x), oracle.x, atol=1e-4)


def test_step_n_equals_repeated_step():
    topo, params, step, jitted = _setup("cube4")
    s_loop = init_state(topo)
    for _ in range(5):
        s_loop = jitted(s_loop)
    s_n = jax.jit(lambda s: step.step_n(s, DT, 5))(init_state(topo))
    np.testing.assert_allclose(np.asarray(s_n.x), np.asarray(s_loop.x),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_n.edge_lambda),
                               np.asarray(s_loop.edge_lambda), atol=1e-6)


def test_morton_order_agrees_physically():
    # different block order -> different fp path, same physics
    _, _, _, jit_nat = _setup("cube7", "natural")
    _, _, _, jit_mor = _setup("cube7", "morton")
    outs = []
    for jitted in (jit_nat, jit_mor):
        topo, _, _, _ = _setup("cube7")
        state = init_state(topo)
        for _ in range(15):
            state = jitted(state)
        outs.append(np.asarray(state.x))
    assert np.isfinite(outs[0]).all() and np.isfinite(outs[1]).all()
    assert np.abs(outs[0] - outs[1]).max() < 5e-2
    assert np.abs(outs[0].mean(0) - outs[1].mean(0)).max() < 1e-3


def test_per_constraint_compliance_identity():
    """PERA tables equal to the scalar compliance reproduce the scalar
    path EXACTLY (same packing, alpha_i = c_i/dt^2 with c_i uniform)."""
    topo = meshes.tet_cube(3, 3, 3, size=0.5, center=(0.0, 0.4, 0.0))
    params = SolverParams(dialect="xpbd", substeps=1, iterations=3,
                          edge_compliance=5e-4, volume_compliance=1e-5)
    a = make_xpbd_pallas_step(topo, params, interpret=True)
    b = make_xpbd_pallas_step(
        topo, params, interpret=True,
        edge_c=np.full(topo.num_edges, 5e-4, np.float32),
        tet_c=np.full(topo.num_tets, 1e-5, np.float32))
    sa = init_state(topo)
    sb = init_state(topo)
    for _ in range(6):
        sa = a(sa, DT)
        sb = b(sb, DT)
    np.testing.assert_allclose(np.asarray(sb.x), np.asarray(sa.x),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(sb.edge_lambda),
                               np.asarray(sa.edge_lambda), atol=1e-7)


def test_merged_xpbd_mixed_compliance_behaves():
    """An xpbd merged scene with per-body compliance: the compliant body
    sags measurably more than the near-rigid one under gravity."""
    from softbodysim_tpu.api.scenes import Scene

    t1 = meshes.tet_cube(3, 3, 2, size=0.5, center=(-0.6, 0.4, 0.0))
    t2 = meshes.tet_cube(3, 3, 2, size=0.5, center=(0.6, 0.4, 0.0))
    pa = SolverParams(dialect="xpbd", substeps=1, iterations=3,
                      edge_compliance=0.0, volume_compliance=0.0)
    pb = pa.replace(edge_compliance=0.05, volume_compliance=0.05)
    scene = Scene(name="xmix", colliders=[],
                  bodies=[("rigid", t1, pa, {}), ("soft", t2, pb, {})])
    eng, voffs = scene.build_merged()
    eng.run(20, DT)
    pos = eng.positions()
    assert np.isfinite(pos).all()

    def squash(sl, topo):
        h0 = topo.vertices[:, 1].max() - topo.vertices[:, 1].min()
        h = pos[sl, 1].max() - pos[sl, 1].min()
        return h0 - h

    s_rigid = squash(slice(voffs[0], voffs[1]), t1)
    s_soft = squash(slice(voffs[1], voffs[2]), t2)
    assert s_soft > s_rigid + 1e-3


def test_split_scheme_matches_block_oracle():
    """Mass-splitting scheme (+ omega + local re-iterations): the kernels
    match the oracle replay with the same scheme kwargs.  Covers the
    count-table fill (c_i * w_i denominators), the target-side-w tet
    apply, and lambda accumulation across K in-block revisits."""
    topo = meshes.tet_cube(4, 4, 4, size=0.5, center=(0.0, 0.6, 0.0))
    params = SolverParams(dialect="xpbd", substeps=2, iterations=3,
                          volume_compliance=1e-5,
                          xpbd_block_scheme="split", xpbd_block_omega=1.5,
                          xpbd_block_local_iters=2)
    step = make_xpbd_pallas_step(topo, params, interpret=True)
    assert step.block_scheme == {"scheme": ("split", "split"),
                                 "omega": (1.5, 1.5),
                                 "local_iters": (2, 2)}
    jitted = jax.jit(lambda s: step(s, DT))
    state = init_state(topo)
    oracle = XpbdOracle(topo, params)
    eb = _blocks(step.block_order["edges"])
    tb = _blocks(step.block_order["tets"])
    for _ in range(8):
        state = jitted(state)
        oracle.step_blocks(DT, edge_blocks=eb, tet_blocks=tb,
                           scheme="split", omega=1.5, local_iters=2)
    np.testing.assert_allclose(np.asarray(state.x), oracle.x, atol=1e-4)
    np.testing.assert_allclose(np.asarray(state.edge_lambda),
                               oracle.edge_lambda, atol=1e-4)
    np.testing.assert_allclose(np.asarray(state.tet_lambda),
                               oracle.tet_lambda, atol=1e-4)


def test_scale_scheme_matches_block_oracle():
    """The legacy scale scheme (explicit knob; all-ones count tables make
    the w-fill bit-identical to the pre-scheme kernels) still replays
    against the oracle -- the no-regression pin now that 'auto' resolves
    to the tuned split defaults (round 4a)."""
    topo = meshes.tet_cube(3, 3, 3, size=0.5, center=(0.0, 0.4, 0.0))
    params = SolverParams(dialect="xpbd", substeps=1, iterations=2,
                          xpbd_block_scheme="scale")
    step = make_xpbd_pallas_step(topo, params, interpret=True)
    assert step.block_scheme == {"scheme": ("scale", "scale"),
                                 "omega": (1.0, 1.0),
                                 "local_iters": (1, 1)}
    jitted = jax.jit(lambda s: step(s, DT))
    state = init_state(topo)
    oracle = XpbdOracle(topo, params)
    eb = _blocks(step.block_order["edges"])
    tb = _blocks(step.block_order["tets"])
    for _ in range(5):
        state = jitted(state)
        oracle.step_blocks(DT, edge_blocks=eb, tet_blocks=tb)
    np.testing.assert_allclose(np.asarray(state.x), oracle.x, atol=1e-4)


def test_auto_resolves_to_tuned_split():
    topo = meshes.tet_cube(3, 3, 3, size=0.5, center=(0.0, 0.4, 0.0))
    step = make_xpbd_pallas_step(
        topo, SolverParams(dialect="xpbd"), interpret=True)
    assert step.block_scheme == {"scheme": ("split", "split"),
                                 "omega": (1.5, 2.2),
                                 "local_iters": (1, 1)}


def test_legacy_superblocks_off_auto_resolves_to_scale():
    """superblocks=False (legacy 128-constraint SweepPlan kernels) with
    DEFAULT params must keep working: 'auto' resolves to the scale
    scheme there, since the legacy kernels reject split/omega/revisits
    (round-4 ADVICE medium).  Explicit split still raises."""
    topo = meshes.tet_cube(3, 3, 3, size=0.5, center=(0.0, 0.4, 0.0))
    params = SolverParams(dialect="xpbd", substeps=1, iterations=2)
    step = make_xpbd_pallas_step(topo, params, interpret=True,
                                 superblocks=False)
    assert step.block_scheme == {"scheme": ("scale", "scale"),
                                 "omega": (1.0, 1.0),
                                 "local_iters": (1, 1)}
    jitted = jax.jit(lambda s: step(s, DT))
    state = init_state(topo)
    oracle = XpbdOracle(topo, params)
    eb = _blocks(step.block_order["edges"])
    tb = _blocks(step.block_order["tets"])
    for _ in range(3):
        state = jitted(state)
        oracle.step_blocks(DT, edge_blocks=eb, tet_blocks=tb)
    np.testing.assert_allclose(np.asarray(state.x), oracle.x, atol=1e-4)
    with pytest.raises(ValueError):
        make_xpbd_pallas_step(
            topo, params.replace(xpbd_block_scheme="split"),
            interpret=True, superblocks=False)


def test_bf16_x_table_tolerance_bound():
    """Opt-in bf16 x-table (the flat-path VMEM capacity option, PLAN.md
    round 4d): compute stays f32, only the working position table
    rounds, so the trajectory must track the f32 path within a bf16
    quantization bound while remaining physically sane."""
    topo = meshes.tet_cube(4, 4, 4, size=0.5, center=(0.0, 0.6, 0.0))
    params = SolverParams(dialect="xpbd", substeps=2, iterations=3)
    a = make_xpbd_pallas_step(topo, params, interpret=True)
    b = make_xpbd_pallas_step(
        topo, params.replace(xpbd_x_dtype="bfloat16"), interpret=True)
    sa = init_state(topo)
    sb = init_state(topo)
    for _ in range(6):
        sa = a(sa, DT)
        sb = b(sb, DT)
    xa, xb = np.asarray(sa.x), np.asarray(sb.x)
    assert np.isfinite(xb).all()
    # bf16 rounds positions at ~0.4% relative per substep commit; over
    # 6 steps x 2 substeps the deviation stays in the few-mm class on a
    # ~1 m scene -- loose physical bound, NOT parity
    assert np.abs(xb - xa).max() < 0.05
    # and the quantization is actually present (bf16 really engaged)
    assert np.abs(xb - xa).max() > 1e-7


def test_bf16_rejects_segmented():
    topo = meshes.tet_cube(3, 3, 3, size=0.5)
    with pytest.raises(ValueError):
        make_xpbd_pallas_step(
            topo, SolverParams(dialect="xpbd",
                               xpbd_x_dtype="bfloat16"),
            interpret=True, seg_windows=2)
