"""Self / surface collision on the multi-chip sharded steps.

The spatial-hash stages are GLOBAL (contact candidates can live on any
device), so round 2 rejected the flags on every sharded backend.  Round 3
lifts them:

- constraint-sharded modes (``make_mesh_sharded_step``,
  ``make_xpbd_sharded_step``) replicate positions along the model axis, so
  the stages run replicated -- bitwise the single-device stage;
- vertex-sharded modes (``make_vertex_sharded_step``,
  ``make_xpbd_vertex_sharded_step``) all-gather positions and evaluate only
  the device's OWN row slice against the global hash
  (solver/global_stages.py); the union of own-slice hit sets over devices
  equals the single-device hit set, so trajectories match up to fp32
  summation order.

Reference behavior: the C++ server clamps only against the ground plane
(CProgram/src/Sim.cpp:208-213); these stages are framework extensions and
the contract tested here is self-consistency with the single-device
backends.
"""

import numpy as np
import jax
import pytest

from softbodysim_tpu import Engine, SolverParams
from softbodysim_tpu.core import meshes
from softbodysim_tpu.core.adjacency import combine_topologies
from softbodysim_tpu.parallel import (
    BatchedEngine, init_batch_state, make_data_parallel_step, make_mesh,
    make_mesh_sharded_step, make_vertex_sharded_step, make_xpbd_sharded_step,
    make_xpbd_vertex_sharded_step, shard_batch)

DT = 1.0 / 60.0

# two slightly-overlapping balls: surface contact fires immediately,
# self-collision (particle-particle) fires as they settle under gravity
_COLL = dict(
    particle_radius=0.04,
    self_collision=True, self_collision_cell=0.1,
    self_collision_max_per_cell=32,
    surface_collision=True, surface_thickness=0.03,
    surface_collision_max_per_cell=16,
)


@pytest.fixture(scope="module")
def topo():
    a = meshes.tet_ball(1, 0.22, (0.0, 0.35, 0.0))
    b = meshes.tet_ball(1, 0.22, (0.40, 0.42, 0.0))
    merged, _ = combine_topologies([a, b])
    return merged


def _run_ref(topo, params, steps, inv_mass_mode="density"):
    ref = Engine(topo, params, inv_mass_mode=inv_mass_mode)
    for _ in range(steps):
        ref.step(DT)
    return ref


def _assert_stage_fired(topo, params, pos, steps, inv_mass_mode="density"):
    off = _run_ref(
        topo, params.replace(self_collision=False, surface_collision=False),
        steps, inv_mass_mode)
    assert np.abs(pos - off.positions()).max() > 1e-3


def test_mesh_sharded_collision_matches_single(topo):
    """Constraint-sharded jacobi (replicated stage) vs BatchedEngine."""
    params = SolverParams(dialect="jacobi", substeps=1, iterations=3,
                          use_pallas="off", **_COLL)
    mesh = make_mesh(shape=(4, 2))
    step = jax.jit(make_mesh_sharded_step(topo, params, mesh))
    state = init_batch_state(topo, 4, inv_mass_mode="density")
    state = shard_batch(state, mesh, axis="data")

    ref = BatchedEngine(topo, params, batch=4)
    for _ in range(15):
        state = step(state, DT)
        ref.step(DT)
    np.testing.assert_allclose(np.asarray(state.x), ref.positions(),
                               atol=1e-5)
    single = Engine(topo, params, inv_mass_mode="density")
    for _ in range(15):
        single.step(DT)
    _assert_stage_fired(topo, params, single.positions(), 15)


def test_xpbd_sharded_collision_matches_single(topo):
    """Constraint-sharded xpbd (replicated stage) vs single-device Engine."""
    params = SolverParams(dialect="xpbd", substeps=2, iterations=3, **_COLL)
    mesh = make_mesh(shape=(2, 4))
    step = make_xpbd_sharded_step(topo, params, mesh)
    state = step.build_state(batch=2)
    jstep = jax.jit(step)

    ref = _run_ref(topo, params, 15, inv_mass_mode="tet")
    for _ in range(15):
        state = jstep(state, DT)
    xs = np.asarray(state.x)
    for b in range(2):
        np.testing.assert_allclose(xs[b], ref.positions(), atol=1e-5)
    _assert_stage_fired(topo, params, ref.positions(), 15, "tet")


def test_vertex_sharded_collision_matches_single(topo):
    """Vertex-sharded jacobi: own-slice hash queries over the all-gathered
    table must reproduce the single-device trajectory."""
    params = SolverParams(dialect="jacobi", substeps=1, iterations=3,
                          use_pallas="off", **_COLL)
    mesh = make_mesh(shape=(8,), axis_names=("model",))
    step = make_vertex_sharded_step(topo, params, mesh)
    st = step.build_state()
    jstep = jax.jit(step)

    ref = _run_ref(topo, params, 15)
    for _ in range(15):
        st = jstep(st, DT)
    np.testing.assert_allclose(step.unpad(st[0]), ref.positions(),
                               atol=2e-5)


def test_xpbd_vertex_sharded_collision_matches_single(topo):
    """XPBD vertex sharding with halo exchange + own-slice hash stages."""
    from softbodysim_tpu.core.state import init_state

    params = SolverParams(dialect="xpbd", substeps=2, iterations=3, **_COLL)
    mesh = make_mesh(shape=(8,), axis_names=("model",))
    step = make_xpbd_vertex_sharded_step(topo, params, mesh, axis="model")
    state = init_state(topo, inv_mass_mode="tet")
    jstep = jax.jit(step)

    ref = _run_ref(topo, params, 15, inv_mass_mode="tet")
    for _ in range(15):
        state = jstep(state, DT)
    np.testing.assert_allclose(np.asarray(state.x), ref.positions(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(state.edge_lambda),
                               np.asarray(ref.state.edge_lambda), atol=1e-4)


def test_data_parallel_collision(topo):
    """Batch-axis sharding wraps the single-device step, so the stages ride
    along unchanged -- guard that the wrapper doesn't reject them."""
    params = SolverParams(dialect="jacobi", substeps=1, iterations=3,
                          use_pallas="off", **_COLL)
    mesh = make_mesh(shape=(8,), axis_names=("data",))
    step = jax.jit(make_data_parallel_step(topo, params, mesh, axis="data"))
    state = init_batch_state(topo, 8, inv_mass_mode="density")
    state = shard_batch(state, mesh, axis="data")
    ref = BatchedEngine(topo, params, batch=8)
    for _ in range(10):
        state = step(state, DT)
        ref.step(DT)
    np.testing.assert_allclose(np.asarray(state.x), ref.positions(),
                               atol=1e-5)
