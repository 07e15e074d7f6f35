"""Primitive colliders on the sharded backends.

The primitive resolve is a per-particle stage (reference: per-particle
collider loop, SoftBodySolver.cs:554-561; GPU twin K_Collide), so on a
vertex-sharded step it runs purely locally on each device's own rows with
the collider PODs replicated -- zero extra collectives.  Contracts:

- vertex-sharded jacobi / xpbd (XLA): exact parity with the single-device
  Engine at 1e-5 (both modes preserve their ordering contracts);
- sharded jacobi Pallas: matches the single-device jacobi Pallas backend
  (sharding is not a dialect change);
- sharded xpbd Pallas at D=1: bit-class match of the single-chip sweep
  backend (no cross-device Jacobi at one device), plus a D=4 behavioral
  drop onto a box collider.
"""

import numpy as np
import pytest

import jax

from softbodysim_tpu import Engine, SolverParams
from softbodysim_tpu.collide.primitives import Colliders
from softbodysim_tpu.core import meshes
from softbodysim_tpu.core.state import init_state
from softbodysim_tpu.parallel import (
    make_mesh, make_vertex_sharded_step, make_xpbd_vertex_sharded_step)
from softbodysim_tpu.solver.jacobi_pallas import make_jacobi_pallas_step
from softbodysim_tpu.solver.jacobi_pallas_sharded import (
    make_jacobi_pallas_sharded_step)
from softbodysim_tpu.solver.xpbd_pallas import make_xpbd_pallas_step
from softbodysim_tpu.solver.xpbd_pallas_sharded import (
    make_xpbd_pallas_sharded_step)

from test_pallas_sharded import mesh_of

DT = 1.0 / 60.0


@pytest.fixture(scope="module")
def cols():
    return Colliders.build([
        Colliders.sphere((0.05, 0.18, 0.0), 0.2),
        Colliders.box((0.5, 0.1, 0.0), (0.15, 0.1, 0.15)),
    ])


@pytest.fixture(scope="module")
def topo():
    return meshes.tet_ball(1, 0.2, (0.0, 0.55, 0.0))


def test_vertex_sharded_jacobi_colliders(topo, cols):
    params = SolverParams(dialect="jacobi", substeps=1, iterations=3,
                          use_pallas="off")
    mesh = make_mesh(shape=(8,), axis_names=("model",))
    step = make_vertex_sharded_step(topo, params, mesh, colliders=cols)
    st = step.build_state()
    jstep = jax.jit(step)
    ref = Engine(topo, params, colliders=cols)
    for _ in range(20):
        st = jstep(st, DT)
        ref.step(DT)
    np.testing.assert_allclose(step.unpad(st[0]), ref.positions(),
                               atol=2e-5)
    # the collider actually held the ball up
    assert ref.positions()[:, 1].min() > 0.05


def test_xpbd_vertex_sharded_colliders(topo, cols):
    params = SolverParams(dialect="xpbd", substeps=2, iterations=3)
    mesh = make_mesh(shape=(8,), axis_names=("model",))
    step = make_xpbd_vertex_sharded_step(topo, params, mesh, axis="model",
                                         colliders=cols)
    state = init_state(topo, inv_mass_mode="tet")
    jstep = jax.jit(step)
    ref = Engine(topo, params, colliders=cols, inv_mass_mode="tet")
    for _ in range(20):
        state = jstep(state, DT)
        ref.step(DT)
    np.testing.assert_allclose(np.asarray(state.x), ref.positions(),
                               atol=2e-5)


def test_jacobi_pallas_sharded_colliders(topo, cols):
    params = SolverParams(dialect="jacobi", substeps=1, iterations=2,
                          jacobi_backend="pallas", use_pallas="off")
    mesh = mesh_of(4)
    sstep = make_jacobi_pallas_sharded_step(topo, params, mesh,
                                            interpret=True, colliders=cols)
    ref = make_jacobi_pallas_step(topo, params, interpret=True,
                                  colliders=cols)
    s_state = init_state(topo, inv_mass_mode="density")
    r_state = init_state(topo, inv_mass_mode="density")
    for _ in range(12):
        s_state = sstep(s_state, DT)
        r_state = ref(r_state, DT)
    np.testing.assert_allclose(np.asarray(s_state.x),
                               np.asarray(r_state.x), atol=1e-5)
    assert np.asarray(r_state.x)[:, 1].min() > 0.05


def test_xpbd_pallas_sharded_colliders_d1_exact(topo, cols):
    """At D=1 the sharded sweep dialect IS the single-chip dialect, so the
    collider wiring must match the single-device Pallas backend exactly."""
    params = SolverParams(dialect="xpbd", substeps=2, iterations=2)
    mesh = mesh_of(1)
    sstep = make_xpbd_pallas_sharded_step(topo, params, mesh,
                                          colliders=cols)
    ref = make_xpbd_pallas_step(topo, params, interpret=True,
                                colliders=cols)
    s_state = init_state(topo)
    r_state = init_state(topo)
    for _ in range(12):
        s_state = sstep(s_state, DT)
        r_state = ref(r_state, DT)
    np.testing.assert_allclose(np.asarray(s_state.x),
                               np.asarray(r_state.x), atol=1e-6)


def test_xpbd_pallas_sharded_colliders_d4_behavioral():
    """D=4: the ball comes to rest ON a wide box collider instead of
    falling through to the ground (a sphere support is unstable -- the
    ball rolls off; the box top is a stable platform)."""
    ball = meshes.tet_ball(1, 0.2, (0.0, 0.55, 0.0))
    box = Colliders.build([
        Colliders.box((0.0, 0.1, 0.0), (0.4, 0.1, 0.4))])
    params = SolverParams(dialect="xpbd", substeps=2, iterations=2)
    mesh = mesh_of(4)
    on = make_xpbd_pallas_sharded_step(ball, params, mesh, colliders=box)
    off = make_xpbd_pallas_sharded_step(ball, params, mesh)
    a = init_state(ball)
    b = init_state(ball)
    for _ in range(50):
        a = on(a, DT)
        b = off(b, DT)
    pa, pb = np.asarray(a.x), np.asarray(b.x)
    assert np.isfinite(pa).all()
    assert pa[:, 1].min() > 0.15          # resting on the box top (y=0.2)
    assert pb[:, 1].min() < 0.01          # control fell to the ground
