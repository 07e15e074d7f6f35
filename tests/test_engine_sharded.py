"""Engine(mesh=...): the sharded backends behind the single-device API.

A user switching from the reference drives a sharded scene exactly like a
single-chip one: ``Engine(topo, params, mesh=mesh)`` then step/run/
positions.  Contracts: parity with the single-device Engine for the exact
modes (xpbd colored GS, jacobi snapshot gather), correct dispatch of the
forced-Pallas backends, build-time colliders + update_colliders rebuild.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from softbodysim_tpu import Engine, SolverParams
from softbodysim_tpu.collide.primitives import Colliders
from softbodysim_tpu.core import meshes

DT = 1.0 / 60.0


def mesh_of(d):
    devs = jax.devices()[:d]
    if len(devs) < d:
        pytest.skip(f"needs {d} devices")
    return Mesh(np.asarray(devs), axis_names=("model",))


@pytest.fixture(scope="module")
def topo():
    return meshes.tet_ball(1, 0.25, (0.0, 0.6, 0.0))


def test_engine_mesh_xpbd_matches_single(topo):
    params = SolverParams(dialect="xpbd", substeps=2, iterations=3)
    a = Engine(topo, params, mesh=mesh_of(8))
    b = Engine(topo, params)
    a.run(20, DT)
    b.run(20, DT)
    np.testing.assert_allclose(a.positions(), b.positions(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(a.state.edge_lambda),
                               np.asarray(b.state.edge_lambda), atol=1e-4)


def test_engine_mesh_jacobi_matches_single(topo):
    params = SolverParams(dialect="jacobi", substeps=1, iterations=3,
                          use_pallas="off")
    a = Engine(topo, params, mesh=mesh_of(8))
    b = Engine(topo, params)
    a.run(20, DT)
    b.run(20, DT)
    np.testing.assert_allclose(a.positions(), b.positions(), atol=2e-5)


def test_engine_mesh_colliders_and_update(topo):
    cols = Colliders.build([Colliders.box((0.0, 0.1, 0.0),
                                          (0.4, 0.1, 0.4))])
    params = SolverParams(dialect="xpbd", substeps=2, iterations=3)
    a = Engine(topo, params, colliders=cols, mesh=mesh_of(8))
    b = Engine(topo, params, colliders=cols)
    a.run(30, DT)
    b.run(30, DT)
    np.testing.assert_allclose(a.positions(), b.positions(), atol=2e-5)
    assert a.positions()[:, 1].min() > 0.15    # resting on the box

    # moving the box down re-bakes the sharded step (documented recompile)
    moved = Colliders.build([Colliders.box((0.0, 0.0, 0.0),
                                           (0.4, 0.05, 0.4))])
    a.update_colliders(moved)
    b.update_colliders(moved)
    a.run(40, DT)
    b.run(40, DT)
    np.testing.assert_allclose(a.positions(), b.positions(), atol=5e-5)
    assert a.positions()[:, 1].min() < 0.12    # settled onto the lower box


def test_engine_mesh_dispatches_pallas(topo):
    """Forcing xpbd_backend='pallas' routes to the window-sharded sweep
    path (prejit, step_n) -- detectable via the step's shard_info."""
    params = SolverParams(dialect="xpbd", substeps=1, iterations=1,
                          xpbd_backend="pallas")
    eng = Engine(topo, params, mesh=mesh_of(2))
    assert hasattr(eng._raw_step, "shard_info")
    assert eng._raw_step.shard_info["D"] == 2
    eng.run(3, DT)
    assert np.isfinite(eng.positions()).all()
