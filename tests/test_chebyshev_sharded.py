"""Chebyshev acceleration on the sharded jacobi backends.

The blend (solver/accel.py::chebyshev_scan) is elementwise on positions,
so every sharded jacobi loop must reproduce the single-device chebyshev
trajectory at 1e-5 on the virtual 8-device CPU mesh:

  mesh-sharded     -- constraint-parallel psum path (replicated blend);
  vertex-sharded   -- each device blends its own vertex slice;
  data-parallel    -- wraps the single-device step (free);
  pallas-sharded   -- x8-table row blend per window shard.

The xpbd dialect ignores the flag on every backend (single-device
solver/xpbd.py never reads it), so sharded xpbd+chebyshev must build and
run rather than raise -- the round-3 guard is gone.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from softbodysim_tpu import Engine, SolverParams
from softbodysim_tpu.core import meshes
from softbodysim_tpu.core.state import init_state
from softbodysim_tpu.parallel import (
    BatchedEngine, init_batch_state, make_mesh, make_mesh_sharded_step,
    make_sharded_step, make_vertex_sharded_step, shard_batch)

DT = 1.0 / 60.0


@pytest.fixture(scope="module")
def topo():
    return meshes.tet_cube(3, 3, 3, size=0.5, center=(0.0, 0.4, 0.0))


def _params(**kw):
    base = dict(dialect="jacobi", substeps=2, iterations=6,
                chebyshev=True, gravity=(0.0, -10.0, 0.0),
                particle_radius=0.02)
    base.update(kw)
    return SolverParams(**base)


def test_mesh_sharded_chebyshev_matches_single(topo):
    params = _params()
    mesh = make_mesh(shape=(4, 2))
    step = jax.jit(make_mesh_sharded_step(topo, params, mesh))
    state = init_batch_state(topo, 8, inv_mass_mode="density")
    state = shard_batch(state, mesh, axis="data")
    ref = BatchedEngine(topo, params, batch=8)
    for _ in range(15):
        state = step(state, DT)
        ref.step(DT)
    np.testing.assert_allclose(np.asarray(state.x), ref.positions(),
                               atol=1e-5)


def test_vertex_sharded_chebyshev_matches_single(topo):
    params = _params()
    mesh = make_mesh(shape=(8,), axis_names=("model",))
    step = make_vertex_sharded_step(topo, params, mesh, axis="model")
    state = step.build_state(inv_mass_mode="density")
    ref = Engine(topo, params, inv_mass_mode="density")
    for _ in range(15):
        state = step(state, DT)
        ref.step(DT)
    np.testing.assert_allclose(step.unpad(state[0]), ref.positions(),
                               atol=1e-5)


def test_pallas_sharded_chebyshev_matches_single(topo):
    from softbodysim_tpu.solver.jacobi_pallas import make_jacobi_pallas_step
    from softbodysim_tpu.solver.jacobi_pallas_sharded import (
        make_jacobi_pallas_sharded_step)

    params = _params(substeps=1, iterations=4, jacobi_backend="pallas",
                     use_pallas="off")
    devs = jax.devices()[:2]
    mesh = Mesh(np.asarray(devs), axis_names=("model",))
    sstep = make_jacobi_pallas_sharded_step(topo, params, mesh,
                                            interpret=True)
    ref = make_jacobi_pallas_step(topo, params, interpret=True)
    s_state = init_state(topo, inv_mass_mode="density")
    r_state = init_state(topo, inv_mass_mode="density")
    for _ in range(4):
        s_state = sstep(s_state, DT)
        r_state = ref(r_state, DT)
    np.testing.assert_allclose(np.asarray(s_state.x),
                               np.asarray(r_state.x), atol=1e-5)


def test_chebyshev_actually_engages_sharded(topo):
    """The sharded trajectory with chebyshev differs from without it
    (guards against a silent drop of the blend)."""
    mesh = make_mesh(shape=(8,), axis_names=("model",))
    a = make_vertex_sharded_step(topo, _params(), mesh, axis="model")
    b = make_vertex_sharded_step(topo, _params(chebyshev=False), mesh,
                                 axis="model")
    sa = a.build_state(inv_mass_mode="density")
    sb = b.build_state(inv_mass_mode="density")
    for _ in range(12):
        sa = a(sa, DT)
        sb = b(sb, DT)
    assert np.abs(a.unpad(sa[0]) - b.unpad(sb[0])).max() > 1e-6


def test_sharded_xpbd_accepts_chebyshev_flag(topo):
    """xpbd ignores chebyshev everywhere; the sharded entry must accept
    and ignore it too (ADVICE round-3: guard scoped, then removed)."""
    mesh = make_mesh(shape=(8,), axis_names=("model",))
    params = SolverParams(dialect="xpbd", substeps=1, iterations=2,
                          chebyshev=True)
    step = make_sharded_step(topo, params, mesh, axis="model")
    state = init_state(topo)
    state = step(state, DT)
    assert np.isfinite(np.asarray(state.x)).all()
