"""Multi-chip jacobi Pallas passes vs the single-device backend.

Pure Jacobi reads one frozen snapshot per pass, so the sharded execution
(solver/jacobi_pallas_sharded.py: per-device sub-plans, ghost-window
snapshot halo, homed (delta, cnt) accumulators, local omega/cnt apply)
is NOT a dialect change -- it must match the single-device jacobi Pallas
backend (solver/jacobi_pallas.py) up to fp32 summation order.  1e-5 over
multiple contact-heavy steps on 2- and 4-device CPU meshes.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from softbodysim_tpu import SolverParams
from softbodysim_tpu.core import meshes
from softbodysim_tpu.core.state import init_state
from softbodysim_tpu.solver.jacobi_pallas import make_jacobi_pallas_step
from softbodysim_tpu.solver.jacobi_pallas_sharded import (
    make_jacobi_pallas_sharded_step)

DT = 1.0 / 60.0


def mesh_of(d):
    devs = jax.devices()[:d]
    if len(devs) < d:
        pytest.skip(f"needs {d} devices")
    return Mesh(np.asarray(devs), axis_names=("model",))


def _params(**kw):
    base = dict(dialect="jacobi", substeps=1, iterations=2,
                edge_stiffness=0.9, volume_stiffness=0.98, sor_omega=1.4,
                particle_radius=0.02, gravity=(0.0, -10.0, 0.0),
                jacobi_backend="pallas", use_pallas="off")
    base.update(kw)
    return SolverParams(**base)


@pytest.mark.parametrize("d", [2, 4])
def test_sharded_matches_single_device(d):
    mesh = mesh_of(d)
    topo = meshes.tet_cube(7, 7, 7, size=0.7, center=(0.0, 0.4, 0.0))
    params = _params()

    sstep = make_jacobi_pallas_sharded_step(topo, params, mesh,
                                            interpret=True)
    assert sstep.shard_info["D"] == d
    # non-trivial partition: at least one family has real ghosts
    fams = [f for f in (sstep.shard_info["edges"], sstep.shard_info["tets"])
            if f is not None]
    assert any(f.ghost_mask.any() for f in fams)

    ref = make_jacobi_pallas_step(topo, params, interpret=True)

    s_state = init_state(topo, inv_mass_mode="density")
    r_state = init_state(topo, inv_mass_mode="density")
    for _ in range(5):
        s_state = sstep(s_state, DT)
        r_state = ref(r_state, DT)
        np.testing.assert_allclose(np.asarray(s_state.x),
                                   np.asarray(r_state.x), atol=1e-5)
    # contact happened (the cube started near the ground)
    assert np.asarray(r_state.x)[:, 1].min() < 0.1
    np.testing.assert_allclose(np.asarray(s_state.v),
                               np.asarray(r_state.v), atol=1e-4)


def test_sharded_pinned_and_edges_only():
    """Cloth (edges only, pinned corners) through the sharded path: pinned
    rows hold still, free rows match the single-device backend."""
    mesh = mesh_of(2)
    topo, pinned = meshes.cloth_patch(9, 9)
    params = _params(ground_enabled=False)

    sstep = make_jacobi_pallas_sharded_step(topo, params, mesh,
                                            interpret=True)
    ref = make_jacobi_pallas_step(topo, params, interpret=True)

    s_state = init_state(topo, pinned=pinned, inv_mass_mode="density")
    r_state = init_state(topo, pinned=pinned, inv_mass_mode="density")
    for _ in range(5):
        s_state = sstep(s_state, DT)
        r_state = ref(r_state, DT)
    p = np.asarray(s_state.x)
    np.testing.assert_allclose(p[pinned], topo.vertices[pinned], atol=1e-6)
    np.testing.assert_allclose(p, np.asarray(r_state.x), atol=1e-5)
