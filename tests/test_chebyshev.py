"""Chebyshev semi-iterative acceleration (jacobi dialect)."""

import numpy as np

from softbodysim_tpu import Engine, SolverParams
from softbodysim_tpu.core import meshes

DT = 1.0 / 60.0


def _max_strain(topo, eng):
    pos = eng.positions()
    e = topo.edges.astype(np.int64)
    lens = np.linalg.norm(pos[e[:, 1]] - pos[e[:, 0]], axis=1)
    return float(np.abs(lens / topo.edge_rest - 1.0).max())


def test_chebyshev_accelerates_cloth_convergence():
    """64x64 pinned cloth: plain Jacobi at 16 iters/step leaves huge corner
    strain (information propagates ~1 cell/iter); Chebyshev acceleration
    must cut the transient strain substantially at identical cost."""
    topo, pinned = meshes.cloth_patch(48, 48, size=1.0, bending=True)
    base = SolverParams(dialect="jacobi", substeps=2, iterations=8,
                        edge_stiffness=0.95, ground_enabled=False,
                        gravity=(0, -9.81, 0))
    plain = Engine(topo, base, pinned=pinned)
    cheb = Engine(topo, base.replace(chebyshev=True), pinned=pinned)
    for _ in range(60):
        plain.step(DT)
        cheb.step(DT)
    s_plain = _max_strain(topo, plain)
    s_cheb = _max_strain(topo, cheb)
    assert np.isfinite(cheb.positions()).all()
    assert s_cheb < 0.6 * s_plain, (s_plain, s_cheb)
    # pinned corners still exact
    np.testing.assert_allclose(cheb.positions()[pinned],
                               topo.vertices[pinned], atol=1e-6)


def test_chebyshev_stable_on_tet_body():
    topo = meshes.tet_ball(1, 0.3, (0, 0.8, 0))
    params = SolverParams(dialect="jacobi", substeps=2, iterations=6,
                          chebyshev=True, gravity=(0, -10.0, 0))
    eng = Engine(topo, params)
    eng.run(180, DT)
    pos = eng.positions()
    assert np.isfinite(pos).all()
    assert abs(pos[:, 1].min() - 0.02) < 1e-2   # rests at particle radius


def test_chebyshev_on_pallas_backend_matches_gather():
    """The jacobi Pallas pass path supports chebyshev: the blend wraps the
    pass kernels in the iteration scan (solver/jacobi_pallas.py) with the
    same omega_k recurrence as the XLA path, so both backends must agree
    up to fp32 summation order.  Interpret-mode pallas: keep steps small."""
    topo = meshes.tet_cube(3, 3, 3, size=0.5, center=(0.0, 0.3, 0.0))
    base = dict(dialect="jacobi", substeps=2, iterations=6,
                chebyshev=True, gravity=(0.0, -10.0, 0.0),
                particle_radius=0.02)
    a = Engine(topo, SolverParams(jacobi_backend="pallas", **base))
    b = Engine(topo, SolverParams(jacobi_backend="gather", **base))
    plain = Engine(topo, SolverParams(
        jacobi_backend="pallas", **{**base, "chebyshev": False}))
    for _ in range(12):
        a.step(DT)
        b.step(DT)
        plain.step(DT)
    assert np.isfinite(a.positions()).all()
    np.testing.assert_allclose(a.positions(), b.positions(), atol=5e-5)
    # the acceleration actually engages on the pallas path (same program
    # would otherwise be a silent no-op): trajectories must differ from
    # the un-accelerated run once past chebyshev_delay iterations
    assert np.abs(a.positions() - plain.positions()).max() > 1e-4
