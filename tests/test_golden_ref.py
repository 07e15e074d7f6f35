"""Golden-trace parity against the COMPILED reference C++ solver.

Every other parity test in this suite compares the JAX backends to
``tests/oracle.py`` -- a hand-written scalar NumPy model of the reference
semantics.  These tests close the loop to the *actual* reference: they
compile ``CProgram/src/Sim.cpp`` (unmodified, straight from the read-only
reference checkout) into a batch runner (tools/golden_ref/ref_runner.cpp)
and assert that

  (a) ``XpbdOracle`` reproduces the compiled SerialStepper
      (Sim.cpp:280-305) essentially bit-for-bit over >=100 steps on three
      topologies, including a parsed reference Unity tet asset; and
  (b) the JAX colored-GS backends match the compiled reference at 1e-4
      under the agreed constraint ordering (the reference sweeps its
      arrays in index order -- Sim.cpp:104,136 -- so feeding it
      color-major-permuted arrays replays the colored order exactly).

A shared misreading of Sim.cpp between oracle and solver can no longer
pass: the oracle itself is now checked against the real thing.

Skipped when /root/reference is not mounted (the framework itself never
depends on it).
"""

import numpy as np
import pytest

from softbodysim_tpu import Engine, SolverParams
from softbodysim_tpu.core import meshes
from softbodysim_tpu.core.topology import build_topology
from softbodysim_tpu.io.unity_assets import parse_tet_asset

from golden_ref import reference_available, run_reference
from oracle import XpbdOracle

pytestmark = [
    pytest.mark.quick,
    pytest.mark.skipif(not reference_available(),
                       reason="reference checkout not mounted"),
]

DT = 1.0 / 60.0

ICOSPHERE_ASSET = ("/root/reference/Assets/SoftBody/Generated/"
                   "Icosphere_Tet 1.asset")


def _icosphere_topo():
    """Reference-generated Icosphere asset (V=162, T=425), lifted above the
    ground plane (the raw asset is centered at the origin) with the asset's
    own edge/surface arrays kept authoritative."""
    raw = parse_tet_asset(ICOSPHERE_ASSET)
    verts = raw["vertices"] + np.array([0.0, 1.3, 0.0], np.float32)
    return build_topology(
        verts, raw["tetIds"].reshape(-1, 4),
        edges=raw["edgeIds"].reshape(-1, 2),
        surface_tris=raw["surfaceTriIds"].reshape(-1, 3), orient=True)


def _oracle_vs_reference(topo, params, steps, pinned=None,
                         x_atol=2e-6, lam_atol=1e-4):
    ref = run_reference(topo, params, dt=DT, nsteps=steps, sample_every=steps,
                        pinned=pinned)
    oracle = XpbdOracle(topo, params, pinned=pinned)
    for _ in range(steps):
        oracle.step(DT)

    bitwise = bool(
        np.array_equal(oracle.x.view(np.uint32), ref["x"].view(np.uint32)))
    print(f"golden-ref oracle parity: bitwise={bitwise} "
          f"max|dx|={np.abs(oracle.x - ref['x']).max():.3e}")

    np.testing.assert_allclose(oracle.x, ref["x"], atol=x_atol, rtol=1e-5)
    np.testing.assert_allclose(oracle.v, ref["v"], atol=x_atol * 120,
                               rtol=1e-4)
    np.testing.assert_allclose(oracle.edge_lambda, ref["edge_lambda"],
                               atol=lam_atol, rtol=1e-4)
    np.testing.assert_allclose(oracle.tet_lambda, ref["tet_lambda"],
                               atol=lam_atol, rtol=1e-4)
    return bitwise


def test_oracle_matches_reference_cube_defaults():
    """Reference default params (ss2 it6, Sim.cpp defaults) on a dropping
    cube that impacts the ground -- exercises predict/edges/tets/ground/
    commit-friction."""
    topo = meshes.tet_cube(2, 2, 2, size=0.5, center=(0.0, 0.6, 0.0))
    params = SolverParams(dialect="xpbd", substeps=2, iterations=6)
    _oracle_vs_reference(topo, params, steps=120)


def test_oracle_matches_reference_ball_pinned_volcomp():
    """Pinned vertices (w=0 branches) + nonzero volumeCompliance
    (alpha*lambda feedback in the tet solve, Sim.cpp:162-164)."""
    topo = meshes.tet_ball(1, radius=0.5, center=(0.0, 0.8, 0.0))
    top = np.nonzero(
        topo.vertices[:, 1] >= topo.vertices[:, 1].max() - 1e-6)[0]
    params = SolverParams(dialect="xpbd", substeps=2, iterations=3,
                          edge_compliance=1e-3, volume_compliance=1e-5)
    _oracle_vs_reference(topo, params, steps=100, pinned=top)


def test_oracle_matches_reference_unity_asset():
    """A reference-generated Unity tet asset (Icosphere: V=162, T=425) fed
    byte-identically to both the oracle and the compiled reference."""
    topo = _icosphere_topo()
    params = SolverParams(dialect="xpbd", substeps=1, iterations=2,
                          edge_compliance=5e-4)
    _oracle_vs_reference(topo, params, steps=100, x_atol=5e-6)


@pytest.mark.parametrize("backend", ["gather", "scatter"])
def test_jax_colored_backend_matches_reference(backend):
    """JAX colored-GS sweeps vs the compiled reference running the SAME
    color-major constraint order: 1e-4 position agreement (the BASELINE
    contract), now grounded in the real binary instead of the oracle."""
    topo = meshes.tet_cube(3, 3, 3, size=0.6, center=(0.0, 0.8, 0.0))
    params = SolverParams(dialect="xpbd", substeps=2, iterations=6,
                          xpbd_backend=backend)
    steps = 120
    ref = run_reference(topo, params, dt=DT, nsteps=steps,
                        sample_every=steps,
                        edge_order=topo.edge_colors.order,
                        tet_order=topo.tet_colors.order)
    eng = Engine(topo, params)
    for _ in range(steps):
        eng.step(DT)
    np.testing.assert_allclose(eng.positions(), ref["x"], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(eng.state.edge_lambda), ref["edge_lambda"],
        atol=1e-3, rtol=1e-3)


def test_jax_backend_matches_reference_unity_asset():
    """Same grounding on a parsed reference asset (Icosphere)."""
    topo = _icosphere_topo()
    params = SolverParams(dialect="xpbd", substeps=2, iterations=6)
    steps = 100
    ref = run_reference(topo, params, dt=DT, nsteps=steps,
                        sample_every=steps,
                        edge_order=topo.edge_colors.order,
                        tet_order=topo.tet_colors.order)
    eng = Engine(topo, params)
    for _ in range(steps):
        eng.step(DT)
    np.testing.assert_allclose(eng.positions(), ref["x"], atol=1e-4)
