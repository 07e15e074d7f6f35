"""Convergence-quality contract across constraint orderings (VERDICT weak #4).

The block-synchronous Pallas dialect deviates from serial Gauss-Seidel by
design; this test MEASURES the deviation instead of asserting it away:
constraint-residual and energy curves for serial-GS (== the compiled
reference, bitwise -- test_golden_ref.py), colored-GS, and
block-synchronous orderings at the reference solver config, with bounded
residual-ratio and bounded-energy assertions.
"""

import numpy as np
import pytest

from softbodysim_tpu import SolverParams
from softbodysim_tpu.core import meshes
from softbodysim_tpu.perf.convergence import run_curves

# NOT quick-tier: the scalar serial/blocks replays cost minutes.
pytestmark = pytest.mark.slow

STEPS = 30


@pytest.fixture(scope="module")
def curves():
    # reference default config (PBDServer.h:147-161) on a dropping cube
    # that settles into ground contact
    topo = meshes.tet_cube(3, 3, 3, size=0.6, center=(0.0, 0.7, 0.0))
    params = SolverParams(dialect="xpbd", substeps=2, iterations=6)
    return run_curves(topo, params, steps=STEPS)


def _tail(c, key):
    return float(np.mean(c[key][-10:]))


def test_colored_matches_serial_residuals(curves):
    """Colored GS is the same algorithm up to constraint order: residuals
    track serial closely."""
    for fam in ("edge", "tet"):
        s = _tail(curves["serial"], fam)
        c = _tail(curves["colored"], fam)
        assert c <= 2.0 * s + 1e-6, (fam, s, c)


def test_blocks_residual_ratio_bounded(curves):
    """Measured fact (round 3): on a mesh this small the packed plans are
    1-2 super-blocks, so the block dialect degenerates to pure Jacobi with
    the 1/multiplicity dlambda scale -- settled residuals run ~20-24x the
    serial-GS ones (PLAN.md records the curves).  The bound asserts that
    measured class (x2 headroom) so a real regression -- divergence, or
    the scale being dropped (which destabilizes) -- still fails.  At
    production scale (hundreds of blocks) Gauss-Seidel across blocks does
    the propagation; the auto backend only selects this dialect above
    100k constraints."""
    for fam in ("edge", "tet"):
        s = _tail(curves["serial"], fam)
        b = _tail(curves["blocks"], fam)
        assert b <= 50.0 * s + 1e-6, (fam, s, b)
        assert b < 0.1, (fam, b)       # still absolutely small (settling)


def test_no_energy_injection(curves):
    """No ordering may pump energy: XPBD projection + friction is
    dissipative, so settled energy stays at or below the starting energy
    for every ordering."""
    for name, c in curves.items():
        e = c["energy"]
        assert e[-1] <= e[0] + 1e-3 * abs(e[0]), (name, e[0], e[-1])


def test_residuals_actually_converge(curves):
    """Settled residuals are small in absolute terms for all orderings
    (the solver is doing its job, not just agreeing with itself)."""
    for name, c in curves.items():
        bound = 0.1 if name == "blocks" else 0.05
        assert _tail(c, "edge") < bound, (name, _tail(c, "edge"))


def test_serial_golden_matches_serial_oracle():
    """The at-scale 'serial_golden' ordering (the compiled reference binary,
    per-step x+v samples) produces the SAME curves as the scalar oracle --
    it is the same trajectory at C++ speed, which is what makes 100k-scale
    convergence measurement affordable (PLAN.md records those)."""
    import golden_ref

    if not golden_ref.reference_available():
        pytest.skip("reference checkout not mounted")
    topo = meshes.tet_cube(3, 3, 3, size=0.6, center=(0.0, 0.7, 0.0))
    params = SolverParams(dialect="xpbd", substeps=2, iterations=6)
    c = run_curves(topo, params, steps=10,
                   orderings=("serial", "serial_golden"))
    for key in ("edge", "tet", "energy"):
        np.testing.assert_allclose(
            c["serial_golden"][key], c["serial"][key], rtol=1e-5, atol=1e-9)
