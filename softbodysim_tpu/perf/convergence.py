"""Convergence-quality instrumentation: residual + energy curves per ordering.

The framework runs the reference's Gauss-Seidel XPBD (CProgram/src/Sim.cpp:
100-173) under three constraint orderings:

  serial   -- the reference's own array order (sequential GS);
  colored  -- color-major sweeps (solver/xpbd.py): provably GS-exact for
              the permuted order, bitwise-parallelizable;
  blocks   -- block-synchronous (kernels/sweep.py: Jacobi within a 1024-
              constraint super-block, GS across blocks) -- the Pallas fast
              path's dialect.

Orderings change the iterate trajectories, so "same class of ordering
change as coloring" needs a measurement, not an assertion: this module
computes per-step constraint residuals (RMS |C| per family) and total
mechanical energy so the three orderings can be compared quantitatively
(tests/test_convergence.py asserts the bounded-residual contract; PLAN.md
records the curves at the reference scene configs).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

F = np.float32


def constraint_residuals(topo, x: np.ndarray) -> Dict[str, float]:
    """RMS constraint violation per family at positions ``x``.

    edge: C = |len - rest|, normalized by RMS rest length;
    tet : C = |vol - rest|, normalized by RMS |rest volume|.
    """
    x = np.asarray(x, F)
    out = {}
    if topo.num_edges:
        e = topo.edges.astype(np.int64)
        d = x[e[:, 1]] - x[e[:, 0]]
        ln = np.sqrt((d * d).sum(-1))
        c = ln - topo.edge_rest
        out["edge"] = float(np.sqrt(np.mean(c * c))
                            / max(np.sqrt(np.mean(topo.edge_rest ** 2)),
                                  1e-12))
    if topo.num_tets:
        t = topo.tets.astype(np.int64)
        p = x[t]
        vol = np.einsum(
            "ti,ti->t",
            np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]),
            p[:, 3] - p[:, 0]) / 6.0
        c = vol - topo.tet_rest_vol
        out["tet"] = float(np.sqrt(np.mean(c * c))
                           / max(np.sqrt(np.mean(topo.tet_rest_vol ** 2)),
                                 1e-12))
    return out


def mechanical_energy(x, v, inv_mass, gravity=(0.0, -9.81, 0.0)) -> float:
    """Kinetic + gravitational potential energy of the free particles."""
    x = np.asarray(x, np.float64)
    v = np.asarray(v, np.float64)
    w = np.asarray(inv_mass, np.float64)
    m = np.where(w > 0.0, 1.0 / np.maximum(w, 1e-30), 0.0)
    g = np.asarray(gravity, np.float64)
    kin = 0.5 * float(np.sum(m * (v * v).sum(-1)))
    pot = -float(np.sum(m * (x @ g)))
    return kin + pot


def run_curves(topo, params, steps: int, dt: float = 1.0 / 60.0,
               orderings=("serial", "colored", "blocks"),
               pinned=None) -> Dict[str, Dict[str, np.ndarray]]:
    """Run ``steps`` and record per-step residual/energy curves per ordering.

    serial: the scalar NumPy oracle in the reference's own array order --
    bitwise-identical to the compiled reference binary over 100+ steps
    (tests/test_golden_ref.py proves it), so these ARE the reference
    trajectories.
    colored: the JAX colored-GS gather backend.
    blocks: the block-synchronous oracle replay of the Pallas sweep plans
    (exact dialect semantics without interpret-mode kernel cost).

    At-scale variants (the scalar replays are O(N) per sweep; these run at
    native/compiled speed so 100k-constraint meshes are measurable):
    serial_golden: the compiled reference binary itself
    (tools/golden_ref/ref_runner.cpp, per-step x+v samples) -- bitwise the
    'serial' trajectory, at C++ speed.
    blocks_pallas: the ACTUAL Pallas sweep backend (xpbd_backend='pallas'),
    one step per record -- the real kernels, not a replay (fast on TPU;
    interpret-mode off-TPU is only usable for small meshes).
    """
    from ..core.state import init_state
    from ..solver import make_step
    import importlib
    import importlib.util

    def _load(name, fname):
        # tests/*.py are test infrastructure; load lazily by path so the
        # package itself carries no test-time import dependency.
        import pathlib
        root = pathlib.Path(__file__).resolve().parents[2]
        spec = importlib.util.spec_from_file_location(
            name, root / "tests" / fname)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def _oracle():
        return _load("softbodysim_oracle", "oracle.py")

    curves: Dict[str, Dict[str, np.ndarray]] = {}

    for ordering in orderings:
        res_e, res_t, energy = [], [], []

        def record(x, v, w):
            r = constraint_residuals(topo, x)
            res_e.append(r.get("edge", 0.0))
            res_t.append(r.get("tet", 0.0))
            energy.append(mechanical_energy(x, v, w, params.gravity))

        if ordering == "serial":
            oracle = _oracle().XpbdOracle(topo, params, pinned=pinned)
            for _ in range(steps):
                oracle.step(dt)
                record(oracle.x, oracle.v, oracle.w)
        elif ordering == "colored":
            import jax
            state = init_state(topo, pinned=pinned)
            step = make_step(topo, params.replace(xpbd_backend="gather"))
            w = np.asarray(state.inv_mass)
            for _ in range(steps):
                state = step(state, dt)
                record(np.asarray(state.x), np.asarray(state.v), w)
        elif ordering == "blocks":
            mod = _oracle()
            oracle = mod.XpbdOracle(topo, params, pinned=pinned)
            eb, tb = block_plans(topo, params)
            sch = block_scheme(params)
            for _ in range(steps):
                oracle.step_blocks(dt, edge_blocks=eb, tet_blocks=tb,
                                   **sch)
                record(oracle.x, oracle.v, oracle.w)
        elif ordering == "serial_golden":
            gr = _load("softbodysim_golden_ref", "golden_ref.py")
            if not gr.reference_available():
                raise RuntimeError("reference checkout not available")
            out = gr.run_reference(topo, params, dt=dt, nsteps=steps,
                                   sample_every=1, pinned=pinned)
            w = _oracle().XpbdOracle(topo, params, pinned=pinned).w
            for x, v in zip(out["samples"], out["vel_samples"]):
                record(x, v, w)
        elif ordering == "blocks_pallas":
            from ..core.state import init_state as _init
            from ..solver.xpbd_pallas import make_xpbd_pallas_step
            state = _init(topo, pinned=pinned)
            w = np.asarray(state.inv_mass)
            step = make_xpbd_pallas_step(topo, params)
            for _ in range(steps):
                state = step(state, dt)
                record(np.asarray(state.x), np.asarray(state.v), w)
        else:
            raise ValueError(f"unknown ordering {ordering!r}")

        curves[ordering] = {
            "edge": np.asarray(res_e), "tet": np.asarray(res_t),
            "energy": np.asarray(energy),
        }
    return curves


def block_scheme(params) -> dict:
    """The oracle-replay kwargs (scheme/omega/local_iters) matching the
    Pallas sweep backend's in-block solve for ``params`` -- mirrors
    solver/xpbd_pallas._resolve_block_scheme.  omega / local_iters come
    back as (edge, tet) pairs, which the oracle accepts directly."""
    from ..solver.xpbd_pallas import _resolve_block_scheme

    fam = _resolve_block_scheme(params)
    (se, oe, ke), (st, ot, kt) = fam["edge"], fam["tet"]
    return {"scheme": (se, st), "omega": (oe, ot),
            "local_iters": (ke, kt)}


def block_plans(topo, params):
    """The Pallas sweep backend's actual packed block ordering for ``topo``
    as oracle-replayable (ids, scale) block lists."""
    from ..solver.xpbd_pallas import _cached_plans
    from ..kernels import sweep as sw

    perm, old2new, nwin, e_plan, t_plan = _cached_plans(
        topo, "auto", None, None, True)

    def blocks_of(plan):
        if plan is None:
            return None
        width = sw.block_width(plan)
        out = []
        for b in range(plan.capacity // width):
            seg = plan.perm[b * width:(b + 1) * width]
            scl = plan.scale.reshape(-1)[b * width:(b + 1) * width]
            live = seg >= 0
            if live.any():
                out.append((seg[live], scl[live].astype(np.float32)))
        return out

    return blocks_of(e_plan), blocks_of(t_plan)
