"""Probe: block-synchronous dlambda schemes vs serial GS (VERDICT r3 #1).

Host-side oracle replay of the Pallas sweep plans under candidate in-block
schemes, measuring settled constraint residuals against the compiled
reference binary (serial GS).  Mid-scale mesh (24^3 = 13.8k vertices,
~160 packed blocks) -- large enough that cross-block GS propagation is
realistic, small enough for the NumPy replay.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_block_schemes.py
"""

import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path[:0] = [str(ROOT), str(ROOT / "tests")]

from softbodysim_tpu import SolverParams                      # noqa: E402
from softbodysim_tpu.core import meshes                      # noqa: E402
from softbodysim_tpu.perf.convergence import (               # noqa: E402
    block_plans, constraint_residuals)
import golden_ref as gr                                      # noqa: E402
import oracle as omod                                        # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 24
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 90
TAIL = 30
DT = 1.0 / 60.0


def main():
    topo = meshes.tet_cube(N, N, N, size=0.6, center=(0.0, 0.7, 0.0))
    params = SolverParams(dialect="xpbd", substeps=2, iterations=6)
    print(f"V={topo.num_particles} E={topo.num_edges} T={topo.num_tets}")

    eb, tb = block_plans(topo, params)
    print(f"edge blocks={len(eb)} tet blocks={len(tb)}")

    # serial GS tail residuals from the compiled reference binary
    t0 = time.time()
    out = gr.run_reference(topo, params, dt=DT, nsteps=STEPS, sample_every=1)
    ser_e, ser_t = [], []
    for x in out["samples"][-TAIL:]:
        r = constraint_residuals(topo, x)
        ser_e.append(r["edge"])
        ser_t.append(r["tet"])
    se, st = float(np.mean(ser_e)), float(np.mean(ser_t))
    print(f"serial tail: edge={se:.3e} tet={st:.3e}  "
          f"[{time.time()-t0:.1f}s]")

    schemes = [
        ("split w=1.9 k=2  ", dict(scheme="split", omega=1.9,
                                   local_iters=2)),
        ("split w=1.7 k=3  ", dict(scheme="split", omega=1.7,
                                   local_iters=3)),
        ("split w=2.2 k=2  ", dict(scheme="split", omega=2.2,
                                   local_iters=2)),
    ]
    for name, kw in schemes:
        t0 = time.time()
        oracle = omod.XpbdOracle(topo, params)
        res_e, res_t = [], []
        for _ in range(STEPS):
            oracle.step_blocks(DT, edge_blocks=eb, tet_blocks=tb, **kw)
            r = constraint_residuals(topo, oracle.x)
            res_e.append(r["edge"])
            res_t.append(r["tet"])
        be = float(np.mean(res_e[-TAIL:]))
        bt = float(np.mean(res_t[-TAIL:]))
        ymin = float(oracle.x[:, 1].min())
        ymax = float(np.abs(oracle.x).max())
        print(f"{name}: edge={be:.3e} ({be/se:5.2f}x) "
              f"tet={bt:.3e} ({bt/st:5.2f}x) |x|max={ymax:.2f} "
              f"[{time.time()-t0:.1f}s]")


if __name__ == "__main__":
    main()
