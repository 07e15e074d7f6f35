"""At-scale convergence probe: settled residual ratio vs the serial
reference at the north-star mesh (V=110592), round-3d protocol.

Protocol (PLAN.md round 3d): tet_cube(47), ss2 x it6, dt=1/60, 120 steps,
residual tail = mean over the last 30 steps.  Orderings:

  serial_golden  -- the compiled reference binary (bitwise the reference
                    trajectory); CPU-only, runs without the TPU tunnel.
  blocks_pallas  -- the REAL Pallas sweep kernels (xpbd_backend='pallas')
                    with the block-scheme knobs from argv.

Usage:
  python tools/probe_scale_convergence.py serial_golden
  python tools/probe_scale_convergence.py blocks_pallas \
      --scheme scale,split --omega 1.0,2.2 --k 1,2
Prints one JSON line {"ordering":..., "edge_tail":..., "tet_tail":...}.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def pair(s, cast):
    parts = s.split(",")
    if len(parts) == 1:
        parts = parts * 2
    return cast(parts[0]), cast(parts[1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ordering")
    ap.add_argument("--scheme", default="scale,scale")
    ap.add_argument("--omega", default="1.0,1.0")
    ap.add_argument("--k", default="1,1")
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--tail", type=int, default=30)
    ap.add_argument("--n", type=int, default=47)
    ap.add_argument("--substeps", type=int, default=2)
    ap.add_argument("--iterations", type=int, default=6)
    args = ap.parse_args()

    from softbodysim_tpu import SolverParams
    from softbodysim_tpu.core import meshes
    from softbodysim_tpu.perf.convergence import run_curves

    topo = meshes.tet_cube(args.n, args.n, args.n, size=1.0,
                           center=(0.0, 2.0, 0.0))
    params = SolverParams(
        dialect="xpbd", substeps=args.substeps,
        iterations=args.iterations, xpbd_backend="pallas",
        xpbd_block_scheme=pair(args.scheme, str),
        xpbd_block_omega=pair(args.omega, float),
        xpbd_block_local_iters=pair(args.k, int))
    t0 = time.time()
    curves = run_curves(topo, params, steps=args.steps,
                        orderings=(args.ordering,))
    c = curves[args.ordering]
    out = {
        "ordering": args.ordering,
        "scheme": args.scheme, "omega": args.omega, "k": args.k,
        "V": topo.num_particles, "E": topo.num_edges,
        "T": topo.num_tets,
        "edge_tail": float(c["edge"][-args.tail:].mean()),
        "tet_tail": float(c["tet"][-args.tail:].mean()),
        "energy_last": float(c["energy"][-1]),
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
