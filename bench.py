"""Benchmark: constraint projections/sec on the flagship batched workload.

Workload = the TPU analog of the reference's BatchTest scene (20 bodies, the
largest with V=8613 / T=26070 / E=41488, GPU Jacobi backend, substeps 2 x
iters 6 -- Assets/Scenes/BatchTest.unity:2912-2920): a vmapped batch of
tetrahedral bodies stepped with the Jacobi (in-engine GPU contract) dialect,
ground contact enabled.

Metric: constraint projections per second =
    batch * (E + T) * iterations * substeps * steps / elapsed.
vs_baseline is against the BASELINE.json north-star of 1e8 projections/sec
per TPU core.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time


def main():
    import jax
    import numpy as np

    from softbodysim_tpu import SolverParams
    from softbodysim_tpu.core import meshes
    from softbodysim_tpu.parallel import BatchedEngine

    # bunny-scale body, batched -- sized so a step is compute-bound.
    # batch=128 is the measured throughput peak on v5e (larger batches
    # fall off the VMEM working-set cliff).
    topo = meshes.tet_cube(10, 10, 10, size=0.8, center=(0.0, 1.0, 0.0))
    batch = 128
    params = SolverParams(
        dialect="jacobi", substeps=2, iterations=6,
        edge_stiffness=0.9, volume_stiffness=0.98, sor_omega=1.4,
        particle_radius=0.02, gravity=(0.0, -10.0, 0.0),
        jacobi_backend="gather")

    eng = BatchedEngine(topo, params, batch=batch, pos_jitter=0.002)

    dt = 1.0 / 60.0
    # warmup + compile
    eng.step(dt)
    eng.block()

    steps = 50
    t0 = time.perf_counter()
    for _ in range(steps):
        eng.step(dt)
    eng.block()
    elapsed = time.perf_counter() - t0

    constraints = topo.num_edges + topo.num_tets
    projections = (batch * constraints * params.iterations
                   * params.substeps * steps)
    rate = projections / elapsed

    result = {
        "metric": "constraint_projections_per_sec",
        "value": float(f"{rate:.4g}"),
        "unit": "proj/s",
        "vs_baseline": float(f"{rate / 1e8:.4g}"),
        "detail": {
            "batch": batch,
            "V": topo.num_particles,
            "E": topo.num_edges,
            "T": topo.num_tets,
            "substeps": params.substeps,
            "iterations": params.iterations,
            "steps": steps,
            "elapsed_s": round(elapsed, 4),
            "steps_per_sec": round(steps / elapsed, 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
