"""Batched datagen: 4096 vmapped scenes with randomized stiffness
(BASELINE config #5) -- RL-rollout style trajectory generation.

    python examples/datagen.py --batch 4096 --steps 60 --out /tmp/roll.npz
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import argparse
import time

import jax
import numpy as np

import softbodysim_tpu as sbs
from softbodysim_tpu.parallel import BatchedEngine, sample_stiffness


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--subdiv", type=int, default=1)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    topo = sbs.meshes.tet_ball(args.subdiv, 0.3, (0.0, 0.8, 0.0))
    params = sbs.SolverParams(dialect="jacobi", substeps=2, iterations=6,
                              gravity=(0, -10.0, 0))

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    ks = sample_stiffness(k1, args.batch, 0.3, 1.0)
    kv = sample_stiffness(k2, args.batch, 0.8, 1.0)

    eng = BatchedEngine(topo, params, batch=args.batch,
                        randomized_stiffness=True, key=k3, pos_jitter=0.01)

    frames = []
    eng.step(1 / 60, ks, kv)  # compile
    eng.block()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        eng.step(1 / 60, ks, kv)
        if args.out:
            frames.append(eng.positions())
    eng.block()
    dt = time.perf_counter() - t0

    cons = topo.num_edges + topo.num_tets
    rate = args.batch * cons * 12 * args.steps / dt
    print(f"{args.batch} scenes x {args.steps} steps in {dt:.2f}s "
          f"({args.batch * args.steps / dt:.0f} scene-steps/s, "
          f"{rate:.3g} constraint projections/s)")

    if args.out:
        np.savez_compressed(args.out,
                            positions=np.stack(frames, 1),
                            edge_stiffness=np.asarray(ks),
                            volume_stiffness=np.asarray(kv))
        print("wrote", args.out)


if __name__ == "__main__":
    main()
