"""Kinematic collider demo: a capsule sweeps through a pile of soft balls.

Collider poses update every step with zero recompilation (the per-step
snapshot semantics of the reference manager).

    python examples/moving_collider.py --steps 240 --out /tmp/sweep
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import argparse

import numpy as np

import softbodysim_tpu as sbs
from softbodysim_tpu.io import ObjSequenceWriter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    world = sbs.World(fixed_dt=1 / 60)
    cid = world.add_collider(sbs.Colliders.capsule((-2.0, 0.3, 0.0),
                                                   0.25, 0.4))
    for i in range(4):
        world.register(sbs.Body(
            sbs.meshes.tet_ball(1, 0.18, (0.35 * i - 0.5, 0.2, 0.0)),
            sbs.SolverParams(dialect="jacobi", substeps=2, iterations=6,
                             gravity=(0, -10.0, 0), particle_radius=0.02),
            name=f"ball{i}"))

    writers = {}
    if args.out:
        for b in world.bodies:
            writers[b.name] = ObjSequenceWriter(
                f"{args.out}/{b.name}", triangles=b.topology.surface_tris)

    for s in range(args.steps):
        cx = -2.0 + 4.0 * s / args.steps
        world.update_collider(
            cid, sbs.Colliders.capsule((cx, 0.3, 0.0), 0.25, 0.4))
        world.step()
        if args.out and s % 4 == 0:
            for b in world.bodies:
                writers[b.name].append(b.positions())

    for name, pos in world.positions().items():
        c = pos.mean(axis=0)
        print(f"{name}: center=({c[0]:+.3f}, {c[1]:+.3f}, {c[2]:+.3f})")


if __name__ == "__main__":
    main()
