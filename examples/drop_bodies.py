"""Multi-body drop scene -- the SampleScene/ExtremeTest analog.

Drops a mix of balls and cubes onto the ground with primitive colliders,
exports an OBJ sequence for viewing.

    python examples/drop_bodies.py --bodies 6 --steps 120 --out /tmp/drop
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import argparse

import numpy as np

import softbodysim_tpu as sbs
from softbodysim_tpu.io import ObjSequenceWriter
from softbodysim_tpu.render import make_normals_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bodies", type=int, default=4)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    world = sbs.World(fixed_dt=1 / 60)
    world.add_collider(sbs.Colliders.box((0.0, 0.15, 0.0), (0.4, 0.15, 0.4)))

    rng = np.random.default_rng(0)
    for i in range(args.bodies):
        x = float(rng.uniform(-0.5, 0.5))
        z = float(rng.uniform(-0.5, 0.5))
        y = 1.0 + 0.4 * i
        if i % 2 == 0:
            topo = sbs.meshes.tet_ball(1, 0.2, (x, y, z))
        else:
            topo = sbs.meshes.tet_cube(2, 2, 2, 0.3, (x, y, z))
        world.register(sbs.Body(
            topo,
            sbs.SolverParams(dialect="jacobi", substeps=2, iterations=6,
                             gravity=(0, -10.0, 0)),
            name=f"body{i}"))

    writers = {}
    normals = {}
    if args.out:
        for b in world.bodies:
            writers[b.name] = ObjSequenceWriter(
                f"{args.out}/{b.name}", triangles=b.topology.surface_tris)
            normals[b.name] = make_normals_fn(b.topology)

    for s in range(args.steps):
        world.step()
        if args.out and s % 4 == 0:
            for b in world.bodies:
                pos = b.positions()
                n = np.asarray(normals[b.name](pos))
                writers[b.name].append(pos, n)

    print(world.stats.report())
    for name, pos in world.positions().items():
        print(f"{name}: min_y={pos[:, 1].min():.4f}")


if __name__ == "__main__":
    main()
