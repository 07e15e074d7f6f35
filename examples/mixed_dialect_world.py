"""Mixed-DIALECT world via partitioned execution: jacobi and xpbd bodies
in one scene, run as the fewest merged programs.

The reference's manager steps every body separately
(SoftBodyManager.cs:217-233); a world mixing the in-engine Jacobi+SOR
dialect with the C++ server's XPBD dialect cannot merge into one sim
mesh (the solvers differ), and the per-body loop is the ~20x slow lane.
``Scene.build_partitioned`` groups bodies by merge-compatibility so the
whole world becomes exactly TWO merged Pallas programs here -- measured
68.8 steps/s vs 4.5 per-body on a 20-unique-body 118k-particle version
of this scene (TPU v5e, PLAN.md round 5a).

    python examples/mixed_dialect_world.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), ".."))

import numpy as np

from softbodysim_tpu import Colliders, Scene, SolverParams
from softbodysim_tpu.core import meshes


def main():
    jac = SolverParams(dialect="jacobi", substeps=2, iterations=6,
                       edge_stiffness=0.9, volume_stiffness=0.98,
                       sor_omega=1.4, gravity=(0.0, -10.0, 0.0))
    xp = SolverParams(dialect="xpbd", substeps=2, iterations=6,
                      gravity=(0.0, -10.0, 0.0))

    bodies = []
    for i in range(3):                     # three unique jacobi bodies
        t = meshes.tet_cube(4 + i, 4, 4, size=0.5,
                            center=(i * 1.2 - 1.2, 1.0, -0.8))
        # per-body stiffness still merges (per-constraint tables)
        p = jac.replace(edge_stiffness=0.5 + 0.2 * i)
        bodies.append((f"jacobi{i}", t, p, {}))
    for i in range(3):                     # three unique xpbd bodies
        t = meshes.tet_cube(4, 4 + i, 4, size=0.5,
                            center=(i * 1.2 - 1.2, 1.0, 0.8))
        bodies.append((f"xpbd{i}", t, xp, {}))

    scene = Scene(name="mixed_dialect", colliders=[
        Colliders.sphere((0.0, 0.25, 0.0), 0.3)], bodies=bodies)
    world = scene.build_partitioned(backend="gather")
    print(f"{len(bodies)} bodies -> {world.num_programs} programs")

    world.run(120, 1.0 / 60.0)
    for name, pos in world.positions().items():
        print(f"  {name}: min_y={pos[:, 1].min():.3f} "
              f"finite={np.isfinite(pos).all()}")


if __name__ == "__main__":
    main()
