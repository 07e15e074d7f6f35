"""Mixed-material merged scene: bodies with different stiffness in ONE
Pallas-stepped sim mesh.

The reference sets material tunables per SoftBodySolver component
(SoftBodySolver.cs inspector fields); here each body's stiffness merges
into per-constraint tables (solver/jacobi.py ``edge_k``/``tet_k``, the
PERK kernel variant) so the whole scene still runs as a single merged
program -- the TPU fast path (PLAN.md: BatchTest 60 steps/s merged vs
5.3 grouped).

    python examples/mixed_materials.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), ".."))

import numpy as np

from softbodysim_tpu import SolverParams
from softbodysim_tpu.api.scenes import Scene
from softbodysim_tpu.core import meshes


def main():
    # three balls of increasing softness, dropped side by side
    stiffnesses = [0.95, 0.5, 0.15]
    bodies = []
    for i, k in enumerate(stiffnesses):
        topo = meshes.tet_ball(2, 0.3, (i * 0.9 - 0.9, 1.0, 0.0))
        params = SolverParams(
            dialect="jacobi", substeps=2, iterations=6,
            edge_stiffness=k, volume_stiffness=min(1.0, k + 0.05),
            sor_omega=1.4, particle_radius=0.02,
            gravity=(0.0, -10.0, 0.0))
        bodies.append((f"ball_k{k}", topo, params, {}))

    scene = Scene(name="mixed_materials", bodies=bodies, colliders=[])
    eng, voffs = scene.build_merged()   # pallas on TPU, interpret on CPU
    eng.run(120, 1.0 / 60.0)
    pos = eng.positions()

    print("After 2 s of settling (softer balls squash flatter):")
    for i, (name, topo, _, _) in enumerate(bodies):
        p = pos[voffs[i]:voffs[i + 1]]
        h = p[:, 1].max() - p[:, 1].min()
        w = p[:, 0].max() - p[:, 0].min()
        print(f"  {name:12s} height {h:.3f} width {w:.3f} "
              f"aspect {h / w:.2f}")
    assert np.isfinite(pos).all()


if __name__ == "__main__":
    main()
