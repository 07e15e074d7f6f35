"""Differentiable simulation: recover material parameters by gradient.

A capability the reference framework (C#/HLSL/C++) cannot express — it
falls out of the functional JAX design: the whole solver differentiates
in reverse mode, so material estimation is just optimization.

Scenario: a soft cube is pinned by its top layer and sags under gravity.
We record its trajectory at an unknown edge compliance, then recover the
compliance from a 10x-wrong initial guess by minimizing trajectory MSE
with adam in log space.

Run: python examples/fit_materials.py   (CPU or TPU)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), ".."))

import numpy as np

import softbodysim_tpu as sbs
from softbodysim_tpu import diff

TRUE_COMPLIANCE = 3e-4
DT, NSTEPS = 1 / 60, 12


def main():
    topo = sbs.meshes.tet_cube(3, 3, 3, size=0.4)
    top = np.where(
        topo.vertices[:, 1] >= topo.vertices[:, 1].max() - 1e-6)[0]
    params = sbs.SolverParams(dialect="xpbd", substeps=2, iterations=4,
                              ground_enabled=False,
                              edge_compliance=TRUE_COMPLIANCE)
    state0 = sbs.init_state(topo, pinned=top)

    # "observe" a trajectory at the true (hidden) compliance
    rollout = diff.make_rollout(topo, params, dt=DT, nsteps=NSTEPS)
    target = np.asarray(rollout(state0))
    print(f"observed {NSTEPS} steps of a V={topo.num_particles} cube "
          f"at hidden compliance {TRUE_COMPLIANCE:.1e}")

    res = diff.fit(topo, params, target, dt=DT,
                   fit_params=("edge_compliance",),
                   init={"edge_compliance": TRUE_COMPLIANCE * 10},
                   state0=state0, steps=80, learning_rate=0.25)

    print(f"loss {res.losses[0]:.3e} -> {res.losses[-1]:.3e} "
          f"in {len(res.losses)} adam steps")
    fitted = res.params["edge_compliance"]
    print(f"fitted compliance {fitted:.4e}  "
          f"(true {TRUE_COMPLIANCE:.4e}, error "
          f"{100 * abs(fitted - TRUE_COMPLIANCE) / TRUE_COMPLIANCE:.1f}%)")
    assert res.converged


if __name__ == "__main__":
    main()
