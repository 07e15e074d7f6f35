"""Checkpoint / resume demo: run, save mid-flight (including accumulated
XPBD lambdas), resume in a fresh engine, verify bit-exact continuation.

    python examples/checkpoint_resume.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import tempfile

import numpy as np

import softbodysim_tpu as sbs
from softbodysim_tpu.io import load_state, params_from_metadata, save_state


def main():
    topo = sbs.meshes.tet_ball(1, 0.3, (0.0, 1.0, 0.0))
    params = sbs.SolverParams(dialect="xpbd", substeps=2, iterations=6)

    ref = sbs.Engine(topo, params)
    for _ in range(100):
        ref.step(1 / 60)

    eng = sbs.Engine(topo, params)
    for _ in range(50):
        eng.step(1 / 60)

    path = _os.path.join(tempfile.gettempdir(), "softbody_ckpt.npz")
    save_state(path, eng.state, params=params, metadata={"step": 50})
    print("saved", path)

    resumed = sbs.Engine(topo, params)
    resumed.state, meta = load_state(path)
    print("resumed at step", meta["step"],
          "with params", params_from_metadata(meta).dialect)
    for _ in range(50):
        resumed.step(1 / 60)

    diff = np.abs(ref.positions() - resumed.positions()).max()
    print(f"max position diff vs uninterrupted run: {diff:.3e} "
          f"({'bit-exact' if diff == 0 else 'NOT exact'})")


if __name__ == "__main__":
    main()
