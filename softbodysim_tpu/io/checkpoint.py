"""State checkpoint / resume.

The reference has NO runtime state persistence (SURVEY.md section 5): the only
saved artifact is init-time topology, and re-INIT resets the world
(Server.cpp:106-110).  Here the full SimState -- including the accumulated
XPBD lambdas, which the reference never resets -- is a flat pytree of arrays,
so checkpointing is exact and trivially portable (single .npz file).
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np

from ..core.state import SimState, SolverParams

_FIELDS = ("x", "v", "x_star", "inv_mass", "edge_lambda", "tet_lambda")
FORMAT_VERSION = 1


def save_state(path: str, state: SimState,
               params: Optional[SolverParams] = None,
               metadata: Optional[dict] = None):
    """Write state (+ optional params/metadata) to ``path`` (.npz)."""
    import jax

    arrays = {name: np.asarray(jax.device_get(getattr(state, name)))
              for name in _FIELDS}
    meta = {"format_version": FORMAT_VERSION}
    if metadata:
        meta.update(metadata)
    if params is not None:
        meta["params"] = {
            "substeps": params.substeps,
            "iterations": params.iterations,
            "dialect": params.dialect,
            "edge_compliance": params.edge_compliance,
            "volume_compliance": params.volume_compliance,
            "friction": params.friction,
            "edge_stiffness": params.edge_stiffness,
            "volume_stiffness": params.volume_stiffness,
            "sor_omega": params.sor_omega,
            "particle_radius": params.particle_radius,
            "gravity": list(params.gravity),
            "ground_enabled": params.ground_enabled,
            "ground_y": params.ground_y,
        }
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_state(path: str, device_put: bool = True):
    """Read (state, metadata) from ``path``.  metadata contains 'params' if
    saved with them."""
    import jax.numpy as jnp

    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
        if meta.get("format_version", 0) > FORMAT_VERSION:
            raise ValueError(
                f"checkpoint format {meta['format_version']} is newer than "
                f"supported {FORMAT_VERSION}")
        conv = (jnp.asarray if device_put else np.asarray)
        state = SimState(**{name: conv(z[name]) for name in _FIELDS})
    return state, meta


def params_from_metadata(meta: dict) -> SolverParams:
    p = dict(meta["params"])
    p["gravity"] = tuple(p["gravity"])
    return SolverParams(**p)
