"""Solver dialects (see core.state.SolverParams.dialect)."""

from .xpbd import make_xpbd_step
from .jacobi import make_jacobi_step


def make_step(topology, params, colliders=None, **kw):
    """Dispatch on params.dialect: 'xpbd' (server contract) or 'jacobi'
    (in-engine contract)."""
    if params.dialect == "xpbd":
        if kw:
            raise TypeError(
                f"make_xpbd_step does not accept {sorted(kw)} (per-"
                "constraint stiffness tables are a jacobi-dialect feature)")
        return make_xpbd_step(topology, params, colliders=colliders)
    if params.dialect == "jacobi":
        return make_jacobi_step(topology, params, colliders=colliders, **kw)
    raise ValueError(f"unknown dialect {params.dialect!r}")


__all__ = ["make_step", "make_xpbd_step", "make_jacobi_step"]
