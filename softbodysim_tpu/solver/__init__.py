"""Solver dialects (see core.state.SolverParams.dialect)."""

from .xpbd import make_xpbd_step
from .jacobi import make_jacobi_step


def make_step(topology, params, colliders=None, **kw):
    """Dispatch on params.dialect: 'xpbd' (server contract) or 'jacobi'
    (in-engine contract)."""
    if params.dialect == "xpbd":
        bad = set(kw) - {"edge_c", "tet_c"}
        if bad:
            raise TypeError(
                f"make_xpbd_step does not accept {sorted(bad)} (edge_k/"
                "tet_k stiffness tables are jacobi-dialect; xpbd takes "
                "edge_c/tet_c compliance tables)")
        return make_xpbd_step(topology, params, colliders=colliders, **kw)
    if params.dialect == "jacobi":
        return make_jacobi_step(topology, params, colliders=colliders, **kw)
    raise ValueError(f"unknown dialect {params.dialect!r}")


__all__ = ["make_step", "make_xpbd_step", "make_jacobi_step"]
