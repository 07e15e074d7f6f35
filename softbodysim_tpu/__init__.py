"""softbodysim_tpu -- a TPU-native soft-body simulation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
Unity + C++ project Captain-Noble/CS121-softbodysim (XPBD / PBD soft bodies on
tetrahedral meshes): both solver dialects (the C++ PBDServer's XPBD
Gauss-Seidel contract via graph-colored sweeps, and the in-engine Jacobi+SOR
gather/apply contract via segment-sums), primitive + spatial-hash collisions,
the PBD1 wire protocol, batched/vmapped scenes, and sharded multi-chip
execution.

Quick start::

    import softbodysim_tpu as sbs

    topo = sbs.meshes.tet_cube(4, 4, 4)
    eng = sbs.Engine(topo, sbs.SolverParams(dialect="xpbd"))
    for _ in range(60):
        eng.step(1.0 / 60.0)
    pos = eng.positions()
"""

from .core.state import SimState, SolverParams, init_state
from .core.topology import Topology, build_topology
from .core import meshes
from .collide.primitives import Colliders
from .solver import make_step
from .api.engine import Engine
from .api.world import World, Body

__version__ = "0.1.0"

__all__ = [
    "SimState", "SolverParams", "init_state", "Topology", "build_topology",
    "meshes", "Colliders", "make_step", "Engine", "World", "Body",
]
