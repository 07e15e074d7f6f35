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

import os as _os

# Persistent XLA compilation cache: solver steps (scan over substeps x
# iterations x colors, plus Pallas kernels) take 20-100 s to compile cold;
# the cache makes every later process start instant.  Opt out with
# SOFTBODYSIM_NO_COMPILE_CACHE=1.
if not _os.environ.get("SOFTBODYSIM_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        _cache_dir = _os.environ.get(
            "SOFTBODYSIM_COMPILE_CACHE",
            _os.path.join(_os.path.expanduser("~"), ".cache",
                          "softbodysim_tpu_xla"))
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        # Full tracebacks bake the CALLER's source lines into the Mosaic
        # kernel payload (an opaque backend_config string the cache-key
        # metadata stripper cannot reach), so any change of call stack --
        # even the same script calling from a different line -- recompiles
        # the multi-minute 100k-scale Pallas programs.  With this off,
        # kernel locations are the package's own (stable) frames and
        # identical programs hit the persistent cache from any caller.
        _jax.config.update("jax_include_full_tracebacks_in_locations", False)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from .core.state import SimState, SolverParams, init_state
from .core.topology import Topology, build_topology
from .core import meshes
from .collide.primitives import Colliders
from .solver import make_step
from .api.dynamic import DynamicMergedWorld
from .api.engine import Engine
from .api.scenes import PartitionedSceneEngine, Scene
from .api.world import World, Body
from . import diff

__version__ = "0.1.0"

__all__ = [
    "SimState", "SolverParams", "init_state", "Topology", "build_topology",
    "meshes", "Colliders", "make_step", "Engine", "World", "Body",
    "DynamicMergedWorld", "Scene", "PartitionedSceneEngine", "diff",
]
