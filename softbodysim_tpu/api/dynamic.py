"""Mid-run scene growth with automatic backend re-selection.

The reference re-decides its compute mode every frame and migrates live
solver state between backends when the decision flips
(/root/reference/Assets/Scripts/Softbody/SoftBodySolver.cs:237-253:
SyncGpuToCpuBlocking / UploadCpuToGpu around the useGpu transition).
TPU-native, the per-frame decision is free -- the jitted step IS the
chosen backend -- so the interesting transition is SCENE GROWTH: a
merged world that crosses the Pallas thresholds
(solver/select.py::resolve_backend) when bodies are added or removed
mid-run.

``DynamicMergedWorld`` owns that transition: add_body/remove_body
rebuild the merged engine with the backend re-resolved at the NEW scene
size, and every retained body's dynamic state (positions, velocities,
XPBD lambdas) carries across the rebuild exactly -- the analog of the
reference's state round-trip, minus the blocking GPU readback (buffers
stay device-side; only the slice permutation runs on host).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..core.state import SimState, SolverParams, init_state
from ..core.topology import Topology, merge_topologies
from ..collide.primitives import Colliders
from .engine import Engine


class DynamicMergedWorld:
    """A merged multi-body world whose body set can change between steps.

    All bodies share one ``SolverParams`` (like ``Scene.build_merged``
    with uniform materials).  The engine is rebuilt lazily on the first
    step after a mutation; ``backend`` exposes what the auto thresholds
    resolved to, so callers can observe XLA<->Pallas migration.
    """

    def __init__(self, params: SolverParams,
                 colliders: Optional[Colliders] = None,
                 density: float = 1.0,
                 inv_mass_mode: Optional[str] = None):
        self.params = params
        self.colliders = colliders
        self.density = density
        self.inv_mass_mode = inv_mass_mode
        self._bodies: Dict[str, Topology] = {}
        self._pinned: Dict[str, Optional[np.ndarray]] = {}
        self._order = []            # insertion-ordered body names
        self._engine: Optional[Engine] = None
        self._dirty = False

    # ---- mutation --------------------------------------------------------

    def add_body(self, name: str, topology: Topology,
                 pinned=None) -> "DynamicMergedWorld":
        if name in self._bodies:
            raise ValueError(f"body {name!r} already exists")
        self._bodies[name] = topology
        self._pinned[name] = (np.atleast_1d(np.asarray(pinned, np.int64))
                              if pinned is not None else None)
        self._order.append(name)
        self._dirty = True
        return self

    def remove_body(self, name: str) -> "DynamicMergedWorld":
        if name not in self._bodies:
            raise KeyError(name)
        del self._bodies[name]
        del self._pinned[name]
        self._order.remove(name)
        self._dirty = True
        return self

    # ---- rebuild with state carry ---------------------------------------

    def _offsets(self, names):
        vo = eo = to = 0
        out = {}
        for n in names:
            t = self._bodies[n] if n in self._bodies else None
            out[n] = (vo, eo, to)
            if t is not None:
                vo += t.num_particles
                eo += t.num_edges
                to += t.num_tets
        return out

    def _rebuild(self):
        old_engine = self._engine
        old_names = getattr(self, "_built_order", [])
        old_offs = getattr(self, "_built_offs", {})
        old_tops = getattr(self, "_built_tops", {})

        names = list(self._order)
        if not names:
            raise ValueError("DynamicMergedWorld has no bodies")
        merged, voffs = merge_topologies([self._bodies[n] for n in names])
        pinned = []
        for i, n in enumerate(names):
            p = self._pinned[n]
            if p is not None:
                pinned.extend((p + int(voffs[i])).tolist())
        engine = Engine(
            merged, self.params, colliders=self.colliders,
            density=self.density, inv_mass_mode=self.inv_mass_mode,
            pinned=np.asarray(pinned, np.int64) if pinned else None)

        if old_engine is not None:
            # carry retained bodies' dynamic state slice-for-slice; new
            # bodies keep their fresh init slices (lambdas zero -- the
            # reference's init-only zeroing quirk is per body)
            old = old_engine.state      # materializes any carry layout
            new = engine.state
            ox, ov = np.asarray(old.x), np.asarray(old.v)
            oel = np.asarray(old.edge_lambda)
            otl = np.asarray(old.tet_lambda)
            nx, nv = np.array(new.x), np.array(new.v)
            nel = np.array(new.edge_lambda)
            ntl = np.array(new.tet_lambda)
            new_offs = self._offsets(names)
            for n in names:
                if n not in old_offs or old_tops.get(n) is not self._bodies[n]:
                    continue
                t = self._bodies[n]
                (ovo, oeo, oto) = old_offs[n]
                (nvo, neo, nto) = new_offs[n]
                nx[nvo:nvo + t.num_particles] = ox[ovo:ovo + t.num_particles]
                nv[nvo:nvo + t.num_particles] = ov[ovo:ovo + t.num_particles]
                nel[neo:neo + t.num_edges] = oel[oeo:oeo + t.num_edges]
                ntl[nto:nto + t.num_tets] = otl[oto:oto + t.num_tets]
            engine.state = SimState(
                x=nx, v=nv, x_star=nx, inv_mass=new.inv_mass,
                edge_lambda=nel, tet_lambda=ntl)

        self._engine = engine
        self._built_order = names
        self._built_offs = self._offsets(names)
        self._built_tops = dict(self._bodies)
        self._dirty = False

    @property
    def engine(self) -> Engine:
        if self._engine is None or self._dirty:
            self._rebuild()
        return self._engine

    @property
    def backend(self) -> Optional[str]:
        """The backend the auto thresholds resolved to for the CURRENT
        body set (rebuilds if stale)."""
        return self.engine.backend

    # ---- stepping / readback --------------------------------------------

    def step(self, dt: float = 1.0 / 60.0) -> "DynamicMergedWorld":
        self.engine.step(dt)
        return self

    def run(self, steps: int, dt: float = 1.0 / 60.0):
        self.engine.run(steps, dt)
        return self

    def positions(self, name: Optional[str] = None) -> np.ndarray:
        pos = self.engine.positions()
        if name is None:
            return pos
        (vo, _, _) = self._built_offs[name]
        t = self._bodies[name]
        return pos[vo:vo + t.num_particles]

    def velocities(self, name: Optional[str] = None) -> np.ndarray:
        v = np.asarray(self.engine.velocities())
        if name is None:
            return v
        (vo, _, _) = self._built_offs[name]
        t = self._bodies[name]
        return v[vo:vo + t.num_particles]
