"""World: multi-body orchestration -- the SoftBodyManager equivalent.

Reproduces the manager's scheduling semantics
(Assets/Scripts/Softbody/SoftBodyManager.cs):
  - register/unregister bodies and primitive colliders (:122-156)
  - fixed-dt accumulator frame stepping with maxStepsPerFrame /
    maxFrameDeltaTime clamps (:73-94)
  - per-step collider snapshot shared by all bodies (:239-261)
  - per-body independence == task parallelism; on TPU each body is its own
    jitted step (XLA overlaps dispatch), and homogeneous worlds should prefer
    the batched API (parallel/batching.py) which vmaps one step over bodies.
  - 1 Hz-style aggregated stage stats (:158-197) via perf/timing.py
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np

from ..core.state import SolverParams
from ..core.topology import Topology
from ..collide.primitives import Colliders
from .engine import Engine
from ..perf.timing import StepStats


class Body:
    """One registered soft body: a Topology + per-body solver params."""

    def __init__(self, topology: Topology, params: SolverParams,
                 name: str = "body", pinned=None, **engine_kw):
        self.name = name
        self.topology = topology
        self.params = params
        self.pinned = pinned
        self.engine: Optional[Engine] = None
        self._engine_kw = engine_kw

    def bind(self, colliders: Optional[Colliders]):
        self.engine = Engine(self.topology, self.params,
                             colliders=colliders, pinned=self.pinned,
                             **self._engine_kw)

    def positions(self) -> np.ndarray:
        return self.engine.positions()


class World:
    """Multi-body registry + frame scheduler."""

    def __init__(self, fixed_dt: float = 1.0 / 60.0,
                 max_steps_per_frame: int = 4,
                 max_frame_delta_time: float = 0.05):
        self.fixed_dt = fixed_dt
        self.max_steps_per_frame = max_steps_per_frame
        self.max_frame_delta_time = max_frame_delta_time
        self.bodies: List[Body] = []
        self._collider_items: List[Optional[dict]] = []
        self._colliders: Optional[Colliders] = None
        self._collider_capacity = 0
        self._accumulator = 0.0
        self.stats = StepStats()

    # -- registration (SoftBodyManager.cs:122-156) --
    def register(self, body: Body) -> Body:
        if body not in self.bodies:
            self.bodies.append(body)
            body.bind(self._colliders)
        return body

    def unregister(self, body: Body):
        if body in self.bodies:
            self.bodies.remove(body)

    # Dynamic collider buffer: snapshots are padded to a power-of-two
    # capacity, so adding/removing colliders below capacity is a same-shape
    # update -- no body re-jits.  Only capacity GROWTH rebinds: the
    # reference's pow2-grow GPU collider buffer (SoftBodySolver.cs:648-664;
    # RegisterPrimitiveCollider, SoftBodyManager.cs:122-156).  The
    # reference starts at 64 slots because a GPU buffer overallocates for
    # free; here padded slots are real (masked) collide work inside the
    # jitted step, so the floor is 8 and doubles on demand (a handful of
    # recompiles on the way up, zero once capacity is reached).
    COLLIDER_MIN_CAPACITY = 8

    @property
    def collider_capacity(self) -> int:
        return self._collider_capacity

    def _snapshot_colliders(self) -> Optional[Colliders]:
        if not self._collider_items:
            return None
        return Colliders.build(self._collider_items,
                               capacity=self._collider_capacity)

    def _push_colliders(self, grew: bool):
        self._colliders = self._snapshot_colliders()
        for b in self.bodies:
            if grew or b.engine is None:
                b.bind(self._colliders)
            else:
                b.engine.colliders = self._colliders

    def add_collider(self, item: dict) -> int:
        """item from Colliders.sphere/box/capsule builders.  Returns a
        stable collider id.  Re-jits bodies only when the padded capacity
        grows (first collider, or count passing a power of two)."""
        # reuse a tombstone slot if one exists (ids stay stable)
        try:
            index = self._collider_items.index(None)
            self._collider_items[index] = item
        except ValueError:
            self._collider_items.append(item)
            index = len(self._collider_items) - 1
        count = len(self._collider_items)
        grew = count > self._collider_capacity
        if grew:
            cap = self.COLLIDER_MIN_CAPACITY
            while cap < count:
                cap *= 2
            self._collider_capacity = cap
        self._push_colliders(grew)
        return index

    def remove_collider(self, index: int):
        """Deactivate a collider by id.  The slot becomes a tombstone
        (inactive, reusable by the next add); shapes are unchanged, so no
        body recompiles -- mirrors SoftBodyManager.UnregisterPrimitiveCollider
        (SoftBodyManager.cs:122-156) + the persistent GPU buffer."""
        self._collider_items[index] = None
        self._push_colliders(grew=False)

    def update_collider(self, index: int, item: dict):
        """Move/replace a collider's pose without recompiling (the capacity
        is unchanged); takes effect at the next step -- per-step snapshot
        semantics (SoftBodyManager.RebuildColliderCache,
        SoftBodyManager.cs:239-261)."""
        self._collider_items[index] = item
        self._push_colliders(grew=False)

    # -- stepping --
    def step(self, dt: Optional[float] = None, block: bool = False):
        """One fixed simulation step across all bodies
        (SoftBodyManager.StepSimulation, :199-237).

        Dispatch is asynchronous: every body's step enters the XLA stream
        and overlaps freely; nothing waits unless ``block=True`` (or until
        ``positions()`` / ``sync()`` reads results).  The reference blocks
        per frame by construction (worker join); here the device pipeline
        keeps running across steps."""
        dt = self.fixed_dt if dt is None else dt
        t0 = time.perf_counter()
        for body in self.bodies:
            body.engine.step(dt)
        if block:
            for body in self.bodies:
                body.engine.block()
        self.stats.add("step", time.perf_counter() - t0)

    def sync(self):
        """Wait for all in-flight steps to finish."""
        for body in self.bodies:
            body.engine.block()

    def frame(self, frame_dt: float) -> int:
        """Accumulator-driven frame update (SoftBodyManager.cs:73-94).
        Returns the number of fixed steps executed."""
        frame_dt = min(frame_dt, self.max_frame_delta_time)
        self._accumulator += frame_dt
        steps = 0
        while self._accumulator >= self.fixed_dt and steps < self.max_steps_per_frame:
            self.step(self.fixed_dt)
            self._accumulator -= self.fixed_dt
            steps += 1
        if steps >= self.max_steps_per_frame:
            self._accumulator = 0.0
        return steps

    def positions(self) -> Dict[str, np.ndarray]:
        return {b.name: b.positions() for b in self.bodies}
