"""Engine: the jitted replacement for the PBD1 socket round-trip.

The reference's distributed step is MSG_INIT -> (MSG_STEP -> MSG_POSITIONS)*
over TCP (CProgram/src/Server.cpp:20-149).  TPU-native, the socket hop
disappears:

  Engine(topology, params)  == MSG_INIT   (Server.cpp:30-113: build inv
                                           masses, rest state, zero lambdas)
  engine.step(dt)           == MSG_STEP   (a donated-buffer jitted step; no
                                           host round-trip, state stays in HBM)
  engine.positions()        == MSG_POSITIONS (async device->host fetch of the
                                           V x 3 committed positions)

The actual PBD1 wire protocol survives as api/server.py for out-of-process
clients (e.g. the original Unity client).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ..core.state import SimState, SolverParams, init_state
from ..core.topology import Topology
from ..collide.primitives import Colliders
from ..solver import make_step


class Engine:
    """Single-scene simulation engine with a donated-buffer jitted step.

    Backends exposing a carry API (``pack_state``/``run_carry``/
    ``unpack_state`` -- the Pallas sweep backend) run in a persistent
    internal layout: the public state is materialized lazily on access,
    and the layout/lambda pack boundary is paid once per state transfer
    instead of once per step call.  This is the TPU analog of the
    reference's zero-readback GPU render mode (SoftBodySolver.cs:870-904:
    the renderer pulls solver ComputeBuffers directly; nothing round-trips
    through the CPU unless explicitly requested).
    """

    _carry = None
    _state_stale = False

    def __init__(self, topology: Topology, params: SolverParams,
                 colliders: Optional[Colliders] = None,
                 pinned=None, inv_mass_mode: Optional[str] = None,
                 density: float = 1.0, pin_top_layer: bool = False,
                 mesh=None, shard_axis: str = "model",
                 **solver_kw):
        """``mesh`` (a jax.sharding.Mesh) switches to the single-scene
        multi-chip backends (parallel/sharding.make_sharded_step): the same
        step/run/positions API, state sharded/executed across the mesh axis
        ``shard_axis``.  Colliders are then build-time (replicated local
        resolve); ``update_colliders`` rebuilds the sharded step."""
        if inv_mass_mode is None:
            # server dialect defaults to tet-volume inverse masses
            # (Sim.cpp:63-79); in-engine dialect to density lumping
            # (SoftBodySolver.cs:947-973).
            inv_mass_mode = "tet" if params.dialect == "xpbd" else "density"
        self.topology = topology
        self.params = params
        self.colliders = colliders
        self.mesh = mesh
        self.shard_axis = shard_axis
        # sharded steps bake colliders in at build time; single-device
        # steps take per-step colliders_rt overrides (runtime poses)
        self._cols_runtime = mesh is None
        self.state: SimState = init_state(
            topology, pinned=pinned, inv_mass_mode=inv_mass_mode,
            density=density, pin_top_layer=pin_top_layer)
        if mesh is not None:
            from ..parallel.sharding import make_sharded_step

            self._raw_step = make_sharded_step(
                topology, params, mesh, axis=shard_axis,
                colliders=colliders, **solver_kw)
        else:
            self._raw_step = make_step(topology, params,
                                       colliders=colliders, **solver_kw)
        self._step = self._wrap(self._raw_step)

    # ---- lazy public state over the carry backends -----------------------

    @property
    def state(self) -> SimState:
        if self._carry is not None and self._state_stale:
            self._state = self._raw_step.unpack_state(self._carry,
                                                      self._state)
            self._state_stale = False
        return self._state

    @state.setter
    def state(self, s: SimState):
        self._state = s
        self._carry = None
        self._state_stale = False

    def _ensure_carry(self):
        if self._carry is None:
            self._carry = self._raw_step.pack_state(self._state)
            self._state_stale = False

    @staticmethod
    def _wrap(raw_step):
        """Jit the solver step -- unless the backend pre-jitted it (Pallas
        backends thread their >100 MB plan tables as jit arguments; an
        outer jax.jit would re-capture them as HLO constants and pay ~40 s
        of trace+lower per process)."""
        if getattr(raw_step, "prejit", False):
            return raw_step
        return jax.jit(raw_step, donate_argnums=0)

    def step(self, dt: float = 1.0 / 60.0, **overrides) -> "Engine":
        """overrides are forwarded to the jitted step: per-step stiffness
        scalars, and ``colliders_rt`` / transform matrices for moving
        colliders/bodies (same shapes as the construction-time template, so
        no recompilation -- the per-step snapshot semantics of
        SoftBodyManager.RebuildColliderCache)."""
        if (self._cols_runtime and self.colliders is not None
                and "colliders_rt" not in overrides):
            overrides["colliders_rt"] = self.colliders
        rc = getattr(self._raw_step, "run_carry", None)
        if rc is not None:
            self._ensure_carry()
            self._carry = rc(self._carry, dt, 1, **overrides)
            self._state_stale = True
        else:
            self.state = self._step(self.state, dt, **overrides)
        return self

    def update_colliders(self, colliders: Colliders) -> "Engine":
        """Replace collider poses for subsequent steps (count must match).
        Sharded engines bake colliders in at build time, so this rebuilds
        the sharded step (a recompile on the next call)."""
        if (self.colliders is None) or (colliders.count
                                        != self.colliders.count):
            raise ValueError("collider count must match the template; use "
                             "switch_params to change the set")
        self.colliders = colliders
        if not self._cols_runtime:
            from ..parallel.sharding import make_sharded_step

            self.state = self.state      # materialize any carry first
            self._raw_step = make_sharded_step(
                self.topology, self.params, self.mesh,
                axis=self.shard_axis, colliders=colliders)
            self._step = self._wrap(self._raw_step)
            self._step_n = None
            self._step_n_key = None
        return self

    # Multi-step bursts run in fixed-size chunks so an Engine compiles at
    # most TWO programs (the chunk and the single step) no matter how many
    # distinct run() lengths are requested -- at 100k-particle scale a
    # Pallas-backend program is minutes of cold compile, so per-length
    # programs (run(5), run(30), run(300) -> 3 compiles) are unaffordable.
    RUN_CHUNK = 32

    def run(self, steps: int, dt: float = 1.0 / 60.0) -> "Engine":
        """Run ``steps`` fixed steps.  Backends with a multi-step fast path
        (the Pallas backends' ``step_n``) run RUN_CHUNK-step bursts in one
        program, paying their state-layout boundary once per chunk instead
        of per step; the remainder runs as single steps."""
        rc = getattr(self._raw_step, "run_carry", None)
        chunk = self.RUN_CHUNK
        cols_rt = self.colliders if self._cols_runtime else None
        if rc is not None:
            kw = ({"colliders_rt": cols_rt}
                  if cols_rt is not None else {})
            self._ensure_carry()
            for _ in range(steps // chunk):
                self._carry = rc(self._carry, dt, chunk, **kw)
            for _ in range(steps % chunk):
                self._carry = rc(self._carry, dt, 1, **kw)
            self._state_stale = True
            return self
        step_n = getattr(self._raw_step, "step_n", None)
        if step_n is not None and steps >= chunk:
            key = cols_rt is not None
            if getattr(self, "_step_n_key", None) != key:
                self._step_n = None
                self._step_n_key = key
            if getattr(self, "_step_n", None) is None:
                if getattr(step_n, "prejit", False):
                    if cols_rt is not None:
                        self._step_n = lambda s, d, c: step_n(
                            s, d, chunk, colliders_rt=c)
                    else:
                        self._step_n = lambda s, d: step_n(s, d, chunk)
                elif cols_rt is not None:
                    # colliders_rt is part of the step_n contract; a
                    # backend without it falls back to the per-step loop
                    # instead of raising TypeError at the first run().
                    import inspect
                    sig = inspect.signature(step_n)
                    if "colliders_rt" not in sig.parameters:
                        self._step_n_key = None
                        for _ in range(steps):
                            self.step(dt)
                        return self

                    def chunked(s, d, c):
                        return step_n(s, d, chunk, colliders_rt=c)
                    self._step_n = jax.jit(chunked, donate_argnums=0)
                else:
                    self._step_n = jax.jit(
                        lambda s, d: step_n(s, d, chunk), donate_argnums=0)
            for _ in range(steps // chunk):
                if cols_rt is not None:
                    self.state = self._step_n(self.state, dt, cols_rt)
                else:
                    self.state = self._step_n(self.state, dt)
            steps %= chunk
        for _ in range(steps):
            self.step(dt)
        return self

    @property
    def backend(self) -> Optional[str]:
        """The concrete solver backend the step resolved to ("gather",
        "segment", "scatter", "pallas", ...); None for sharded steps,
        which have their own dispatch (parallel/sharding.py)."""
        return getattr(self._raw_step, "backend", None)

    def positions_device(self):
        """Device-side committed positions (V,3); on a carry backend this
        skips the full lambda-unpack boundary (row gather only)."""
        if self._carry is not None and self._state_stale:
            cp = getattr(self._raw_step, "carry_positions", None)
            if cp is not None:
                return cp(self._carry)
        return self.state.x

    def positions(self) -> np.ndarray:
        """Committed positions, V x 3 (== MSG_POSITIONS payload)."""
        return np.asarray(jax.device_get(self.positions_device()))

    def velocities(self) -> np.ndarray:
        return np.asarray(jax.device_get(self.state.v))

    def reset(self, pinned=None, **kw) -> "Engine":
        """Re-INIT semantics: rebuild rest state (Server.cpp:106-110)."""
        self.state = init_state(self.topology, pinned=pinned, **kw)
        return self

    def block(self) -> "Engine":
        if self._carry is not None and self._state_stale:
            jax.block_until_ready(jax.tree_util.tree_leaves(self._carry)[0])
        else:
            jax.block_until_ready(self._state.x)
        return self

    def switch_params(self, params: SolverParams,
                      colliders: Optional[Colliders] = "unchanged",
                      **solver_kw) -> "Engine":
        """Swap solver configuration mid-run, preserving the dynamic state
        -- the analog of the reference's runtime CPU<->GPU mode migration
        (SoftBodySolver.cs:237-253, which round-trips the same state arrays
        between backends).  Dialect, backend, stiffness, iteration counts
        etc. can all change; the state pytree (x, v, lambdas) carries over
        verbatim.  Triggers a re-jit on the next step."""
        if colliders == "unchanged":
            colliders = self.colliders
        self.params = params
        self.colliders = colliders
        self.state = self.state       # materialize, then drop the old carry
        if self.mesh is not None:
            from ..parallel.sharding import make_sharded_step

            self._raw_step = make_sharded_step(
                self.topology, params, self.mesh, axis=self.shard_axis,
                colliders=colliders, **solver_kw)
        else:
            self._raw_step = make_step(self.topology, params,
                                       colliders=colliders, **solver_kw)
        self._step = self._wrap(self._raw_step)
        self._step_n = None
        self._step_n_key = None
        return self
