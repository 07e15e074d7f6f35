"""Failure detection + elastic recovery.

The reference has NONE (SURVEY.md section 5: any protocol hiccup tears the
server down, no retry/checkpoint).  For long datagen/production runs the TPU
build adds a watchdog: periodic state validation (finite, velocity/position
bounds) with automatic rollback to the last good snapshot on divergence --
cheap because SimState is a small pytree kept device-side.

Typical blow-up causes: overly stiff settings + large dt (XPBD is stable but
the Jacobi dialect with omega ~2 can oscillate), or NaNs from degenerate
user topology.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import SimState


@dataclasses.dataclass
class WatchdogConfig:
    check_every: int = 10          # steps between validations
    max_speed: float = 1e3         # |v| ceiling (world units / s)
    max_coord: float = 1e4         # |x| ceiling
    keep_snapshots: int = 2


@jax.jit
def state_health(state: SimState):
    """Device-side health scalar pack: [finite, max|v|, max|x|]."""
    finite = (jnp.isfinite(state.x).all() & jnp.isfinite(state.v).all()
              & jnp.isfinite(state.x_star).all())
    return jnp.stack([
        finite.astype(jnp.float32),
        jnp.max(jnp.abs(state.v)),
        jnp.max(jnp.abs(state.x)),
    ])


class Watchdog:
    """Wraps an Engine-like object (needs .state and .step)."""

    def __init__(self, engine, config: Optional[WatchdogConfig] = None):
        self.engine = engine
        self.config = config or WatchdogConfig()
        self._snapshots = []
        self._steps = 0
        self.rollbacks = 0
        self._snapshot()

    def _snapshot(self):
        snap = jax.tree_util.tree_map(jnp.copy, self.engine.state)
        self._snapshots.append((self._steps, snap))
        if len(self._snapshots) > self.config.keep_snapshots:
            self._snapshots.pop(0)

    def _healthy(self) -> bool:
        h = np.asarray(state_health(self.engine.state))
        c = self.config
        return bool(h[0] > 0.5 and h[1] <= c.max_speed and h[2] <= c.max_coord)

    def step(self, dt: float = 1.0 / 60.0, **kw) -> bool:
        """One step + periodic validation.  Returns False when a rollback
        happened (caller may want to lower dt / stiffness)."""
        self.engine.step(dt, **kw)
        self._steps += 1
        if self._steps % self.config.check_every:
            return True
        if self._healthy():
            self._snapshot()
            return True
        # divergence: restore the oldest retained snapshot (the newest may
        # already carry the instability)
        self.rollbacks += 1
        restore_step, snap = self._snapshots[0]
        self.engine.state = jax.tree_util.tree_map(jnp.copy, snap)
        self._steps = restore_step
        return False
