"""Grouped homogeneous batching: the TPU-native multi-body scene engine.

The reference's benchmark scenes instance a few mesh FAMILIES many times
(ExtremeTest: 16 x ball + 8 x fumo; BatchTest: 10 + 10).  Three execution
strategies, measured on v5e:

  per-body World loop      N programs, no batching      (reference analog)
  hetero padded batch      1 program, pays max-degree padding across
                           families -- 14x slower on BatchTest (parallel/
                           hetero.py; kept for truly-unique-mesh scenes)
  GROUPED batch (this)     one vmapped program per family; bodies of a
                           family share topology arrays and differ only in
                           their initial positions -- no padding waste,
                           batch amortization within each family.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import SimState, SolverParams, init_state
from ..core.topology import Topology
from ..collide.primitives import Colliders
from ..solver import make_step


class Group:
    """One mesh family: base topology + per-instance world offsets."""

    def __init__(self, topology: Topology, offsets, params: SolverParams,
                 name: str = "group", density: float = 1.0, pinned=None):
        self.name = name
        self.topology = topology
        self.offsets = np.asarray(offsets, np.float32).reshape(-1, 3)
        self.params = params
        self.density = density
        self.pinned = pinned

    @property
    def count(self) -> int:
        return len(self.offsets)


class GroupedSceneEngine:
    """Multi-family scene: one vmapped jitted step per family."""

    def __init__(self, groups: Sequence[Group],
                 colliders: Optional[Colliders] = None):
        self.groups = list(groups)
        self._engines = []
        for g in self.groups:
            inv_mode = "tet" if g.params.dialect == "xpbd" else "density"
            base = init_state(g.topology, pinned=g.pinned,
                              inv_mass_mode=inv_mode, density=g.density)
            state = jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(
                    a, (g.count,) + a.shape).copy(), base)
            x = state.x + jnp.asarray(g.offsets)[:, None, :]
            state = SimState(x=x, v=state.v, x_star=jnp.copy(x),
                             inv_mass=state.inv_mass,
                             edge_lambda=state.edge_lambda,
                             tet_lambda=state.tet_lambda)
            fn = make_step(g.topology, g.params, colliders=colliders)
            if getattr(fn, "prejit", False):
                raise ValueError(
                    "the Pallas backends cannot be vmapped; set the family "
                    "backend to 'gather' or use Scene.build_merged")
            step = jax.jit(jax.vmap(fn, in_axes=(0, None)), donate_argnums=0)
            self._engines.append({"state": state, "step": step})

    def step(self, dt: float = 1.0 / 60.0) -> "GroupedSceneEngine":
        # dispatch all family programs; XLA overlaps across dispatches
        for e in self._engines:
            e["state"] = e["step"](e["state"], dt)
        return self

    def block(self):
        for e in self._engines:
            jax.block_until_ready(e["state"].x)
        return self

    def positions(self) -> List[Tuple[str, np.ndarray]]:
        """[(name#i, (V,3) positions)] across all bodies."""
        out = []
        for g, e in zip(self.groups, self._engines):
            xs = np.asarray(jax.device_get(e["state"].x))
            for i in range(g.count):
                out.append((f"{g.name}#{i}", xs[i]))
        return out
