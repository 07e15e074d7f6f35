"""Batched (vmapped) scenes -- thousands of independent soft bodies per chip.

The reference's only multi-body mechanism is a Python-esque loop over
registered solvers (SoftBodyManager.cs:217-233).  On TPU the idiomatic analog
is a leading scene axis vmapped over the whole step: BatchTest's 20 bodies or
BASELINE config #5's 4096 randomized-stiffness scenes become one jitted
program with batch-parallel kernels.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import SimState, SolverParams, init_state
from ..core.topology import Topology
from ..collide.primitives import Colliders
from ..solver import make_step


def init_batch_state(topology: Topology, batch: int, pinned=None,
                     inv_mass_mode: str = "tet", key=None,
                     pos_jitter: float = 0.0) -> SimState:
    """Replicate an initial state along a leading scene axis, optionally
    jittering positions per scene (for datagen diversity)."""
    base = init_state(topology, pinned=pinned, inv_mass_mode=inv_mass_mode)
    state = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), base)
    if pos_jitter > 0.0:
        if key is None:
            key = jax.random.PRNGKey(0)
        noise = pos_jitter * jax.random.normal(
            key, state.x.shape, dtype=jnp.float32)
        x = state.x + noise
        # x_star must be a distinct buffer from x: the jitted step donates its
        # input state, and XLA rejects donating one buffer twice.
        state = SimState(x=x, v=state.v, x_star=jnp.copy(x),
                         inv_mass=state.inv_mass,
                         edge_lambda=state.edge_lambda,
                         tet_lambda=state.tet_lambda)
    return state


def make_batched_step(topology: Topology, params: SolverParams,
                      colliders: Optional[Colliders] = None,
                      randomized_stiffness: bool = False):
    """vmap one scene's step over a leading batch axis.

    randomized_stiffness=True exposes per-scene stiffness arrays:
      xpbd:   step(state, dt, edge_compliance[B], volume_compliance[B])
      jacobi: step(state, dt, edge_stiffness[B], volume_stiffness[B])
    """
    step = make_step(topology, params, colliders=colliders)
    if getattr(step, "prejit", False):
        raise ValueError(
            "the Pallas backends cannot be vmapped (pre-jitted steps with "
            "donated state); use xpbd_backend/jacobi_backend='gather' for "
            "batched scenes, or Scene.build_merged for one big scene")

    if not randomized_stiffness:
        return jax.vmap(step, in_axes=(0, None))

    if params.dialect == "xpbd":
        def stepped(state, dt, ec, vc):
            return step(state, dt, edge_compliance=ec, volume_compliance=vc)
    else:
        def stepped(state, dt, ks, kv):
            return step(state, dt, edge_stiffness=ks, volume_stiffness=kv)

    return jax.vmap(stepped, in_axes=(0, None, 0, 0))


def sample_stiffness(key, batch: int, low: float, high: float):
    """Uniform per-scene stiffness samples for RL-rollout datagen."""
    return jax.random.uniform(key, (batch,), jnp.float32, low, high)


class BatchedEngine:
    """Engine-like wrapper around a vmapped scene batch."""

    def __init__(self, topology: Topology, params: SolverParams, batch: int,
                 colliders: Optional[Colliders] = None, pinned=None,
                 randomized_stiffness: bool = False, key=None,
                 pos_jitter: float = 0.0):
        self.topology = topology
        self.params = params
        self.batch = batch
        inv_mode = "tet" if params.dialect == "xpbd" else "density"
        self.state = init_batch_state(
            topology, batch, pinned=pinned, inv_mass_mode=inv_mode,
            key=key, pos_jitter=pos_jitter)
        self.randomized = randomized_stiffness
        fn = make_batched_step(topology, params, colliders=colliders,
                               randomized_stiffness=randomized_stiffness)
        self._step = jax.jit(fn, donate_argnums=0)

    def step(self, dt: float = 1.0 / 60.0, *stiffness):
        if self.randomized:
            self.state = self._step(self.state, dt, *stiffness)
        else:
            self.state = self._step(self.state, dt)
        return self

    def positions(self) -> np.ndarray:
        return np.asarray(jax.device_get(self.state.x))

    def block(self):
        jax.block_until_ready(self.state.x)
        return self
