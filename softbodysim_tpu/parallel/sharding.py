"""Multi-chip sharding: scene-batch data parallelism + constraint-model
parallelism over a jax.sharding.Mesh.

The reference's scale-out story is one TCP socket to one C++ server
(SURVEY.md section 2, "Distributed communication backend").  TPU-native, the
socket hop is replaced by XLA collectives over ICI:

  - DATA axis: independent scenes sharded along the leading batch dim; zero
    collectives on the hot path (scenes never talk to each other -- the
    analog of the manager's per-body independence).
  - MODEL axis: one scene's constraints sharded across devices; each device
    computes partial Jacobi deltas/counts for its constraint shard and a
    ``psum`` over the model axis reassembles the full per-particle delta
    (positions replicated -- the same gather/apply phase separation the
    reference uses for race-freedom, SoftBodySolver.cs:379-392, here made
    cross-chip).

Both compose into a 2D (data, model) mesh in make_mesh_sharded_step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.state import SimState, SolverParams
from ..core.topology import Topology
from ..collide.primitives import Colliders, collide_particles, project_ground_plane
from ..solver.jacobi import (
    apply_delta, edge_jacobi_deltas, tet_jacobi_deltas)
from .batching import init_batch_state


def make_mesh(shape=None, axis_names=("data", "model"), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        # favor data parallelism; give the model axis a factor of 2 if
        # available so both kinds of sharding are exercised
        model = 2 if n % 2 == 0 and n > 1 else 1
        shape = (n // model, model)
    mesh_devices = np.asarray(devices).reshape(shape)
    return Mesh(mesh_devices, axis_names=axis_names)


def shard_batch(state: SimState, mesh: Mesh, axis: str = "data") -> SimState:
    """Place a batched SimState with its leading scene axis sharded."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), state)


def _pad_to_multiple(arr: np.ndarray, m: int, fill=0):
    n = arr.shape[0]
    pad = (-n) % m
    if pad == 0:
        return arr
    pad_block = np.full((pad,) + arr.shape[1:], fill, arr.dtype)
    return np.concatenate([arr, pad_block], axis=0)


def make_mesh_sharded_step(topology: Topology, params: SolverParams,
                           mesh: Mesh,
                           colliders: Optional[Colliders] = None,
                           data_axis: str = "data",
                           model_axis: str = "model"):
    """Jacobi-dialect step over a (data, model) mesh.

    Returns ``step(state_batched, dt) -> state_batched`` where the state has
    a leading scene axis sharded over ``data_axis`` and each scene's edge/tet
    constraint work is sharded over ``model_axis`` with psum reassembly.

    Padding: constraint arrays are padded to a multiple of the model-axis
    size with degenerate entries (edge (0,0) fails the len^2 >= 1e-18 guard;
    tet (0,0,0,0) fails wsum >= 1e-20), so pads are exact no-ops -- the same
    masking trick the colored sweeps use.
    """
    nm = mesh.shape[model_axis]
    nv = topology.num_particles

    edges = _pad_to_multiple(topology.edges.astype(np.int32), nm)
    edge_rest = _pad_to_multiple(topology.edge_rest.astype(np.float32), nm)
    tets = _pad_to_multiple(topology.tets.astype(np.int32), nm)
    tet_rest = _pad_to_multiple(topology.tet_rest_vol.astype(np.float32), nm)
    has_edges = topology.num_edges > 0
    has_tets = topology.num_tets > 0

    gravity = jnp.asarray(params.gravity, jnp.float32)
    ground_point = jnp.asarray(params.ground_point, jnp.float32)
    gn = np.asarray(params.ground_normal, np.float64)
    gn = gn / max(1e-12, np.linalg.norm(gn))
    ground_normal = jnp.asarray(gn, jnp.float32)
    radius = max(1e-6, params.particle_radius)
    k_cols = 0 if colliders is None else colliders.count

    k_edge = jnp.float32(params.edge_stiffness)
    k_vol = jnp.float32(params.volume_stiffness)
    omega = jnp.float32(params.sor_omega)

    def local_scene_step(state: SimState, sdt, e, er, t, tr) -> SimState:
        """One scene, local constraint shards; psum over model axis."""

        def iteration(carry, _):
            x_pred, inv_mass = carry
            if has_edges:
                delta, cnt = edge_jacobi_deltas(
                    x_pred, inv_mass, e, er, k_edge, nv)
                delta = jax.lax.psum(delta, model_axis)
                cnt = jax.lax.psum(cnt, model_axis)
                x_pred = apply_delta(x_pred, inv_mass, delta, cnt, omega)
            if has_tets:
                delta, cnt = tet_jacobi_deltas(
                    x_pred, inv_mass, t, tr, k_vol, nv)
                delta = jax.lax.psum(delta, model_axis)
                cnt = jax.lax.psum(cnt, model_axis)
                x_pred = apply_delta(x_pred, inv_mass, delta, cnt, omega)
            if params.ground_enabled or k_cols > 0:
                pw = x_pred
                if params.ground_enabled:
                    pw = project_ground_plane(pw, radius, ground_point,
                                              ground_normal)
                if k_cols > 0:
                    pw = collide_particles(pw, radius, colliders)
                x_pred = jnp.where((inv_mass != 0.0)[:, None], pw, x_pred)
            return (x_pred, inv_mass), None

        def substep(st, _):
            pinned = (st.inv_mass == 0.0)[:, None]
            v = jnp.where(pinned, 0.0, st.v + gravity * sdt)
            x_pred = jnp.where(pinned, st.x, st.x + v * sdt)
            (x_pred, _), _ = jax.lax.scan(
                iteration, (x_pred, st.inv_mass), None,
                length=params.iterations)
            inv_dt = jnp.where(sdt > 0.0, 1.0 / sdt, 0.0)
            v = jnp.where(pinned, 0.0, (x_pred - st.x) * inv_dt)
            x = jnp.where(pinned, st.x, x_pred)
            return SimState(x=x, v=v, x_star=x, inv_mass=st.inv_mass,
                            edge_lambda=st.edge_lambda,
                            tet_lambda=st.tet_lambda), None

        state, _ = jax.lax.scan(substep, state, None,
                                length=max(1, params.substeps))
        return state

    def shard_body(state_local, dt, e, er, t, tr):
        sdt = jnp.asarray(dt, jnp.float32) / max(1, params.substeps)
        return jax.vmap(
            lambda s: local_scene_step(s, sdt, e, er, t, tr))(state_local)

    state_spec = P(data_axis)
    cons_spec = P(model_axis)

    sharded = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(state_spec, P(), cons_spec, cons_spec, cons_spec,
                  cons_spec),
        out_specs=state_spec,
        check_vma=False,
    )

    e_j = jnp.asarray(edges)
    er_j = jnp.asarray(edge_rest)
    t_j = jnp.asarray(tets)
    tr_j = jnp.asarray(tet_rest)

    def step(state_batched: SimState, dt) -> SimState:
        return sharded(state_batched, jnp.asarray(dt, jnp.float32),
                       e_j, er_j, t_j, tr_j)

    return step


def make_data_parallel_step(topology: Topology, params: SolverParams,
                            mesh: Mesh,
                            colliders: Optional[Colliders] = None,
                            axis: str = "data"):
    """Pure scene-batch data parallelism: jit with sharded in/out so XLA
    partitions the vmapped step along the scene axis (zero collectives)."""
    from .batching import make_batched_step

    fn = make_batched_step(topology, params, colliders=colliders)
    sharding = NamedSharding(mesh, P(axis))

    def place(state):
        return jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(a, sharding), state)

    def step(state, dt):
        return place(fn(place(state), dt))

    return step
