"""Heterogeneous batched scenes: different meshes, one vmapped program.

The reference's multi-mesh scenes (ExtremeTest: 16 balls + 8 fumos;
BatchTest: 10 small + 10 large bodies) iterate bodies one GPU dispatch at a
time (SoftBodyManager.cs:217-233).  TPU-native, bodies of *different*
topologies batch into one program: per-scene padded adjacency arrays become
traced vmap operands (the jacobi gather formulation takes topology as plain
arrays), with padding rows masked out and padded particles pinned (w=0).

This turns a whole reference benchmark scene into a single jitted step.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import SimState, SolverParams, init_state
from ..core.topology import Topology
from ..core.adjacency import padded_edge_adjacency, padded_tet_adjacency
from ..collide.primitives import (
    Colliders, collide_particles, project_ground_plane)
from ..solver.jacobi import (
    apply_delta, edge_gather_deltas, tet_phase_a, tet_phase_b)


def _pad2(a, shape, fill=0):
    out = np.full(shape, fill, a.dtype)
    out[tuple(slice(0, s) for s in a.shape)] = a
    return out


class HeteroBatch:
    """Padded per-scene topology arrays for a list of bodies."""

    def __init__(self, topologies: Sequence[Topology], params: SolverParams,
                 pinned: Optional[List] = None, density: float = 1.0):
        self.topologies = list(topologies)
        b = len(self.topologies)
        v_max = max(t.num_particles for t in self.topologies)
        t_max = max(max(t.num_tets for t in self.topologies), 1)

        e_adj = []
        t_adj = []
        for topo in self.topologies:
            other, eidx, mask = padded_edge_adjacency(
                topo.num_particles, topo.edges)
            e_adj.append((other, topo.edge_rest[eidx], mask))
            tidx, role, tmask = padded_tet_adjacency(
                topo.num_particles, topo.tets)
            slot = role.astype(np.int64) * t_max + tidx  # note: global Tmax
            t_adj.append((slot, tidx, tmask))

        de = max(a[0].shape[1] for a in e_adj)
        dt = max(a[0].shape[1] for a in t_adj)

        self.e_other = np.stack([
            _pad2(a[0], (v_max, de)) for a in e_adj]).astype(np.int32)
        self.e_rest = np.stack([
            _pad2(a[1].astype(np.float32), (v_max, de)) for a in e_adj])
        self.e_mask = np.stack([
            _pad2(a[2], (v_max, de), False) for a in e_adj])
        self.t_slot = np.stack([
            _pad2(a[0], (v_max, dt)) for a in t_adj]).astype(np.int32)
        self.t_tidx = np.stack([
            _pad2(a[1], (v_max, dt)) for a in t_adj]).astype(np.int32)
        self.t_mask = np.stack([
            _pad2(a[2], (v_max, dt), False) for a in t_adj])

        # per-scene tets + rest volumes padded to t_max (degenerate
        # all-zero tets fail the wsum guard -> no-ops)
        self.tets = np.stack([
            _pad2(t.tets.astype(np.int32), (t_max, 4))
            for t in self.topologies])
        self.tet_rest = np.stack([
            _pad2(t.tet_rest_vol.astype(np.float32), (t_max,))
            for t in self.topologies])

        # state: pad particles as pinned dummies at the origin
        xs, ws = [], []
        inv_mode = "tet" if params.dialect == "xpbd" else "density"
        for i, topo in enumerate(self.topologies):
            st = init_state(
                topo, pinned=None if pinned is None else pinned[i],
                inv_mass_mode=inv_mode, density=density)
            xs.append(_pad2(np.asarray(st.x), (v_max, 3)))
            ws.append(_pad2(np.asarray(st.inv_mass), (v_max,)))
        x0 = np.stack(xs)
        w0 = np.stack(ws)
        self.v_max, self.t_max, self.batch = v_max, t_max, b
        self.state = SimState(
            x=jnp.asarray(x0), v=jnp.zeros((b, v_max, 3), jnp.float32),
            x_star=jnp.asarray(x0.copy()), inv_mass=jnp.asarray(w0),
            edge_lambda=jnp.zeros((b, 1), jnp.float32),
            tet_lambda=jnp.zeros((b, 1), jnp.float32))

    def slices(self):
        return [slice(0, t.num_particles) for t in self.topologies]


def make_hetero_step(batch: HeteroBatch, params: SolverParams,
                     colliders: Optional[Colliders] = None):
    """One jitted jacobi step over all scenes of a HeteroBatch."""
    if params.dialect != "jacobi":
        raise ValueError("hetero batching currently supports the jacobi "
                         "dialect (the reference's multi-mesh scenes are "
                         "GPU==jacobi scenes)")
    gravity = jnp.asarray(params.gravity, jnp.float32)
    gp = jnp.asarray(params.ground_point, jnp.float32)
    gn = np.asarray(params.ground_normal, np.float64)
    gn = jnp.asarray(gn / max(1e-12, np.linalg.norm(gn)), jnp.float32)
    radius = max(1e-6, params.particle_radius)
    k_cols = 0 if colliders is None else colliders.count
    k_edge = jnp.float32(params.edge_stiffness)
    k_vol = jnp.float32(params.volume_stiffness)
    omega = jnp.float32(params.sor_omega)

    eo = jnp.asarray(batch.e_other)
    er = jnp.asarray(batch.e_rest)
    em = jnp.asarray(batch.e_mask)
    ts = jnp.asarray(batch.t_slot)
    tt = jnp.asarray(batch.t_tidx)
    tm = jnp.asarray(batch.t_mask)
    tets = jnp.asarray(batch.tets)
    tet_rest = jnp.asarray(batch.tet_rest)

    def scene_step(st, sdt, eo, er, em, ts, tt, tm, tets, tet_rest):
        def iteration(carry, _):
            x_pred, w = carry
            d, c = edge_gather_deltas(x_pred, w, eo, er, em, k_edge)
            x_pred = apply_delta(x_pred, w, d, c, omega)
            glam, valid = tet_phase_a(x_pred, w, tets, tet_rest, k_vol)
            d, c = tet_phase_b(glam, valid, w, ts, tt, tm)
            x_pred = apply_delta(x_pred, w, d, c, omega)
            if params.ground_enabled or k_cols > 0:
                pw = x_pred
                if params.ground_enabled:
                    pw = project_ground_plane(pw, radius, gp, gn)
                if k_cols > 0:
                    pw = collide_particles(pw, radius, colliders)
                x_pred = jnp.where((w != 0.0)[:, None], pw, x_pred)
            return (x_pred, w), None

        def substep(s, _):
            pinned = (s.inv_mass == 0.0)[:, None]
            v = jnp.where(pinned, 0.0, s.v + gravity * sdt)
            x_pred = jnp.where(pinned, s.x, s.x + v * sdt)
            (x_pred, _), _ = jax.lax.scan(
                iteration, (x_pred, s.inv_mass), None,
                length=params.iterations)
            inv_dt = jnp.where(sdt > 0.0, 1.0 / sdt, 0.0)
            v = jnp.where(pinned, 0.0, (x_pred - s.x) * inv_dt)
            x = jnp.where(pinned, s.x, x_pred)
            return SimState(x=x, v=v, x_star=x, inv_mass=s.inv_mass,
                            edge_lambda=s.edge_lambda,
                            tet_lambda=s.tet_lambda), None

        st, _ = jax.lax.scan(substep, st, None,
                             length=max(1, params.substeps))
        return st

    vstep = jax.vmap(scene_step,
                     in_axes=(0, None, 0, 0, 0, 0, 0, 0, 0, 0))

    def step(state, dt):
        sdt = jnp.asarray(dt, jnp.float32) / max(1, params.substeps)
        return vstep(state, sdt, eo, er, em, ts, tt, tm, tets, tet_rest)

    return step


class HeteroEngine:
    """Engine wrapper: a whole multi-mesh scene as one program."""

    def __init__(self, topologies: Sequence[Topology], params: SolverParams,
                 colliders: Optional[Colliders] = None, pinned=None,
                 density: float = 1.0):
        self.batch = HeteroBatch(topologies, params, pinned=pinned,
                                 density=density)
        self.state = self.batch.state
        self._step = jax.jit(make_hetero_step(self.batch, params,
                                              colliders=colliders),
                             donate_argnums=0)

    def step(self, dt: float = 1.0 / 60.0):
        self.state = self._step(self.state, dt)
        return self

    def positions(self) -> List[np.ndarray]:
        xs = np.asarray(jax.device_get(self.state.x))
        return [xs[i, s] for i, s in enumerate(self.batch.slices())]

    def block(self):
        jax.block_until_ready(self.state.x)
        return self
