"""Jacobi-dialect solver on the Pallas pass kernels -- big single scenes.

Same physics contract as solver/jacobi.py (the Unity in-engine semantics:
SoftBodySolver.cs:349-527 + the manager substep orchestration,
SoftBodyManager.cs:199-237), with each gather+apply stage running as ONE
Pallas kernel (kernels/jacobi.py) over a VMEM-resident particle table.
Unlike the XPBD Pallas backend there is NO ordering approximation: pure
Jacobi reads one snapshot per pass, so this matches the segment/gather
backends (and tests/oracle.py::JacobiOracle) up to fp32 summation order.

Supported feature set (the scene hot path): ground plane, primitive
colliders (static or per-step poses), stiffness/omega overrides,
spatial-hash self/inter-body collision, and vertex-triangle surface
collision (the XLA hash stages from solver/spatial.py and
solver/surface_collide.py run between the Pallas passes on the permuted
row layout -- hashing is vertex-order agnostic, triangle corner ids are
remapped to row space, dead layout lanes are statically isolated far
from the scene).  Bodies with local-space transforms or Chebyshev
acceleration fall back to the XLA backends (solver/jacobi.py routes
them).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import SimState, SolverParams
from ..collide.primitives import (
    Colliders, collide_particles, project_ground_plane)
from ..kernels import sweep as sw
from ..kernels.jacobi import make_jacobi_pass
from .spatial import make_self_collision_fn
from .xpbd_pallas import _cached_plans

LANES = 128


def make_jacobi_pallas_step(topology, params: SolverParams,
                            colliders: Optional[Colliders] = None,
                            *, interpret: Optional[bool] = None,
                            vertex_order: str = "auto",
                            slots_cap: Optional[int] = None,
                            layer_cap: Optional[int] = None,
                            edge_k=None, tet_k=None):
    """Build ``step(state, dt, ...) -> state`` on the Pallas Jacobi passes.

    Carries ``step.step_n(state, dt, n)`` like the other backends (layout
    boundary paid once per call).

    The returned step is PRE-JITTED (``step.prejit = True``; Engine skips
    its own jax.jit wrap): the >100 MB packed plan tables enter the jit as
    arguments, not closure constants, so trace+lower stays seconds instead
    of ~40 s of HLO-literal embedding per process.  Consumers must not
    re-wrap it in jax.jit -- an outer trace would capture the tables as
    constants again.

    edge_k / tet_k: optional (E,)/(T,) per-constraint stiffness in public
    constraint order (mixed-material merged scenes: the reference's
    per-SoftBodySolver stiffness).  Step-time edge_stiffness /
    volume_stiffness overrides then MULTIPLY the tables (default 1.0).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret and jax.config.jax_compilation_cache_dir:
        # see solver/xpbd_pallas.py: jax 0.9 persistent-cache deserialization
        # segfaults on interpret-mode pallas_calls
        jax.config.update("jax_compilation_cache_dir", None)

    V = topology.num_particles
    has_edges = topology.num_edges > 0
    has_tets = topology.num_tets > 0

    perm, old2new, nwin, e_plan, t_plan = _cached_plans(
        topology, vertex_order, slots_cap, layer_cap, True)
    vpad = nwin * LANES

    edge_pass = tet_pass = None
    if has_edges:
        edge_pass = make_jacobi_pass(e_plan, nwin, interpret=interpret,
                                     per_constraint_k=edge_k)
    if has_tets:
        tet_pass = make_jacobi_pass(t_plan, nwin, interpret=interpret,
                                    per_constraint_k=tet_k)
    # iso rides the tables tuple (appended after self_collide is built
    # below) so it enters the jit as an argument, never a closure constant
    # (12 MB of HLO literal at 1M particles otherwise).
    base_tables = (edge_pass.tables if has_edges else (),
                   tet_pass.tables if has_tets else (),
                   jnp.asarray(perm), jnp.asarray(old2new))
    gravity = jnp.asarray(params.gravity, jnp.float32)
    radius = max(1e-6, params.particle_radius)
    ground_point = jnp.asarray(params.ground_point, jnp.float32)
    gn = np.asarray(params.ground_normal, np.float32)
    n2 = float(np.dot(gn, gn))
    ground_normal = jnp.asarray(
        gn / np.float32(np.sqrt(n2)) if n2 >= 1e-12
        else np.array([0.0, 1.0, 0.0], np.float32))
    k_colliders = 0 if colliders is None else colliders.count
    do_collide = params.ground_enabled or k_colliders > 0

    # Spatial-hash self/inter-body collision (solver/spatial.py) on the
    # permuted layout: hashing only reads positions, so vertex order is
    # irrelevant.  Dead layout lanes (perm == V: tail pad + component-
    # alignment gaps) sit at the sentinel origin and would otherwise shove
    # nearby live particles, so a static offset table parks each dead lane
    # in its own far-away hash cell (> one cell AND > 2*radius apart).
    # Results match the XLA backends' hit set exactly when max_per_cell
    # does not truncate; summation order differs at the fp32 ULP level.
    self_collide = None
    surf_collide = None
    iso = jnp.zeros((3, 0), jnp.float32)
    if params.self_collision or (params.surface_collision
                                 and len(topology.surface_tris)):
        cell = (float(params.self_collision_cell) if params.self_collision
                else max(float(params.surface_thickness), 2.0 * radius))
        spacing = 2.0 * max(cell, 2.0 * radius,
                            float(params.surface_thickness))
        perm_np = np.asarray(perm)
        dead = perm_np == V
        iso_np = np.zeros((3, vpad), np.float32)
        iso_np[0] = np.where(
            dead, np.float32(1e6) * cell + np.arange(vpad) * spacing, 0.0)
        iso = jnp.asarray(iso_np)
    if params.self_collision:
        # cap autosize (cap == 0) sizes off the rest positions in THIS
        # layout -- live rows at their rest coordinates, dead lanes parked
        rest_rows = iso_np.T.copy()
        rest_rows[~dead] = np.asarray(
            topology.vertices, np.float32)[perm_np[~dead]]
        self_collide = make_self_collision_fn(
            params, rest_rows, num_particles=vpad)
    if params.surface_collision and len(topology.surface_tris):
        # Vertex-triangle surface contact on the SAME permuted row layout:
        # hashing/geometry only read positions, and triangle corner ids are
        # remapped old->row (old2new) so the gathers stay in row space.
        # Dead-lane query points sit in their far-away iso cells (any
        # hash-bucket collision with a real triangle fails dist<thickness),
        # and w==0 rows are never written back.  Cell autosize uses the
        # original-order rest mesh (layout-independent scalar).
        from .surface_collide import (make_surface_collision_fn,
                                      suggested_cell_size)

        sparams = params
        if params.surface_collision_cell <= 0.0:
            sparams = params.replace(surface_collision_cell=(
                suggested_cell_size(topology.vertices, topology.surface_tris,
                                    params.surface_thickness)))
        row_tris = np.asarray(old2new)[
            np.asarray(topology.surface_tris, np.int64).reshape(-1, 3)]
        surf_collide = make_surface_collision_fn(sparams, row_tris)
    tables = base_tables + (iso,)

    # ---- public <-> internal layout --------------------------------------
    # perm entries == V are dead slots (tail pad + component-alignment
    # gaps): they gather a sentinel zero row and stay pinned (w=0).

    def to_rows(state: SimState, perm_j):
        def rows3(a):
            ap = jnp.concatenate(
                [a, jnp.zeros((1, a.shape[1]), a.dtype)], axis=0)
            return ap[perm_j].T
        w = jnp.concatenate(
            [state.inv_mass, jnp.zeros((1,), jnp.float32)])[perm_j]
        x8 = jnp.concatenate(
            [rows3(state.x), w[None, :], jnp.zeros((4, vpad), jnp.float32)],
            axis=0)
        return (x8, rows3(state.v))

    def to_public(carry, state: SimState, old2new_j) -> SimState:
        x8, vv = carry

        def unrows(rows):
            return rows.T[old2new_j]

        x = unrows(x8[0:3])
        return SimState(
            x=x, v=unrows(vv), x_star=x, inv_mass=state.inv_mass,
            edge_lambda=state.edge_lambda, tet_lambda=state.tet_lambda,
        )

    # ---- substep pieces ---------------------------------------------------

    def collide(x8, cols_rt):
        free = x8[3] != 0.0
        if k_colliders == 0:
            # ground-only: project directly on the (3, Vpad) row layout --
            # the (V,3) transpose round trip otherwise costs two full-table
            # shuffles per iteration
            p = x8[0:3]
            d = (jnp.sum(p * ground_normal[:, None], axis=0)
                 - jnp.dot(ground_normal, ground_point) - radius)
            pushed = p - ground_normal[:, None] * jnp.minimum(d, 0.0)
            return x8.at[0:3].set(jnp.where(free, pushed, p))
        p = x8[0:3].T
        if params.ground_enabled:
            p = project_ground_plane(p, radius, ground_point, ground_normal)
        p = collide_particles(
            p, radius, cols_rt if cols_rt is not None else colliders)
        return x8.at[0:3].set(jnp.where(free, p.T, x8[0:3]))

    def substep(carry, sdt, k_edge, k_vol, omega, cols_rt, e_tabs, t_tabs,
                iso_t):
        x8, vv = carry
        # PreSolve (SoftBodySolver.cs:349-362)
        free = x8[3:4] != 0.0
        vv = jnp.where(free, vv + gravity[:, None] * sdt, 0.0)
        xp = x8[0:3]
        x8 = x8.at[0:3].set(jnp.where(free, xp + vv * sdt, xp))

        def iteration(x8, _):
            if has_edges:
                x8 = edge_pass(x8, k_edge, omega, e_tabs)
            if has_tets:
                x8 = tet_pass(x8, k_vol, omega, t_tabs)
            if do_collide:
                x8 = collide(x8, cols_rt)
            if self_collide is not None:
                # same per-iteration slot as the XLA backends' stage order
                # (edge -> tet -> ground/colliders -> self); live lanes have
                # iso == 0, dead/pinned lanes (w == 0) are never written
                p = self_collide((x8[0:3] + iso_t).T, x8[3], radius)
                x8 = x8.at[0:3].set(
                    jnp.where(x8[3] != 0.0, p.T, x8[0:3]))
            if surf_collide is not None:
                p = surf_collide((x8[0:3] + iso_t).T, x8[3])
                x8 = x8.at[0:3].set(
                    jnp.where(x8[3] != 0.0, p.T, x8[0:3]))
            return x8, None

        if not params.chebyshev:
            x8, _ = jax.lax.scan(iteration, x8, None,
                                 length=params.iterations)
        else:
            # Chebyshev semi-iterative acceleration -- the same omega_k
            # recurrence as the XLA jacobi path (solver/jacobi.py), blended
            # on the position rows of the x8 table between pass kernels.
            # Pinned and dead lanes are untouched: their jacobi update is
            # the identity, so the blend collapses to the carried value.
            rho2 = jnp.float32(float(params.chebyshev_rho) ** 2)

            def cheby_body(carry_it, it_idx):
                x8c, x_prev, om_prev = carry_it
                x8j, _ = iteration(x8c, None)
                om = jnp.where(
                    it_idx < params.chebyshev_delay, 1.0,
                    jnp.where(it_idx == params.chebyshev_delay,
                              2.0 / (2.0 - rho2),
                              4.0 / (4.0 - rho2 * om_prev)))
                x_next = om * (x8j[0:3] - x_prev) + x_prev
                return (x8j.at[0:3].set(x_next), x8c[0:3], om), None

            (x8, _, _), _ = jax.lax.scan(
                cheby_body, (x8, x8[0:3], jnp.float32(1.0)),
                jnp.arange(params.iterations))

        # PostSolve (SoftBodySolver.cs:364-377)
        inv_dt = jnp.where(sdt > 0.0, 1.0 / sdt, 0.0)
        vv = jnp.where(free, (x8[0:3] - xp) * inv_dt, 0.0)
        return (x8, vv)

    def _run_rows(carry, dt, n, k_edge, k_vol, omega, cols_rt,
                  e_tabs, t_tabs, iso_t):
        ss = max(1, params.substeps)
        sdt = jnp.asarray(dt, jnp.float32) / ss

        # v7 w-fill prologue: inverse masses are invariant across the whole
        # program, so the streamed w tables are materialized ONCE here
        if has_edges:
            e_tabs = edge_pass.fill_w(carry[0], e_tabs)
        if has_tets:
            t_tabs = tet_pass.fill_w(carry[0], t_tabs)

        def one_step(c, _):
            def one_sub(c2, _):
                return substep(c2, sdt, k_edge, k_vol, omega, cols_rt,
                               e_tabs, t_tabs, iso_t), None
            c, _ = jax.lax.scan(one_sub, c, None, length=ss)
            return c, None

        carry, _ = jax.lax.scan(one_step, carry, None, length=n)
        return carry

    def _run(tables, state, dt, n, k_edge, k_vol, omega, cols_rt):
        e_tabs, t_tabs, perm_j, old2new_j, iso_t = tables
        carry = to_rows(state, perm_j)
        carry = _run_rows(carry, dt, n, k_edge, k_vol, omega, cols_rt,
                          e_tabs, t_tabs, iso_t)
        return to_public(carry, state, old2new_j)

    _jit_run = jax.jit(_run, static_argnums=3, donate_argnums=1)

    # ---- carry API: the layout boundary paid once per transfer -----------
    # Same contract as solver/xpbd_pallas.py (the jacobi carry is just
    # (x8, v-rows) -- no lambda state): the Engine keeps the row layout
    # resident in HBM across step()/run() calls and materializes the
    # public state lazily.  carry_positions streams committed positions
    # (one row gather) for render/serve loops.

    def _pack(tables, state):
        return to_rows(state, tables[2])

    def _run_c(tables, carry, dt, n, k_edge, k_vol, omega, cols_rt):
        return _run_rows(carry, dt, n, k_edge, k_vol, omega, cols_rt,
                         tables[0], tables[1], tables[4])

    def _unpack(tables, carry, state):
        return to_public(carry, state, tables[3])

    def _carry_x(tables, carry):
        return carry[0][0:3].T[tables[3]]

    _jit_pack = jax.jit(_pack)
    _jit_run_c = jax.jit(_run_c, static_argnums=3, donate_argnums=1)
    _jit_unpack = jax.jit(_unpack)
    _jit_carry_x = jax.jit(_carry_x)

    def pack_state(state: SimState):
        """Public state -> internal carry.  Does NOT donate: the caller
        keeps the state object as the template for unpack_state."""
        return _jit_pack(tables, state)

    def run_carry(carry, dt, n: int, edge_stiffness=None,
                  volume_stiffness=None, sor_omega=None,
                  colliders_rt: Optional[Colliders] = None):
        """n steps on the internal carry (donated); no boundary cost."""
        ke, kv, om = _resolve(edge_stiffness, volume_stiffness, sor_omega,
                              colliders_rt)
        return _jit_run_c(tables, carry, dt, int(n), ke, kv, om,
                          colliders_rt)

    def unpack_state(carry, state: SimState) -> SimState:
        """Carry -> public state.  Does NOT donate the carry: ``state``
        supplies inv_mass and the (constant) lambda placeholders."""
        return _jit_unpack(tables, carry, state)

    def carry_positions(carry):
        """Committed positions (V,3) straight off the carry."""
        return _jit_carry_x(tables, carry)[:V]

    def _resolve(edge_stiffness, volume_stiffness, sor_omega, cols_rt):
        if cols_rt is not None and colliders is None:
            raise ValueError(
                "runtime colliders require a make-time collider template")
        # with per-constraint tables, the scalar is a multiplier on them
        k_edge = jnp.asarray(
            (1.0 if edge_k is not None else params.edge_stiffness)
            if edge_stiffness is None else edge_stiffness, jnp.float32)
        k_vol = jnp.asarray(
            (1.0 if tet_k is not None else params.volume_stiffness)
            if volume_stiffness is None else volume_stiffness, jnp.float32)
        omega = jnp.asarray(
            params.sor_omega if sor_omega is None else sor_omega,
            jnp.float32)
        return k_edge, k_vol, omega

    def step(state: SimState, dt, edge_stiffness=None, volume_stiffness=None,
             sor_omega=None,
             colliders_rt: Optional[Colliders] = None) -> SimState:
        ke, kv, om = _resolve(edge_stiffness, volume_stiffness, sor_omega,
                              colliders_rt)
        return _jit_run(tables, state, dt, 1, ke, kv, om, colliders_rt)

    def step_n(state: SimState, dt, n: int, edge_stiffness=None,
               volume_stiffness=None, sor_omega=None,
               colliders_rt: Optional[Colliders] = None) -> SimState:
        ke, kv, om = _resolve(edge_stiffness, volume_stiffness, sor_omega,
                              colliders_rt)
        return _jit_run(tables, state, dt, int(n), ke, kv, om, colliders_rt)

    step.step_n = step_n
    step.prejit = True
    step_n.prejit = True
    step.pack_state = pack_state
    step.run_carry = run_carry
    step.unpack_state = unpack_state
    step.carry_positions = carry_positions
    return step
