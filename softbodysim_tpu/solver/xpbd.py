"""XPBD solver -- the C++ PBDServer physics contract, TPU-native.

Reference semantics (CProgram/src/Sim.cpp):
  predict           Sim.cpp:178-185   (pinned: x* = x, velocity untouched)
  solve_edges_xpbd  Sim.cpp:100-130   (compliance alpha = comp/dt^2,
                                       dlambda = (-C - alpha*lambda)/(wSum+alpha),
                                       lambda accumulates, zeroed only at init)
  solve_tets_xpbd   Sim.cpp:132-173   (volume-gradient form, signed rest vol)
  project_ground    Sim.cpp:187-195   (axis-aligned y clamp)
  commit            Sim.cpp:197-222   (v=(x*-x)/dt, ground friction damps
                                       vx/vz and zeroes downward vy)
  substep loop      Sim.cpp:280-305   (predict -> iters x (edges, tets,
                                       ground) -> commit)

The sequential Gauss-Seidel sweeps become *graph-colored* sweeps: constraints
within a color share no vertex (core/topology.py), so projecting one color in
parallel is exactly the serial result.  Colors run under ``lax.scan`` with
padded (C, K) index groups; iterations and substeps are ``lax.scan`` too, so
one XLA compilation covers any iteration/substep count.

Float behavior mirrors the reference: fp32 everywhere, the same 1e-12 /
1e-20 guards (Sim.cpp:101,114,157).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.state import SimState, SolverParams, tet_signed_volume
from ..collide.primitives import Colliders, collide_particles
from .spatial import make_self_collision_fn


def _f32(x):
    return jnp.asarray(x, jnp.float32)


def edge_color_sweep(x_star, edge_lambda, inv_mass, edges, edge_rest,
                     color_idx, color_mask, alpha):
    """Project one color's distance constraints in parallel.

    Padded slots (mask False) are forced to dlambda == 0, so the scatter-adds
    below are no-ops for them even when pad indices collide.
    """
    ids = color_idx
    mask = color_mask
    i0 = edges[ids, 0]
    i1 = edges[ids, 1]
    w0 = inv_mass[i0]
    w1 = inv_mass[i1]
    w_sum = w0 + w1

    p0 = x_star[i0]
    p1 = x_star[i1]
    d = p0 - p1
    length = jnp.sqrt(jnp.sum(d * d, axis=-1))

    valid = mask & (w_sum != 0.0) & (length >= 1e-12)

    c = length - edge_rest[ids]
    lam = edge_lambda[ids]
    denom = w_sum + alpha
    dlam = jnp.where(valid, (-c - alpha * lam) / jnp.where(denom == 0.0, 1.0, denom), 0.0)

    n = d * (1.0 / jnp.where(length < 1e-12, 1.0, length))[:, None]
    corr = n * dlam[:, None]

    x_star = x_star.at[i0].add(corr * w0[:, None])
    x_star = x_star.at[i1].add(-corr * w1[:, None])
    edge_lambda = edge_lambda.at[ids].add(dlam)
    return x_star, edge_lambda


def tet_color_sweep(x_star, tet_lambda, inv_mass, tets, tet_rest_vol,
                    color_idx, color_mask, alpha):
    """Project one color's volume constraints in parallel (Sim.cpp:132-173)."""
    ids = color_idx
    mask = color_mask
    a = tets[ids, 0]
    b = tets[ids, 1]
    c_ = tets[ids, 2]
    d_ = tets[ids, 3]
    wa, wb, wc, wd = inv_mass[a], inv_mass[b], inv_mass[c_], inv_mass[d_]

    pa, pb, pc, pd = x_star[a], x_star[b], x_star[c_], x_star[d_]

    ga = jnp.cross(pd - pb, pc - pb) * (1.0 / 6.0)
    gb = jnp.cross(pc - pa, pd - pa) * (1.0 / 6.0)
    gc = jnp.cross(pd - pa, pb - pa) * (1.0 / 6.0)
    gd = jnp.cross(pb - pa, pc - pa) * (1.0 / 6.0)

    w_sum = (
        wa * jnp.sum(ga * ga, -1)
        + wb * jnp.sum(gb * gb, -1)
        + wc * jnp.sum(gc * gc, -1)
        + wd * jnp.sum(gd * gd, -1)
    )

    valid = mask & ((wa + wb + wc + wd) != 0.0) & (w_sum >= 1e-20)

    vol = tet_signed_volume(pa, pb, pc, pd)
    cfn = vol - tet_rest_vol[ids]
    lam = tet_lambda[ids]
    denom = w_sum + alpha
    dlam = jnp.where(valid, (-cfn - alpha * lam) / jnp.where(denom == 0.0, 1.0, denom), 0.0)

    x_star = x_star.at[a].add(ga * (wa * dlam)[:, None])
    x_star = x_star.at[b].add(gb * (wb * dlam)[:, None])
    x_star = x_star.at[c_].add(gc * (wc * dlam)[:, None])
    x_star = x_star.at[d_].add(gd * (wd * dlam)[:, None])
    tet_lambda = tet_lambda.at[ids].add(dlam)
    return x_star, tet_lambda


def predict(state: SimState, gravity, sdt) -> SimState:
    """Semi-implicit Euler predict (Sim.cpp:178-185)."""
    pinned = (state.inv_mass == 0.0)[:, None]
    v = jnp.where(pinned, state.v, state.v + gravity * sdt)
    x_star = jnp.where(pinned, state.x, state.x + v * sdt)
    return SimState(
        x=state.x, v=v, x_star=x_star, inv_mass=state.inv_mass,
        edge_lambda=state.edge_lambda, tet_lambda=state.tet_lambda,
    )


def project_ground(x_star, inv_mass, ground_y):
    """Axis-aligned ground clamp (Sim.cpp:187-195)."""
    y = x_star[:, 1]
    clamped = jnp.maximum(y, ground_y)
    y_new = jnp.where(inv_mass == 0.0, y, clamped)
    return x_star.at[:, 1].set(y_new)


def commit(state: SimState, params: SolverParams, sdt,
           friction=None) -> SimState:
    """Velocity update + ground friction + position commit (Sim.cpp:197-222).

    ``friction``: optional traced override of ``params.friction`` (per-scene
    under vmap; fittable by ``softbodysim_tpu.diff``)."""
    inv_dt = jnp.where(sdt > 1e-12, 1.0 / sdt, 0.0)
    fr = (jnp.clip(friction, 0.0, 1.0) if friction is not None
          else min(1.0, max(0.0, params.friction)))

    pinned = (state.inv_mass == 0.0)[:, None]
    vel = (state.x_star - state.x) * inv_dt

    if params.ground_enabled:
        on_ground = state.x_star[:, 1] <= (params.ground_y + 1e-6)
        vx = jnp.where(on_ground, vel[:, 0] * (1.0 - fr), vel[:, 0])
        vz = jnp.where(on_ground, vel[:, 2] * (1.0 - fr), vel[:, 2])
        vy = jnp.where(on_ground & (vel[:, 1] < 0.0), 0.0, vel[:, 1])
        vel = jnp.stack([vx, vy, vz], axis=-1)

    v = jnp.where(pinned, 0.0, vel)
    x = jnp.where(pinned, state.x, state.x_star)
    x_star = jnp.where(pinned, state.x, state.x_star)
    return SimState(
        x=x, v=v, x_star=x_star, inv_mass=state.inv_mass,
        edge_lambda=state.edge_lambda, tet_lambda=state.tet_lambda,
    )


def _color_slices(groups):
    """Color-major layout: (order, [(start, end) per color])."""
    import numpy as np

    sizes = groups.mask.sum(axis=1).astype(int)
    starts = np.zeros(len(sizes) + 1, int)
    np.cumsum(sizes, out=starts[1:])
    return groups.order, [(int(starts[i]), int(starts[i + 1]))
                          for i in range(len(sizes))]


def _vertex_slot_map(num_vertices, constraint_rows, arity, k_c):
    """Per-color static map vertex -> row in the color's correction table.

    Row layout: role-major -- constraint j's role r corner writes row
    r*Kc + j; vertices absent from the color point at the zero row
    (arity*Kc).  Valid because constraints within a color are
    vertex-disjoint (core/topology.greedy_color).
    """
    import numpy as np

    vslot = np.full((num_vertices,), arity * k_c, np.int32)
    for j, row in enumerate(constraint_rows):
        for r in range(arity):
            vslot[row[r]] = r * k_c + j
    return vslot


def make_xpbd_step(topology, params: SolverParams,
                   colliders: Optional[Colliders] = None,
                   edge_c=None, tet_c=None):
    """Build ``step(state, dt) -> state`` implementing the full PBDServer
    stepper (Sim.cpp:280-305) with colored sweeps.  The returned function is
    pure and jit-friendly; wrap with jax.jit(donate_argnums=0) at the call
    site (api/engine.py does).

    ``colliders`` (optional, an extension over the server which only has the
    ground plane) are resolved once per iteration after the ground projection,
    in world space with zero particle radius.

    edge_c / tet_c: optional per-constraint compliance arrays (pallas
    backend only -- mixed-material merged scenes).
    """
    edges = jnp.asarray(topology.edges, jnp.int32)
    edge_rest = jnp.asarray(topology.edge_rest, jnp.float32)
    tets = jnp.asarray(topology.tets, jnp.int32)
    tet_rest_vol = jnp.asarray(topology.tet_rest_vol, jnp.float32)

    e_idx = jnp.asarray(topology.edge_colors.idx, jnp.int32)
    e_mask = jnp.asarray(topology.edge_colors.mask)
    t_idx = jnp.asarray(topology.tet_colors.idx, jnp.int32)
    t_mask = jnp.asarray(topology.tet_colors.mask)

    gravity = jnp.asarray(params.gravity, jnp.float32)
    has_edges = topology.num_edges > 0
    has_tets = topology.num_tets > 0

    # color-major gather sweeps beat the padded scatter scans ~8x on
    # v5e; above ~100k constraints the Pallas sweep kernels win another
    # ~10x (kernels/sweep.py) at the cost of block-synchronous (rather
    # than colored-GS) constraint ordering -- an ordering change of the
    # same class as coloring itself, so "auto" takes it for big scenes
    # (only on real TPU: interpret mode at this scale is unusably slow).
    # Thresholds live in solver/select.py::resolve_backend.
    from .select import resolve_backend

    backend = resolve_backend(topology, params)
    if backend == "pallas":
        # VMEM-resident Pallas sweep kernels (kernels/sweep.py); its own
        # module owns layout conversion and the block-synchronous ordering
        from .xpbd_pallas import make_xpbd_pallas_step
        step = make_xpbd_pallas_step(topology, params, colliders,
                                     edge_c=edge_c, tet_c=tet_c)
        step.backend = backend
        return step
    if edge_c is not None or tet_c is not None:
        raise ValueError(
            "per-constraint compliance (edge_c/tet_c) requires "
            "xpbd_backend='pallas' (the colored XLA backends use scalar "
            "compliance)")

    if backend == "gather":
        import numpy as np

        if has_edges:
            e_order, e_slices = _color_slices(topology.edge_colors)
            edges_cm_np = topology.edges[e_order]
            e_i0 = jnp.asarray(edges_cm_np[:, 0], jnp.int32)
            e_i1 = jnp.asarray(edges_cm_np[:, 1], jnp.int32)
            e_rest_cm = jnp.asarray(topology.edge_rest[e_order], jnp.float32)
            e_vslots = [
                jnp.asarray(_vertex_slot_map(
                    topology.num_particles, edges_cm_np[s:e], 2, e - s))
                for (s, e) in e_slices
            ]
            e_perm = jnp.asarray(e_order.astype(np.int64))
            e_inv = jnp.asarray(np.argsort(e_order))
        if has_tets:
            t_order, t_slices = _color_slices(topology.tet_colors)
            tets_cm_np = topology.tets[t_order]
            t_abcd = [jnp.asarray(tets_cm_np[:, r], jnp.int32)
                      for r in range(4)]
            t_rest_cm = jnp.asarray(
                topology.tet_rest_vol[t_order], jnp.float32)
            t_vslots = [
                jnp.asarray(_vertex_slot_map(
                    topology.num_particles, tets_cm_np[s:e], 4, e - s))
                for (s, e) in t_slices
            ]
            t_perm = jnp.asarray(t_order.astype(np.int64))
            t_inv = jnp.asarray(np.argsort(t_order))

    # Spatial-hash self/inter-body collision (solver/spatial.py), same
    # per-iteration slot as the jacobi dialect: edge -> tet -> ground /
    # colliders -> self.  A new capability over the reference server
    # (which only has the ground clamp); min separation = 2 *
    # params.particle_radius, matching the jacobi stage.
    self_collide = (make_self_collision_fn(params, topology.vertices)
                    if params.self_collision else None)
    sc_radius = max(1e-6, params.particle_radius)

    # Vertex-triangle surface collision (solver/surface_collide.py), same
    # integration as the jacobi dialect: skipped when the topology carries
    # no surface triangles, cell size autosized off the rest mesh.
    surf_collide = None
    if params.surface_collision and len(topology.surface_tris):
        from .surface_collide import (make_surface_collision_fn,
                                      suggested_cell_size)

        sparams = params
        if params.surface_collision_cell <= 0.0:
            sparams = params.replace(surface_collision_cell=(
                suggested_cell_size(topology.vertices, topology.surface_tris,
                                    params.surface_thickness)))
        surf_collide = make_surface_collision_fn(
            sparams, topology.surface_tris)

    # Note: a hybrid "scatter-add for small tail colors" variant was
    # measured SLOWER on v5e (13.7 vs 11.5 ms/step at V=4096) -- XLA's
    # scatter penalty exceeds a full (V,3) table row gather even for tiny
    # colors, so every color uses the gather path.
    def edge_pass_gather(x_star, lam_cm, inv_mass, alpha):
        """All edge colors, color-major: contiguous lambda slices + one
        (V,3) correction-table row gather per color (no scatters; colors
        are vertex-disjoint so the table row per vertex is unique)."""
        for (s, e), vslot in zip(e_slices, e_vslots):
            kc = e - s
            i0 = jax.lax.slice_in_dim(e_i0, s, e)
            i1 = jax.lax.slice_in_dim(e_i1, s, e)
            w0 = inv_mass[i0]
            w1 = inv_mass[i1]
            w_sum = w0 + w1
            d = x_star[i0] - x_star[i1]
            length = jnp.sqrt(jnp.sum(d * d, axis=-1))
            valid = (w_sum != 0.0) & (length >= 1e-12)
            c = length - jax.lax.slice_in_dim(e_rest_cm, s, e)
            lam = jax.lax.slice_in_dim(lam_cm, s, e)
            denom = w_sum + alpha
            dlam = jnp.where(
                valid,
                (-c - alpha * lam) / jnp.where(denom == 0.0, 1.0, denom),
                0.0)
            n = d * (1.0 / jnp.where(length < 1e-12, 1.0, length))[:, None]
            corr = n * dlam[:, None]
            rows = jnp.concatenate(
                [corr * w0[:, None], -corr * w1[:, None],
                 jnp.zeros((1, 3), x_star.dtype)], axis=0)  # (2Kc+1, 3)
            x_star = x_star + rows[vslot]
            lam_cm = jax.lax.dynamic_update_slice_in_dim(
                lam_cm, lam + dlam, s, 0)
            del kc
        return x_star, lam_cm

    def tet_pass_gather(x_star, lam_cm, inv_mass, alpha):
        for (s, e), vslot in zip(t_slices, t_vslots):
            kc = e - s
            a = jax.lax.slice_in_dim(t_abcd[0], s, e)
            b = jax.lax.slice_in_dim(t_abcd[1], s, e)
            c_ = jax.lax.slice_in_dim(t_abcd[2], s, e)
            d_ = jax.lax.slice_in_dim(t_abcd[3], s, e)
            wa, wb, wc, wd = (inv_mass[a], inv_mass[b], inv_mass[c_],
                              inv_mass[d_])
            pa, pb, pc, pd = x_star[a], x_star[b], x_star[c_], x_star[d_]
            ga = jnp.cross(pd - pb, pc - pb) * (1.0 / 6.0)
            gb = jnp.cross(pc - pa, pd - pa) * (1.0 / 6.0)
            gc = jnp.cross(pd - pa, pb - pa) * (1.0 / 6.0)
            gd = jnp.cross(pb - pa, pc - pa) * (1.0 / 6.0)
            w_sum = (wa * jnp.sum(ga * ga, -1) + wb * jnp.sum(gb * gb, -1)
                     + wc * jnp.sum(gc * gc, -1)
                     + wd * jnp.sum(gd * gd, -1))
            valid = ((wa + wb + wc + wd) != 0.0) & (w_sum >= 1e-20)
            vol = tet_signed_volume(pa, pb, pc, pd)
            cfn = vol - jax.lax.slice_in_dim(t_rest_cm, s, e)
            lam = jax.lax.slice_in_dim(lam_cm, s, e)
            denom = w_sum + alpha
            dlam = jnp.where(
                valid,
                (-cfn - alpha * lam) / jnp.where(denom == 0.0, 1.0, denom),
                0.0)
            rows = jnp.concatenate(
                [ga * (wa * dlam)[:, None], gb * (wb * dlam)[:, None],
                 gc * (wc * dlam)[:, None], gd * (wd * dlam)[:, None],
                 jnp.zeros((1, 3), x_star.dtype)], axis=0)  # (4Kc+1, 3)
            x_star = x_star + rows[vslot]
            lam_cm = jax.lax.dynamic_update_slice_in_dim(
                lam_cm, lam + dlam, s, 0)
            del kc
        return x_star, lam_cm

    def iteration(carry, _, inv_mass, cols_rt):
        # inv_mass closed over (not carried): constant within a step, so
        # XLA hoists the loop-invariant w gathers out of the iteration scan
        x_star, e_lam, t_lam, edge_alpha, tet_alpha = carry
        # (edge_alpha / tet_alpha are traced scalars: compliance may be a
        # per-scene override for randomized-stiffness batched datagen)

        if has_edges:
            if backend == "gather":
                x_star, e_lam = edge_pass_gather(
                    x_star, e_lam, inv_mass, edge_alpha)
            else:
                def e_body(c, grp):
                    xs, lam = c
                    xs, lam = edge_color_sweep(
                        xs, lam, inv_mass, edges, edge_rest, grp[0], grp[1],
                        edge_alpha)
                    return (xs, lam), None

                (x_star, e_lam), _ = jax.lax.scan(
                    e_body, (x_star, e_lam), (e_idx, e_mask))

        if has_tets:
            if backend == "gather":
                x_star, t_lam = tet_pass_gather(
                    x_star, t_lam, inv_mass, tet_alpha)
            else:
                def t_body(c, grp):
                    xs, lam = c
                    xs, lam = tet_color_sweep(
                        xs, lam, inv_mass, tets, tet_rest_vol, grp[0],
                        grp[1], tet_alpha)
                    return (xs, lam), None

                (x_star, t_lam), _ = jax.lax.scan(
                    t_body, (x_star, t_lam), (t_idx, t_mask))

        if params.ground_enabled:
            x_star = project_ground(x_star, inv_mass, params.ground_y)

        if colliders is not None:
            free = inv_mass > 0.0
            pushed = collide_particles(
                x_star, 0.0, cols_rt if cols_rt is not None else colliders)
            x_star = jnp.where(free[:, None], pushed, x_star)

        if self_collide is not None:
            x_star = self_collide(x_star, inv_mass, sc_radius)
        if surf_collide is not None:
            x_star = surf_collide(x_star, inv_mass)

        return (x_star, e_lam, t_lam, edge_alpha, tet_alpha), None

    def substep(state: SimState, sdt, edge_comp, vol_comp,
                cols_rt, fric, grav) -> SimState:
        inv_dt2 = jnp.where(sdt > 1e-12, 1.0 / (sdt * sdt), 0.0)
        edge_alpha = jnp.maximum(edge_comp, 0.0) * inv_dt2
        tet_alpha = jnp.maximum(vol_comp, 0.0) * inv_dt2

        state = predict(state, grav, sdt)

        carry = (state.x_star, state.edge_lambda, state.tet_lambda,
                 edge_alpha, tet_alpha)
        carry, _ = jax.lax.scan(
            lambda c, x: iteration(c, x, state.inv_mass, cols_rt), carry,
            None, length=params.iterations)
        x_star, e_lam, t_lam = carry[0], carry[1], carry[2]

        state = SimState(
            x=state.x, v=state.v, x_star=x_star, inv_mass=state.inv_mass,
            edge_lambda=e_lam, tet_lambda=t_lam,
        )
        return commit(state, params, sdt, friction=fric)

    def step(state: SimState, dt, edge_compliance=None,
             volume_compliance=None, friction=None, gravity_override=None,
             colliders_rt: Optional[Colliders] = None) -> SimState:
        """edge_compliance / volume_compliance / friction /
        gravity_override: optional traced overrides of the corresponding
        SolverParams fields (per-scene under vmap for randomized datagen,
        BASELINE config #5; fittable via softbodysim_tpu.diff);
        colliders_rt: per-step collider poses (same count as the make-time
        template -- moving colliders without recompilation, mirroring the
        reference's per-step snapshot)."""
        if colliders_rt is not None and colliders is None:
            raise ValueError(
                "runtime colliders require a make-time collider template")
        ec = _f32(params.edge_compliance if edge_compliance is None
                  else edge_compliance)
        vc = _f32(params.volume_compliance if volume_compliance is None
                  else volume_compliance)
        fric = None if friction is None else _f32(friction)
        grav = (gravity if gravity_override is None
                else jnp.asarray(gravity_override, jnp.float32))
        ss = max(1, params.substeps)
        sdt = _f32(dt) / ss

        def relam(st, e_lam, t_lam):
            return SimState(x=st.x, v=st.v, x_star=st.x_star,
                            inv_mass=st.inv_mass, edge_lambda=e_lam,
                            tet_lambda=t_lam)

        # gather backend keeps lambdas color-major internally; permute at
        # the step boundary so the public SimState stays in original
        # constraint order (checkpoints / oracle comparisons untouched)
        if backend == "gather":
            state = relam(
                state,
                state.edge_lambda[e_perm] if has_edges else state.edge_lambda,
                state.tet_lambda[t_perm] if has_tets else state.tet_lambda)

        inv_mass0 = state.inv_mass

        def body(c, _):
            st = SimState(x=c[0], v=c[1], x_star=c[2], inv_mass=inv_mass0,
                          edge_lambda=c[3], tet_lambda=c[4])
            st = substep(st, sdt, ec, vc, colliders_rt, fric, grav)
            return (st.x, st.v, st.x_star, st.edge_lambda,
                    st.tet_lambda), None

        carry = (state.x, state.v, state.x_star, state.edge_lambda,
                 state.tet_lambda)
        carry, _ = jax.lax.scan(body, carry, None, length=ss)
        state = SimState(x=carry[0], v=carry[1], x_star=carry[2],
                         inv_mass=inv_mass0, edge_lambda=carry[3],
                         tet_lambda=carry[4])

        if backend == "gather":
            state = relam(
                state,
                state.edge_lambda[e_inv] if has_edges else state.edge_lambda,
                state.tet_lambda[t_inv] if has_tets else state.tet_lambda)
        return state

    step.backend = backend
    return step
