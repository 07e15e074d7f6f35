"""Jacobi + SOR solver -- the Unity in-engine physics contract, TPU-native.

Reference semantics (Assets/Scripts/Softbody/SoftBodySolver.cs, and its exact
GPU twins in Assets/Shaders/SoftBodyCompute.compute:206-457):
  PreSolveOne                SoftBodySolver.cs:349-362  (pinned: vel zeroed)
  GatherEdgesForParticle     SoftBodySolver.cs:395-433  (lambda = -k * C / (wi+wj),
                                                         contribution n*(lambda*wi))
  GatherVolumesForParticle   SoftBodySolver.cs:451-519  (lambda = -k * C / wsum,
                                                         role-gradient * lambda * wi)
  ApplyDelta                 SoftBodySolver.cs:521-527  (x += (omega/cnt) * delta)
  SolveCollisionsForParticle SoftBodySolver.cs:541-564  (world-space ground plane
                                                         + sequential colliders)
  PostSolveOne               SoftBodySolver.cs:364-377

TPU redesign: the reference's per-particle CSR gather loops are re-expressed
as per-constraint math + ``segment_sum`` scatter over endpoints -- numerically
identical (each particle's delta is the sum of its incident constraints'
contributions; summation order differs only within fp32 associativity) and
E/T-proportional instead of sum-of-degrees, with no padded CSR rows.  This is
the fully data-parallel "one color Jacobi" formulation BASELINE.json asks for;
it is also the shape that vmaps cleanly over thousands of scenes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import SimState, SolverParams, tet_signed_volume
from ..collide.primitives import (
    Colliders, collide_particles, project_ground_plane)
from .spatial import make_self_collision_fn


def edge_jacobi_deltas(x_pred, inv_mass, edges, edge_rest, stiffness, nv):
    """Per-particle (delta, count) from all distance constraints.

    Per edge e=(a,b): w = wa + wb; skip w==0 or len^2 < 1e-18;
    lambda = -k * (len - rest) / w; contribution to a is n*(lambda*wa), to b
    -n*(lambda*wb); each valid incident edge bumps the endpoint's count.
    (SoftBodySolver.cs:408-429)
    """
    a = edges[:, 0]
    b = edges[:, 1]
    wa = inv_mass[a]
    wb = inv_mass[b]
    w = wa + wb

    d = x_pred[a] - x_pred[b]
    len2 = jnp.sum(d * d, axis=-1)
    valid = (w != 0.0) & (len2 >= 1e-18)

    length = jnp.sqrt(jnp.maximum(len2, 1e-30))
    c = length - edge_rest
    n = d / length[:, None]
    lam = jnp.where(valid, -stiffness * (c / jnp.where(w == 0.0, 1.0, w)), 0.0)

    contrib_a = n * (lam * wa)[:, None]
    contrib_b = -n * (lam * wb)[:, None]

    delta = jax.ops.segment_sum(contrib_a, a, num_segments=nv)
    delta = delta + jax.ops.segment_sum(contrib_b, b, num_segments=nv)
    cnt = jax.ops.segment_sum(valid.astype(jnp.int32), a, num_segments=nv)
    cnt = cnt + jax.ops.segment_sum(valid.astype(jnp.int32), b, num_segments=nv)
    return delta, cnt


def tet_jacobi_deltas(x_pred, inv_mass, tets, tet_rest_vol, stiffness, nv):
    """Per-particle (delta, count) from all volume constraints
    (SoftBodySolver.cs:461-515: per-role gradient * (lambda * w_role), count
    bumps only for corners with w_role != 0)."""
    a, b, c_, d_ = tets[:, 0], tets[:, 1], tets[:, 2], tets[:, 3]
    wa, wb, wc, wd = inv_mass[a], inv_mass[b], inv_mass[c_], inv_mass[d_]

    pa, pb, pc, pd = x_pred[a], x_pred[b], x_pred[c_], x_pred[d_]

    ga = jnp.cross(pd - pb, pc - pb) / 6.0
    gb = jnp.cross(pc - pa, pd - pa) / 6.0
    gc = jnp.cross(pd - pa, pb - pa) / 6.0
    gd = jnp.cross(pb - pa, pc - pa) / 6.0

    wsum = (
        wa * jnp.sum(ga * ga, -1)
        + wb * jnp.sum(gb * gb, -1)
        + wc * jnp.sum(gc * gc, -1)
        + wd * jnp.sum(gd * gd, -1)
    )
    valid = ((wa + wb + wc + wd) != 0.0) & (wsum >= 1e-20)

    vol = tet_signed_volume(pa, pb, pc, pd)
    cfn = vol - tet_rest_vol
    lam = jnp.where(
        valid, -stiffness * (cfn / jnp.where(wsum == 0.0, 1.0, wsum)), 0.0)

    delta = jax.ops.segment_sum(ga * (lam * wa)[:, None], a, num_segments=nv)
    delta += jax.ops.segment_sum(gb * (lam * wb)[:, None], b, num_segments=nv)
    delta += jax.ops.segment_sum(gc * (lam * wc)[:, None], c_, num_segments=nv)
    delta += jax.ops.segment_sum(gd * (lam * wd)[:, None], d_, num_segments=nv)

    def corner_cnt(idx, wcorner):
        hit = (valid & (wcorner != 0.0)).astype(jnp.int32)
        return jax.ops.segment_sum(hit, idx, num_segments=nv)

    cnt = (corner_cnt(a, wa) + corner_cnt(b, wb)
           + corner_cnt(c_, wc) + corner_cnt(d_, wd))
    return delta, cnt


def edge_gather_deltas(x_pred, inv_mass, other, rest_p, mask, stiffness,
                       vids=None):
    """Padded-gather form of edge_jacobi_deltas -- the K_EdgeGather walk
    (SoftBodyCompute.compute:243-274): per particle, reduce over its padded
    neighbor row.  No scatters; on TPU this is the fast path for large V
    (XLA's scatter lowering degrades past the one-hot-matmul regime).

    vids: optional (N,) vertex ids when the rows cover a degree bucket
    instead of all vertices (core/adjacency.bucketize_padded).
    """
    xi = x_pred if vids is None else x_pred[vids]
    wi_v = inv_mass if vids is None else inv_mass[vids]
    xj = x_pred[other]                       # (N, D, 3)
    wi = wi_v[:, None]
    wj = inv_mass[other]
    w = wi + wj
    d = xi[:, None, :] - xj
    len2 = jnp.sum(d * d, axis=-1)
    valid = mask & (w != 0.0) & (len2 >= 1e-18)
    ln = jnp.sqrt(jnp.maximum(len2, 1e-30))
    c = ln - rest_p
    n = d / ln[..., None]
    lam = jnp.where(valid, -stiffness * (c / jnp.where(w == 0.0, 1.0, w)),
                    0.0)
    delta = jnp.sum(n * (lam * wi)[..., None], axis=1)
    cnt = jnp.sum(valid, axis=1, dtype=jnp.int32)
    return delta, cnt


def tet_phase_a(x_pred, inv_mass, tets, tet_rest_vol, stiffness):
    """Per-tet XPBD-style gradients + Jacobi lambda, packed role-major:
    returns (glam (4T, 3) with glam[r*T+t] = g_r(t)*lambda(t), valid (T,))."""
    a, b, c_, d_ = tets[:, 0], tets[:, 1], tets[:, 2], tets[:, 3]
    pa, pb, pc, pd = x_pred[a], x_pred[b], x_pred[c_], x_pred[d_]
    wa, wb, wc, wd = inv_mass[a], inv_mass[b], inv_mass[c_], inv_mass[d_]

    ga = jnp.cross(pd - pb, pc - pb) / 6.0
    gb = jnp.cross(pc - pa, pd - pa) / 6.0
    gc = jnp.cross(pd - pa, pb - pa) / 6.0
    gd = jnp.cross(pb - pa, pc - pa) / 6.0
    wsum = (wa * jnp.sum(ga * ga, -1) + wb * jnp.sum(gb * gb, -1)
            + wc * jnp.sum(gc * gc, -1) + wd * jnp.sum(gd * gd, -1))
    valid = ((wa + wb + wc + wd) != 0.0) & (wsum >= 1e-20)
    vol = tet_signed_volume(pa, pb, pc, pd)
    c = vol - tet_rest_vol
    lam = jnp.where(
        valid, -stiffness * (c / jnp.where(wsum == 0.0, 1.0, wsum)), 0.0)

    glam = jnp.concatenate(
        [ga * lam[:, None], gb * lam[:, None],
         gc * lam[:, None], gd * lam[:, None]], axis=0)    # (4T, 3)
    return glam, valid


def tet_phase_b(glam, valid, inv_mass, slot, tidx, mask, vids=None):
    """Per-particle padded ROW gather of the phase-A table (1.4x the
    segment_sum path on v5e; numerically identical up to fp association).
    vids: optional degree-bucket vertex ids."""
    wi_v = inv_mass if vids is None else inv_mass[vids]
    rows = glam[slot]                                      # (N, D, 3)
    m = jnp.where(mask, 1.0, 0.0)[..., None]
    delta = jnp.sum(rows * m, axis=1) * wi_v[:, None]
    cnt = jnp.sum(valid[tidx] & mask & (wi_v[:, None] != 0.0), axis=1,
                  dtype=jnp.int32)
    return delta, cnt


def tet_gather_deltas(x_pred, inv_mass, tets, tet_rest_vol, slot, tidx, mask,
                      stiffness):
    """Two-phase gather form of tet_jacobi_deltas (K_VolumeGather semantics,
    SoftBodyCompute.compute:294-370) without scatters: see tet_phase_a/b."""
    glam, valid = tet_phase_a(x_pred, inv_mass, tets, tet_rest_vol,
                              stiffness)
    return tet_phase_b(glam, valid, inv_mass, slot, tidx, mask)


def apply_delta(x_pred, inv_mass, delta, cnt, omega):
    """x += (omega / cnt) * delta for free particles with cnt > 0
    (SoftBodySolver.cs:521-527)."""
    ok = (cnt > 0) & (inv_mass != 0.0)
    scale = omega / jnp.maximum(cnt.astype(jnp.float32), 1.0)
    return jnp.where(ok[:, None], x_pred + scale[:, None] * delta, x_pred)


def make_jacobi_step(topology, params: SolverParams,
                     colliders: Optional[Colliders] = None,
                     local_to_world=None, world_to_local=None,
                     edge_k=None, tet_k=None):
    """Build ``step(state, dt) -> state`` implementing the full in-engine
    substep orchestration (SoftBodyManager.StepSimulation,
    SoftBodyManager.cs:199-237: per substep Pre -> iters x {edges, volumes,
    collide} -> Post).

    local_to_world / world_to_local: optional (4, 4) matrices for bodies
    simulated in local space (SoftBodySolver.cs:224-226); None == identity
    == world-space simulation (collisions then skip the matrix transform).

    edge_k / tet_k: optional per-constraint stiffness arrays (E,)/(T,) --
    mixed-material merged scenes, the reference's per-SoftBodySolver
    stiffness.  Step-time edge_stiffness / volume_stiffness overrides then
    MULTIPLY the arrays (default 1.0).
    """
    edges = jnp.asarray(topology.edges, jnp.int32)
    edge_rest = jnp.asarray(topology.edge_rest, jnp.float32)
    tets = jnp.asarray(topology.tets, jnp.int32)
    tet_rest_vol = jnp.asarray(topology.tet_rest_vol, jnp.float32)
    nv = topology.num_particles
    has_edges = topology.num_edges > 0
    has_tets = topology.num_tets > 0

    # Backend: 'segment' lowers segment_sum to a one-hot matmul (MXU) for
    # small V; past that regime XLA's scatter path serializes, so large
    # scenes use the padded-gather walk (the reference's own GPU-kernel
    # formulation).  Above ~100k constraints the Pallas pass kernels
    # (kernels/jacobi.py) win ~10x on the plain world-space path.
    # Thresholds measured on TPU v5e.
    # measured on v5e (fused 20-step programs): gather beats segment at
    # every scale tried -- 1.27x at V=1331, 1.26x at V=4096, 1.12x at
    # V=15625, 1.69x on a 32-scene vmapped batch.  Pallas only on real
    # TPU: interpret mode at 100k+ constraints is unusably slow.
    # Thresholds live in solver/select.py::resolve_backend.
    from .select import resolve_backend

    pallas_ok = local_to_world is None
    backend = resolve_backend(topology, params,
                              local_to_world=local_to_world)
    if backend == "pallas":
        if not pallas_ok:
            raise ValueError(
                "jacobi_backend='pallas' does not support local-space "
                "transforms -- use 'gather' (or 'auto', which falls back)")
        from .jacobi_pallas import make_jacobi_pallas_step
        step = make_jacobi_pallas_step(topology, params, colliders,
                                       edge_k=edge_k, tet_k=tet_k)
        step.backend = backend
        return step
    if backend == "gather":
        from ..core.adjacency import (
            bucketize_padded, padded_edge_adjacency, padded_tet_adjacency)

        # Degree-bucketed padded adjacency: vertices grouped by degree so
        # each bucket pads to its own cap -- irregular meshes would
        # otherwise gather up to 8x padding waste (PLAN.md measurements).
        if has_edges:
            e_other, e_eidx, e_mask = padded_edge_adjacency(
                nv, topology.edges)
            ebuckets, e_pos = bucketize_padded(
                [e_other, e_eidx], e_mask, e_mask.sum(1))
            ek_np = (None if edge_k is None
                     else np.asarray(edge_k, np.float32))
            e_bucket_data = [
                (jnp.asarray(vids), jnp.asarray(arrs[0]),
                 jnp.asarray(topology.edge_rest[arrs[1]], jnp.float32),
                 jnp.asarray(m),
                 None if ek_np is None else jnp.asarray(ek_np[arrs[1]]))
                for vids, arrs, m in ebuckets
            ]
            e_pos_j = jnp.asarray(e_pos)
        if has_tets:
            t_tidx, t_role, t_mask = padded_tet_adjacency(nv, topology.tets)
            t_slot = t_role.astype(np.int64) * topology.num_tets + t_tidx
            tbuckets, t_pos = bucketize_padded(
                [t_slot, t_tidx], t_mask, t_mask.sum(1))
            t_bucket_data = [
                (jnp.asarray(vids), jnp.asarray(arrs[0]),
                 jnp.asarray(arrs[1]), jnp.asarray(m))
                for vids, arrs, m in tbuckets
            ]
            t_pos_j = jnp.asarray(t_pos)

    gravity_w = jnp.asarray(params.gravity, jnp.float32)
    ground_point = jnp.asarray(params.ground_point, jnp.float32)
    gn = np.asarray(params.ground_normal, np.float32)
    n2 = float(np.dot(gn, gn))
    ground_normal = jnp.asarray(
        gn / np.float32(np.sqrt(n2)) if n2 >= 1e-12
        else np.array([0.0, 1.0, 0.0], np.float32))

    l2w = None if local_to_world is None else jnp.asarray(
        local_to_world, jnp.float32)
    w2l = None if world_to_local is None else jnp.asarray(
        world_to_local, jnp.float32)

    radius = max(1e-6, params.particle_radius)
    k_colliders = 0 if colliders is None else colliders.count
    do_collide = params.ground_enabled or k_colliders > 0
    self_collide = (make_self_collision_fn(params, topology.vertices)
                    if params.self_collision else None)
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

    # Pallas fused collide: one VMEM-resident pass over ground + all
    # colliders (kernels/collide.py).  Only on the plain world-space path
    # (no body transform, no self-collision interleaving).
    fused_collide = None
    if (do_collide and local_to_world is None and self_collide is None
            and surf_collide is None):
        use = params.use_pallas
        if use == "auto":
            import jax as _jax

            use = "on" if _jax.default_backend() != "cpu" else "off"
        if use == "on":
            from ..kernels.collide import make_fused_collide

            fused_collide = make_fused_collide(
                colliders, ground_enabled=params.ground_enabled,
                ground_point=params.ground_point,
                ground_normal=params.ground_normal,
                radius=radius, num_particles=nv)

    def solve_collisions(x_pred, inv_mass, cols_rt, l2w_rt, w2l_rt):
        if fused_collide is not None:
            return fused_collide(x_pred, inv_mass, cols_rt)
        pw = (x_pred if l2w_rt is None
              else x_pred @ l2w_rt[:3, :3].T + l2w_rt[:3, 3])
        if params.ground_enabled:
            pw = project_ground_plane(pw, radius, ground_point, ground_normal)
        if k_colliders > 0:
            pw = collide_particles(
                pw, radius, cols_rt if cols_rt is not None else colliders)
        if self_collide is not None:
            pw = self_collide(pw, inv_mass, radius)
        if surf_collide is not None:
            pw = surf_collide(pw, inv_mass)
        pl = pw if w2l_rt is None else pw @ w2l_rt[:3, :3].T + w2l_rt[:3, 3]
        return jnp.where((inv_mass != 0.0)[:, None], pl, x_pred)

    def iteration(carry, _, inv_mass, cols_rt, l2w_rt, w2l_rt):
        # inv_mass rides the closure (NOT the scan carry): it is constant
        # within a step, and keeping it out of the carry lets XLA hoist the
        # loop-invariant w[...] gathers out of the iteration loop.
        # k_edge / k_vol / omega are traced scalars so they can be per-scene
        # overrides under vmap (randomized-stiffness datagen, BASELINE #5)
        x_pred, k_edge, k_vol, omega = carry
        # per-constraint stiffness arrays (edge_k/tet_k): the traced
        # scalars act as multipliers (default 1.0)
        tk_eff = k_vol if tet_k is None else jnp.asarray(
            tet_k, jnp.float32) * k_vol
        if has_edges:
            if backend == "gather":
                parts = [
                    edge_gather_deltas(
                        x_pred, inv_mass, ob, rb, mb,
                        k_edge if kb is None else kb * k_edge, vids=vb)
                    for vb, ob, rb, mb, kb in e_bucket_data
                ]
                delta = jnp.concatenate([p[0] for p in parts])[e_pos_j]
                cnt = jnp.concatenate([p[1] for p in parts])[e_pos_j]
            else:
                ek_eff = k_edge if edge_k is None else jnp.asarray(
                    edge_k, jnp.float32) * k_edge
                delta, cnt = edge_jacobi_deltas(
                    x_pred, inv_mass, edges, edge_rest, ek_eff, nv)
            x_pred = apply_delta(x_pred, inv_mass, delta, cnt, omega)
        if has_tets:
            if backend == "gather":
                glam, validt = tet_phase_a(
                    x_pred, inv_mass, tets, tet_rest_vol, tk_eff)
                parts = [
                    tet_phase_b(glam, validt, inv_mass, sb, tb, mb, vids=vb)
                    for vb, sb, tb, mb in t_bucket_data
                ]
                delta = jnp.concatenate([p[0] for p in parts])[t_pos_j]
                cnt = jnp.concatenate([p[1] for p in parts])[t_pos_j]
            else:
                delta, cnt = tet_jacobi_deltas(
                    x_pred, inv_mass, tets, tet_rest_vol, tk_eff, nv)
            x_pred = apply_delta(x_pred, inv_mass, delta, cnt, omega)
        if (do_collide or self_collide is not None
                or surf_collide is not None):
            x_pred = solve_collisions(x_pred, inv_mass, cols_rt, l2w_rt,
                                      w2l_rt)
        return (x_pred, k_edge, k_vol, omega), None

    def substep(state: SimState, sdt, k_edge, k_vol, omega, cols_rt,
                l2w_rt, w2l_rt, grav_l) -> SimState:
        # PreSolve (SoftBodySolver.cs:349-362); state.x doubles as posPrev
        pinned = (state.inv_mass == 0.0)[:, None]
        v = jnp.where(pinned, 0.0, state.v + grav_l * sdt)
        x_pred = jnp.where(pinned, state.x, state.x + v * sdt)

        if not params.chebyshev:
            (x_pred, _, _, _), _ = jax.lax.scan(
                lambda c, x: iteration(c, x, state.inv_mass, cols_rt,
                                       l2w_rt, w2l_rt),
                (x_pred, k_edge, k_vol, omega), None,
                length=params.iterations)
        else:
            # Chebyshev semi-iterative acceleration (Wang 2015): after the
            # Jacobi update, extrapolate with the omega_k recurrence
            #   omega_1 = 1; omega_2 = 2/(2-rho^2);
            #   omega_{k+1} = 4/(4 - rho^2 * omega_k)
            #   x_k+1 = omega (x_jacobi - x_prev) + x_prev
            # starting after `chebyshev_delay` plain iterations.  Pinned
            # particles are untouched (their jacobi update is identity).
            rho2 = float(params.chebyshev_rho) ** 2

            def cheby_body(carry, it_idx):
                x_cur, x_prev, om_prev = carry
                (x_jac, _, _, _), _ = iteration(
                    (x_cur, k_edge, k_vol, omega), None, state.inv_mass,
                    cols_rt, l2w_rt, w2l_rt)
                om_next = jnp.where(
                    it_idx < params.chebyshev_delay, 1.0,
                    jnp.where(it_idx == params.chebyshev_delay,
                              2.0 / (2.0 - rho2),
                              4.0 / (4.0 - rho2 * om_prev)))
                x_next = om_next * (x_jac - x_prev) + x_prev
                return (x_next, x_cur, om_next), None

            (x_pred, _, _), _ = jax.lax.scan(
                cheby_body, (x_pred, x_pred, jnp.float32(1.0)),
                jnp.arange(params.iterations))

        # PostSolve (SoftBodySolver.cs:364-377)
        inv_dt = jnp.where(sdt > 0.0, 1.0 / sdt, 0.0)
        v = jnp.where(pinned, 0.0, (x_pred - state.x) * inv_dt)
        x = jnp.where(pinned, state.x, x_pred)
        return SimState(
            x=x, v=v, x_star=x, inv_mass=state.inv_mass,
            edge_lambda=state.edge_lambda, tet_lambda=state.tet_lambda,
        )

    def step(state: SimState, dt, edge_stiffness=None, volume_stiffness=None,
             sor_omega=None, colliders_rt: Optional[Colliders] = None,
             local_to_world_rt=None, world_to_local_rt=None) -> SimState:
        """Optional traced overrides:
          - edge/volume stiffness, sor_omega: the three per-solver tunables
            (SoftBodySolver.cs:28-32), per-scene under vmap;
          - colliders_rt: collider poses for THIS step (same count as the
            make-time template) -- the reference rebuilds its collider
            snapshot every step (SoftBodyManager.cs:239-261), so moving
            colliders must not trigger recompilation;
          - local_to_world_rt / world_to_local_rt: per-step body transform
            matrices (CacheStepDataMainThread caches these per frame,
            SoftBodySolver.cs:224-226). Only honored when make-time
            transforms were provided (the graph is built with the
            transform path).
        """
        # with per-constraint edge_k/tet_k the scalars are multipliers
        k_edge = jnp.asarray(
            (1.0 if edge_k is not None else params.edge_stiffness)
            if edge_stiffness is None else edge_stiffness, jnp.float32)
        k_vol = jnp.asarray(
            (1.0 if tet_k is not None else params.volume_stiffness)
            if volume_stiffness is None else volume_stiffness, jnp.float32)
        omega = jnp.asarray(
            params.sor_omega if sor_omega is None else sor_omega,
            jnp.float32)

        l2w_rt = l2w if local_to_world_rt is None else jnp.asarray(
            local_to_world_rt, jnp.float32)
        w2l_rt = w2l if world_to_local_rt is None else jnp.asarray(
            world_to_local_rt, jnp.float32)
        if (l2w_rt is None) != (l2w is None):
            raise ValueError(
                "runtime transforms require make-time transforms (the "
                "compiled graph must include the transform path)")
        grav_l = (gravity_w if w2l_rt is None
                  else w2l_rt[:3, :3] @ gravity_w)
        if colliders_rt is not None and k_colliders == 0:
            raise ValueError(
                "runtime colliders require a make-time collider template")

        ss = max(1, params.substeps)
        sdt = jnp.asarray(dt, jnp.float32) / ss

        # inv_mass is closed over (not carried) so XLA hoists the
        # loop-invariant w[...] gathers out of both scan levels
        inv_mass0 = state.inv_mass

        def body(c, _):
            st = SimState(x=c[0], v=c[1], x_star=c[2], inv_mass=inv_mass0,
                          edge_lambda=c[3], tet_lambda=c[4])
            st = substep(st, sdt, k_edge, k_vol, omega, colliders_rt,
                         l2w_rt, w2l_rt, grav_l)
            return (st.x, st.v, st.x_star, st.edge_lambda,
                    st.tet_lambda), None

        carry = (state.x, state.v, state.x_star, state.edge_lambda,
                 state.tet_lambda)
        carry, _ = jax.lax.scan(body, carry, None, length=ss)
        return SimState(x=carry[0], v=carry[1], x_star=carry[2],
                        inv_mass=inv_mass0, edge_lambda=carry[3],
                        tet_lambda=carry[4])

    step.backend = backend
    return step
