"""Multi-chip Jacobi passes: shard_map + homed accumulator halos.

The jacobi-dialect counterpart of solver/xpbd_pallas_sharded.py, sharding
the in-engine (Unity) physics contract's Pallas pass kernels
(kernels/jacobi.py) over a ``jax.sharding.Mesh`` axis -- the scale-out
story for merged-scene execution (Scene.build_merged / BatchTest-class
workloads) beyond one chip's VMEM.

Window partitioning and ghost maps are shared with the XPBD path
(xpbd_pallas_sharded.build_sharded_family).  The pass-level flow differs
because Jacobi is a snapshot gather + count-averaged apply
(SoftBodySolver.cs:395-527):

  1. all_gather exported boundary windows; each device builds its
     extended table (own windows + ghost copies) from the FROZEN
     iteration-start snapshot.
  2. Run the pass kernel with ``apply=False``: it returns the raw
     (delta xyz, cnt) accumulator over own + ghost windows -- the
     epilogue is withheld.
  3. all_gather the ghost accumulator strips (4 rows: delta + cnt) home
     to their owners, which SUM them into their own windows.  Each
     constraint is owned by exactly one device, so every contribution
     lands exactly once.
  4. Apply x += (omega / cnt) * delta on the local shard (plain XLA
     elementwise -- the exact _apply_epilogue math).

Because pure Jacobi reads one snapshot, this sharding is NOT a dialect
change: the result matches the single-device pass exactly up to fp32
summation order (unlike the XPBD sharding, which is Jacobi-across-devices
by necessity).  tests/test_jacobi_sharded.py asserts parity with the
single-device jacobi Pallas backend at 1e-5 on CPU meshes.

Supported feature set mirrors the XPBD sharded path: gravity, ground
plane (the jacobi dialect's arbitrary point+normal plane with particle
radius), stiffness/omega from params, self/surface collision (own-slice
hash stages over the all-gathered table, solver/global_stages.py),
build-time primitive colliders (replicated local resolve).  Runtime
collider poses and per-constraint stiffness tables stay single-chip for
now.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.state import SimState, SolverParams
from ..kernels import sweep as sw
from .accel import chebyshev_scan
from .xpbd_pallas_sharded import _Family, build_sharded_family

LANES = 128


def make_jacobi_pallas_sharded_step(topology, params: SolverParams,
                                    mesh: Mesh, axis: str = "model",
                                    *, interpret: Optional[bool] = None,
                                    vertex_order: str = "auto",
                                    layer_cap: Optional[int] = None,
                                    colliders=None):
    """Build ``step(state, dt) -> state`` running the jacobi Pallas passes
    sharded over ``mesh`` axis ``axis`` (see module docstring).

    The public SimState keeps original vertex order; layout permutation
    and window partitioning are internal.  ``step.shard_info`` exposes the
    per-device plans + halo maps.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if params.dialect != "jacobi":
        raise ValueError("sharded jacobi path implements the jacobi dialect")

    D = mesh.shape[axis]
    V = topology.num_particles
    has_edges = topology.num_edges > 0
    has_tets = topology.num_tets > 0

    # ---- layout: same ordering machinery as the single-chip path --------
    aligned = None
    if vertex_order in ("auto", "aligned") and has_edges:
        aligned = sw.aligned_order(V, topology.edges)
    if aligned is not None:
        perm_layout, old2new = aligned
    else:
        perm = sw.order_vertices(
            topology.vertices,
            topology.edges if has_edges else None,
            topology.tets if has_tets else None,
            mode="auto" if vertex_order in ("auto", "aligned")
            else vertex_order)
        vpad = -(-V // LANES) * LANES
        perm_layout = np.concatenate([perm, np.full(vpad - V, V, np.int64)])
        old2new = np.empty(V, np.int64)
        old2new[perm] = np.arange(V)

    nwin = len(perm_layout) // LANES
    wd = -(-nwin // D)                       # windows per device
    if wd * D != nwin:                        # pad with dead windows
        extra = wd * D - nwin
        perm_layout = np.concatenate(
            [perm_layout, np.full(extra * LANES, V, np.int64)])
        nwin = wd * D
    vpad = nwin * LANES

    def _fam(cons, rest, lcap):
        return build_sharded_family(
            cons, rest, lcap, old2new=old2new, wd=wd, D=D, vpad=vpad,
            layer_cap=layer_cap, interpret=interpret, kernel="jacobi")

    efam = _fam(topology.edges, topology.edge_rest, 2) \
        if has_edges else None
    tfam = _fam(topology.tets, topology.tet_rest_vol, 3) \
        if has_tets else None

    gravity = jnp.asarray(params.gravity, jnp.float32)
    radius = max(1e-6, params.particle_radius)
    ground_point = jnp.asarray(params.ground_point, jnp.float32)
    gn = np.asarray(params.ground_normal, np.float32)
    n2 = float(np.dot(gn, gn))
    ground_normal = jnp.asarray(
        gn / np.float32(np.sqrt(n2)) if n2 >= 1e-12
        else np.array([0.0, 1.0, 0.0], np.float32))
    perm_j = jnp.asarray(perm_layout)
    old2new_j = jnp.asarray(old2new)

    # ---- global collision stages (self / surface), own-slice form --------
    # Same construction as the xpbd sharded path: device d owns layout rows
    # [d*wd*128, (d+1)*wd*128); each iteration all-gathers positions and
    # evaluates only the own slice against the global hash
    # (solver/global_stages.py); dead lanes parked in far-away cells.
    from .global_stages import build_sliced_stages

    _verts_pad = np.concatenate(
        [np.asarray(topology.vertices, np.float32),
         np.zeros((1, 3), np.float32)], axis=0)
    _tris_rows = None
    if params.surface_collision and len(topology.surface_tris):
        _tris_rows = np.asarray(old2new)[
            np.asarray(topology.surface_tris, np.int64).reshape(-1, 3)]
    self_fn, surf_fn, _iso = build_sliced_stages(
        topology, params, rest_rows=_verts_pad[perm_layout],
        dead=(perm_layout == V), tris_rows=_tris_rows)
    iso_rows = jnp.asarray(_iso.T)               # (3, vpad), row layout
    has_stage = self_fn is not None or surf_fn is not None
    vb = wd * LANES

    # ---- sharded pass: halo in, accumulate, home, apply ------------------
    def _build_ext(fam: _Family, x8, statics):
        """Local windows + all-gathered ghost windows (one halo exchange)."""
        (gather_src, ghost_mask, inc_src, inc_tgt, inc_mask,
         export_idx) = statics
        xw = x8.reshape(8, wd, LANES)
        exported = jnp.take(xw, export_idx, axis=1)        # (8, emax, 128)
        allw = jax.lax.all_gather(exported, axis)          # (D, 8, emax, 128)
        flat = allw.transpose(1, 0, 2, 3).reshape(8, D * fam.emax, LANES)
        ghosts = jnp.take(flat, gather_src, axis=1)        # (8, gmax, 128)
        ghosts = jnp.where(ghost_mask[None, :, None], ghosts, 0.0)
        return jnp.concatenate([xw, ghosts], axis=1).reshape(
            8, (wd + fam.gmax) * LANES)

    def sharded_pass(fam: _Family, x8, k, om, tabs, statics):
        (gather_src, ghost_mask, inc_src, inc_tgt, inc_mask,
         export_idx) = statics
        xw = x8.reshape(8, wd, LANES)
        # 1. export boundary windows (frozen snapshot)
        x_ext = _build_ext(fam, x8, statics)
        # 2. accumulate (epilogue withheld: apply=False kernel)
        acc = fam.sweep(x_ext, k, om, tabs).reshape(
            8, wd + fam.gmax, LANES)
        own = acc[:, :wd]
        # 3. ghost accumulators (delta + cnt) home to owners
        gd = acc[0:4, wd:]
        gd = jnp.where(ghost_mask[None, :, None], gd, 0.0)
        allg = jax.lax.all_gather(gd, axis)                # (D, 4, gmax, 128)
        gflat = allg.transpose(1, 0, 2, 3).reshape(4, D * fam.gmax, LANES)
        upd = jnp.take(gflat, inc_src, axis=1)             # (4, imax, 128)
        upd = jnp.where(inc_mask[None, :, None], upd, 0.0)
        own = own.at[0:4, inc_tgt].add(upd)   # dup targets sum (scatter-add)
        # 4. apply on the local shard (kernels/jacobi._apply_epilogue math)
        delta, cnt = own[0:3], own[3]
        wrow = xw[3]
        ok = (cnt > 0.0) & (wrow != 0.0)
        scale = om / jnp.maximum(cnt, 1.0)
        newx = jnp.where(ok, xw[0:3] + scale * delta, xw[0:3])
        return x8.at[0:3].set(newx.reshape(3, wd * LANES))

    def _statics(fam):
        return (jnp.asarray(fam.gather_src), jnp.asarray(fam.ghost_mask),
                jnp.asarray(fam.incoming_src), jnp.asarray(fam.incoming_tgt),
                jnp.asarray(fam.incoming_mask), jnp.asarray(fam.export_idx))

    e_statics = _statics(efam) if efam else None
    t_statics = _statics(tfam) if tfam else None

    def ground(x8):
        """Arbitrary-plane radius-aware projection on the local shard
        (SoftBodySolver.cs:548-551), row layout."""
        free = x8[3] != 0.0
        p = x8[0:3]
        d = (jnp.sum(p * ground_normal[:, None], axis=0)
             - jnp.dot(ground_normal, ground_point) - radius)
        pushed = p - ground_normal[:, None] * jnp.minimum(d, 0.0)
        return x8.at[0:3].set(jnp.where(free, pushed, p))

    def primitive_collide(x8):
        """Replicated primitive resolve on the local rows (the jacobi
        dialect's particle-radius form, SoftBodySolver.cs:554-561).  Dead
        / pinned lanes (w == 0) are never written."""
        from ..collide.primitives import collide_particles

        free = x8[3] != 0.0
        p = collide_particles(x8[0:3].T, radius, colliders)
        return x8.at[0:3].set(jnp.where(free, p.T, x8[0:3]))

    has_cols = colliders is not None and colliders.count > 0

    def make_sharded(n):
        """shard_map'd n-step runner (n is static: scan length)."""

        def shard_body(x8, vv, sdt, k_edge, k_vol, om,
                       e_tabs, t_tabs, e_st, t_st, iso_r):
            sq = lambda tup: tuple(a[0] for a in tup)
            e_tabs2 = (sq(e_tabs[:4]) + (e_tabs[4],)) if efam else None
            t_tabs2 = (sq(t_tabs[:4]) + (t_tabs[4],)) if tfam else None
            # v7 w-fill prologue (once per program): inverse masses are
            # invariant, including the all-gathered ghost windows' w rows
            if efam is not None:
                e_tabs2 = efam.sweep.fill_w(
                    _build_ext(efam, x8, sq(e_st)), e_tabs2)
            if tfam is not None:
                t_tabs2 = tfam.sweep.fill_w(
                    _build_ext(tfam, x8, sq(t_st)), t_tabs2)
            e_st2 = sq(e_st) if efam is not None else None
            t_st2 = sq(t_st) if tfam is not None else None
            ss = max(1, params.substeps)
            if has_stage:
                # inverse masses are invariant across the program
                w_full = jax.lax.all_gather(x8[3], axis, tiled=True)
                off = jax.lax.axis_index(axis) * vb

            def _gather_parked(x8):
                """Full parked position table (vpad, 3) for the hash."""
                return (jax.lax.all_gather(x8[0:3], axis, axis=1,
                                           tiled=True) + iso_r).T

            def collide_stage(x8):
                """Same per-iteration slot as the single-chip Pallas path
                (passes -> ground -> self -> surface); each stage reads one
                global snapshot, so the union of own-slice hit sets equals
                the unsliced evaluation."""
                free = x8[3] != 0.0
                if self_fn is not None:
                    d = self_fn(_gather_parked(x8), w_full, radius, off, vb)
                    x8 = x8.at[0:3].set(
                        jnp.where(free, x8[0:3] + d.T, x8[0:3]))
                if surf_fn is not None:
                    vd, corners = surf_fn(_gather_parked(x8), w_full,
                                          off, vb)
                    corners = jax.lax.psum(corners, axis)
                    cd = jax.lax.dynamic_slice_in_dim(corners, off, vb, 0)
                    x8 = x8.at[0:3].set(
                        jnp.where(free, x8[0:3] + (vd + cd).T, x8[0:3]))
                return x8

            def substep(carry, _):
                x8, vv = carry
                # PreSolve (SoftBodySolver.cs:349-362)
                free = x8[3:4] != 0.0
                vv = jnp.where(free, vv + gravity[:, None] * sdt, 0.0)
                xp = x8[0:3]
                x8 = x8.at[0:3].set(jnp.where(free, xp + vv * sdt, xp))

                def iteration(x8, _):
                    if efam is not None:
                        x8 = sharded_pass(efam, x8, k_edge, om, e_tabs2,
                                          e_st2)
                    if tfam is not None:
                        x8 = sharded_pass(tfam, x8, k_vol, om, t_tabs2,
                                          t_st2)
                    if params.ground_enabled:
                        x8 = ground(x8)
                    if has_cols:
                        x8 = primitive_collide(x8)
                    if has_stage:
                        x8 = collide_stage(x8)
                    return x8, None

                # chebyshev blends the position rows of the sharded x8
                # table (elementwise per window shard); pinned/dead lanes
                # collapse to identity like the single-device Pallas path
                x8 = chebyshev_scan(
                    lambda c: iteration(c, None)[0], x8, params,
                    get=lambda c: c[0:3],
                    set_=lambda c, p: c.at[0:3].set(p))

                # PostSolve (SoftBodySolver.cs:364-377)
                inv_dt = jnp.where(sdt > 0.0, 1.0 / sdt, 0.0)
                vv = jnp.where(free, (x8[0:3] - xp) * inv_dt, 0.0)
                return (x8, vv), None

            def one_step(c, _):
                c, _ = jax.lax.scan(substep, c, None, length=ss)
                return c, None

            (x8, vv), _ = jax.lax.scan(one_step, (x8, vv), None, length=n)
            return x8, vv

        shp = P(None, axis)          # (8|3, vpad) sharded along windows
        jtspec = (P(axis), P(axis), P(axis), P(axis), P(None))
        sspec = (P(axis),) * 6

        return shard_map(
            shard_body, mesh=mesh,
            in_specs=(shp, shp, P(), P(), P(), P(),
                      jtspec if efam else P(None),
                      jtspec if tfam else P(None),
                      sspec if efam else P(None),
                      sspec if tfam else P(None),
                      P(None, None)),
            out_specs=(shp, shp),
            check_vma=False)

    # ---- public boundary -------------------------------------------------
    def _run(state: SimState, dt, n):
        def rows3(a):
            ap = jnp.concatenate(
                [a, jnp.zeros((1, a.shape[1]), a.dtype)], axis=0)
            return ap[perm_j].T
        w = jnp.concatenate(
            [state.inv_mass, jnp.zeros((1,), jnp.float32)])[perm_j]
        x8 = jnp.concatenate(
            [rows3(state.x), w[None, :],
             jnp.zeros((4, vpad), jnp.float32)], axis=0)

        ss = max(1, params.substeps)
        sdt = jnp.float32(dt) / ss
        k_edge = jnp.float32(params.edge_stiffness)
        k_vol = jnp.float32(params.volume_stiffness)
        om = jnp.float32(params.sor_omega)

        dummy = jnp.zeros((1,), jnp.float32)
        x8, vv = make_sharded(n)(
            x8, rows3(state.v), sdt, k_edge, k_vol, om,
            efam.tables if efam else dummy,
            tfam.tables if tfam else dummy,
            e_statics if efam is not None else dummy,
            t_statics if tfam is not None else dummy,
            iso_rows)

        def unrows(rowsa):
            return rowsa.T[old2new_j]

        x = unrows(x8[0:3])
        return SimState(
            x=x, v=unrows(vv), x_star=x, inv_mass=state.inv_mass,
            edge_lambda=state.edge_lambda, tet_lambda=state.tet_lambda,
        )

    _jit = jax.jit(_run, static_argnums=2, donate_argnums=0)

    def step(state: SimState, dt) -> SimState:
        return _jit(state, dt, 1)

    def step_n(state: SimState, dt, n: int) -> SimState:
        return _jit(state, dt, int(n))

    step.step_n = step_n
    step.prejit = True
    step.shard_info = {
        "D": D, "wd": wd, "nwin": nwin,
        "perm_layout": perm_layout, "old2new": old2new,
        "edges": efam, "tets": tfam,
    }
    return step
