"""Multi-chip XPBD on the Pallas sweep kernels: shard_map + halo windows.

Round-2's flagship single-scene fast path (solver/xpbd_pallas.py) kept the
whole particle table in one chip's VMEM -- a hard ~500k-particle ceiling and
no scale-out story.  This module shards the WINDOW axis of the laid-out
particle table across a ``jax.sharding.Mesh`` axis and runs each device's
own super-block sub-plan with the unmodified kernels (kernels/sweep.py):

  - The vertex layout (RCM / aligned windows) is partitioned into
    contiguous per-device window ranges; each constraint is owned by the
    device owning its minimum window.  RCM keeps constraints band-local,
    so cross-device references touch only O(boundary) windows.
  - Per sweep, a device materializes its OWN windows plus a static list of
    GHOST windows (copies of remote windows its constraints reference),
    runs the full block-sequential sweep locally -- corrections to ghost
    copies accumulate like any window -- and then ships each ghost
    window's position DELTA back to its owner, which sums incoming deltas.
    Collectives per family sweep: one all_gather of exported boundary
    windows out, one all_gather of ghost deltas back (O(boundary) bytes,
    the same strip pattern as parallel/sharding.py::
    make_xpbd_vertex_sharded_step).

Ordering semantics (the dialect, exactly replayable): within a device the
sweep is the usual block-synchronous Gauss-Seidel; ACROSS devices one
family sweep is Jacobi -- every device reads boundary positions frozen at
the sweep start and boundary corrections sum.  Cross-device multiplicity
is tamed the same way in-block multiplicity is: constraints touching a
vertex shared by k devices scale dlambda by 1/k (folded into the packed
per-lane scale, so the NumPy replay in tests/test_pallas_sharded.py
follows it for free).

Reference parity: this is the TPU-native replacement for scaling the C++
server beyond one process (SURVEY.md section 2, "Distributed communication
backend": shard_map collectives over ICI replace the socket hop).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.state import SimState, SolverParams
from ..kernels import sweep as sw

LANES = 128


def _pad_plan(plan: sw.SuperPlan, nsup: int, dmax: int) -> sw.SuperPlan:
    """Pad a SuperPlan to a common (num_super, dmax) so per-device plans
    stack into one SPMD table set.  Pad blocks are no-ops: inv=-1
    everywhere (nothing scatters), window slot 0 absorbs the +0 RMWs."""
    S = plan.nslots
    p = plan
    add = nsup - p.num_super
    inv5 = p.inv.reshape(p.num_super, S, p.dmax, 8, LANES)
    if dmax > p.dmax:
        pad = np.full((p.num_super, S, dmax - p.dmax, 8, LANES), -1,
                      np.int32)
        inv5 = np.concatenate([inv5, pad], axis=2)
    if add:
        inv5 = np.concatenate(
            [inv5, np.full((add, S, dmax, 8, LANES), -1, np.int32)], axis=0)
    slots = np.concatenate(
        [p.slots, np.zeros((add, LANES), np.int32)], axis=0)
    rel = np.concatenate(
        [p.rel, np.zeros((add * p.arity * 8, LANES), np.int32)], axis=0)
    rest = np.concatenate(
        [p.rest, np.ones((add * 8, LANES), np.float32)], axis=0)
    scale = np.concatenate(
        [p.scale, np.ones((add * 8, LANES), np.float32)], axis=0)
    perm = np.concatenate(
        [p.perm, np.full((add * 8 * LANES,), -1, np.int64)], axis=0)
    return sw.SuperPlan(
        arity=p.arity, num_super=nsup, nslots=S, dmax=dmax,
        slots=slots, rel=rel,
        inv=np.ascontiguousarray(inv5.reshape(nsup * S * dmax * 8, LANES)),
        rest=rest, perm=perm, pos_of=p.pos_of, scale=scale)


@dataclasses.dataclass
class _Family:
    """Per-family static sharding info (stacked per-device tables)."""

    plans: list                 # per-device padded SuperPlan (replay info)
    tables: tuple               # stacked device arrays for the kernel
    lam_rows: int
    gather_src: np.ndarray      # (D, gmax) flat export index per ghost
    ghost_mask: np.ndarray      # (D, gmax) bool
    incoming_src: np.ndarray    # (D, imax) flat (dev*gmax+pos) delta index
    incoming_tgt: np.ndarray    # (D, imax) local target window (own space)
    incoming_mask: np.ndarray   # (D, imax) bool
    perm: np.ndarray            # (D, rows*LANES) global constraint ids
    pos_of: np.ndarray          # (N,) -> flat packed position (dev-major)
    gmax: int
    emax: int
    export_idx: np.ndarray      # (D, emax) own-window local ids to export
    sweep: object               # kernel callable
    l2g: list                   # per device: (wd+gmax,) local -> global win
    packed_cons: list           # per device: (rows*LANES, arity) local ids
    packed_scale: list          # per device: (rows*LANES,) f32 dlambda scale
    packed_rest: list           # per device: (rows*LANES,) f32


def build_sharded_family(cons_pub, rest_pub, lcap, *, old2new, wd, D, vpad,
                         layer_cap, interpret, kernel="xpbd",
                         scheme=("scale", 1.0, 1)):
    """Per-device sub-plans + halo maps for one constraint family.

    Shared by the sharded XPBD sweeps and the sharded Jacobi passes
    (solver/jacobi_pallas_sharded.py).  kernel="xpbd" folds the
    cross-device 1/k multiplicity into the per-lane dlambda scale and
    builds the sweep kernel; kernel="jacobi" builds the accumulator-only
    pass (apply=False -- the cnt-averaged apply happens on the local
    shard after ghost accumulators are homed, so no scale is needed).

    ``scheme``: this family's (block scheme, omega, local_iters), xpbd
    kernel only.  'split' is accepted ONLY at D=1 (it replaces the
    per-lane dlambda scale, which at D>1 also carries the cross-device
    1/k fold; within-block multiplicity counts would additionally need
    cross-device folding) -- it exists so a one-device mesh runs the
    SAME tuned dialect as the single-chip backend (the D=1 exactness
    contract, tests/test_sharding_colliders.py)."""
    sch, om, kk = scheme
    if sch == "split" and D > 1:
        raise ValueError("scheme='split' is single-device only (D=1)")
    cons = old2new[np.asarray(cons_pub, np.int64)]
    win = cons // LANES
    owner = win.min(axis=1) // wd

    # device count per vertex -> cross-device dlambda scale (xpbd only)
    dev_touch = np.zeros((vpad,), np.int64)
    for d in range(D):
        mine = cons[owner == d]
        if len(mine):
            touched = np.unique(mine.reshape(-1))
            dev_touch[touched] += 1
    cross = np.maximum(dev_touch, 1)

    ghost_lists = []
    plans = []
    for d in range(D):
        mine = cons[owner == d]
        mrest = np.asarray(rest_pub, np.float32)[owner == d]
        w = mine // LANES
        own_lo, own_hi = d * wd, (d + 1) * wd
        gw = np.unique(w[(w < own_lo) | (w >= own_hi)])
        ghost_lists.append(gw)
        g_index = {int(g): i for i, g in enumerate(gw)}

        def localize(vv):
            wv = vv // LANES
            lane = vv % LANES
            local_w = np.where(
                (wv >= own_lo) & (wv < own_hi), wv - own_lo,
                wd + np.vectorize(lambda x: g_index.get(int(x), 0))(wv))
            return local_w * LANES + lane

        local = localize(mine) if len(mine) else mine
        plan = sw.pack_superblocks(
            local.reshape(-1, cons.shape[1]) if len(mine)
            else np.zeros((0, cons.shape[1]), np.int64),
            mrest, wd + max(1, len(gw)),
            slots_cap=8, layer_cap=layer_cap or lcap)
        # fold cross-device multiplicity into the per-lane scale
        if len(mine) and kernel == "xpbd":
            cmult = cross[mine].max(axis=1).astype(np.float32)
            live = plan.perm >= 0
            extra_scale = np.ones_like(plan.scale).reshape(-1)
            extra_scale[live] = 1.0 / cmult[plan.perm[live]]
            plan = dataclasses.replace(
                plan, scale=(plan.scale.reshape(-1) * extra_scale
                             ).reshape(plan.scale.shape))
        plans.append((plan, local if len(mine) else mine,
                      np.flatnonzero(owner == d)))

    arity = cons.shape[1]
    gmax = max(1, max(len(g) for g in ghost_lists))
    l2g = []
    for d, gw in enumerate(ghost_lists):
        own = np.arange(d * wd, (d + 1) * wd, dtype=np.int64)
        gpad = np.concatenate(
            [gw, np.zeros(gmax - len(gw), np.int64)])
        l2g.append(np.concatenate([own, gpad]))
    nsup = max(p.num_super for p, _, _ in plans)
    dmax = max(p.dmax for p, _, _ in plans)
    padded = []
    packed_cons, packed_scale, packed_rest = [], [], []
    for p, local_cons, gids in plans:
        pp = _pad_plan(p, nsup, dmax)
        # packed-order local constraint table for the NumPy replay
        rows = pp.num_super * 8 * 128
        pc = np.full((rows, arity), -1, np.int64)
        live = pp.perm >= 0
        if live.any():
            pc[live] = local_cons[pp.perm[live]]
        packed_cons.append(pc)
        packed_scale.append(pp.scale.reshape(-1).copy())
        packed_rest.append(pp.rest.reshape(-1).copy())
        # remap perm: device-local constraint index -> GLOBAL id
        gperm = pp.perm.copy()
        if live.any():
            gperm[live] = gids[pp.perm[live]]
        pp = dataclasses.replace(pp, perm=gperm)
        padded.append(pp)

    # exports: own windows other devices need, per device
    exp_sets = []
    for d in range(D):
        need = [g[(g >= d * wd) & (g < (d + 1) * wd)] - d * wd
                for dd, g in enumerate(ghost_lists) if dd != d]
        exp_sets.append(np.unique(np.concatenate(need))
                        if need else np.zeros((0,), np.int64))
    emax = max(1, max(len(e) for e in exp_sets))
    export_idx = np.zeros((D, emax), np.int64)
    for d, e in enumerate(exp_sets):
        export_idx[d, :len(e)] = e
    exp_pos = [{int(w): i for i, w in enumerate(e)}
               for e in exp_sets]

    # ghost gather: ghost i of device d = exported slot of its owner
    gather_src = np.zeros((D, gmax), np.int64)
    ghost_mask = np.zeros((D, gmax), bool)
    for d, gw in enumerate(ghost_lists):
        for i, g in enumerate(gw):
            o = int(g) // wd
            gather_src[d, i] = o * emax + exp_pos[o][int(g) - o * wd]
            ghost_mask[d, i] = True

    # incoming deltas: for device d, every (src_dev, ghost_pos) whose
    # ghost window d owns
    inc = [[] for _ in range(D)]
    for s, gw in enumerate(ghost_lists):
        for i, g in enumerate(gw):
            o = int(g) // wd
            inc[o].append((s * gmax + i, int(g) - o * wd))
    imax = max(1, max(len(x) for x in inc))
    incoming_src = np.zeros((D, imax), np.int64)
    incoming_tgt = np.zeros((D, imax), np.int64)
    incoming_mask = np.zeros((D, imax), bool)
    for d, items in enumerate(inc):
        for j, (src, tgt) in enumerate(items):
            incoming_src[d, j] = src
            incoming_tgt[d, j] = tgt
            incoming_mask[d, j] = True

    # stacked kernel tables (leading device axis)
    stack = lambda f: jnp.asarray(np.stack([f(p) for p in padded]))
    rep = padded[0]
    if kernel == "xpbd":
        sweep = sw.make_sweep(rep, wd + gmax, interpret=interpret,
                              scheme=sch, omega=om, local_iters=kk)
        atab = sweep.tables[5]
        if sch == "split":
            # mass splitting (D=1 only, guard above): count tables inflate
            # the streamed w fill and the per-lane scale becomes flat
            # omega -- mirroring kernels/sweep._make_sweep_grouped
            scale_f = lambda p: np.full_like(p.scale, np.float32(om))
            cnt_f = sw.block_counts
        else:
            # legacy scale scheme: all-ones counts keep the w fill
            # bit-identical; explicit omega multiplies the scale
            scale_f = ((lambda p: p.scale * np.float32(om)) if om != 1.0
                       else (lambda p: p.scale))
            cnt_f = lambda p: np.ones_like(p.rel, np.float32)
        tables = (stack(lambda p: p.slots), stack(lambda p: p.rel),
                  stack(lambda p: p.inv), stack(lambda p: p.rest),
                  stack(scale_f), atab, stack(cnt_f))
    else:
        from ..kernels.jacobi import make_jacobi_pass

        sweep = make_jacobi_pass(rep, wd + gmax, interpret=interpret,
                                 apply=False)
        ktab = sweep.tables[4]         # dummy (non-PERK) stiffness tile
        tables = (stack(lambda p: p.slots), stack(lambda p: p.rel),
                  stack(lambda p: p.inv), stack(lambda p: p.rest), ktab)

    # lambda bookkeeping: device-major flat packed order
    rows = sw.lam_rows(rep)
    perm_all = np.stack([p.perm for p in padded])    # (D, rows*LANES)
    pos_of = np.full((len(cons),), -1, np.int64)
    flat = perm_all.reshape(-1)
    live = flat >= 0
    pos_of[flat[live]] = np.flatnonzero(live)

    return _Family(
        plans=padded, tables=tables, lam_rows=rows,
        gather_src=gather_src, ghost_mask=ghost_mask,
        incoming_src=incoming_src, incoming_tgt=incoming_tgt,
        incoming_mask=incoming_mask, perm=perm_all, pos_of=pos_of,
        gmax=gmax, emax=emax, export_idx=export_idx, sweep=sweep,
        l2g=l2g, packed_cons=packed_cons, packed_scale=packed_scale,
        packed_rest=packed_rest)


def make_xpbd_pallas_sharded_step(topology, params: SolverParams,
                                  mesh: Mesh, axis: str = "model",
                                  *, interpret: Optional[bool] = None,
                                  vertex_order: str = "auto",
                                  layer_cap: Optional[int] = None,
                                  colliders=None):
    """Build ``step(state, dt) -> state`` running the Pallas sweep backend
    sharded over ``mesh`` axis ``axis`` (see module docstring).

    The public SimState keeps original vertex/constraint order; layout
    permutation, window partitioning, and lambda packing are internal.
    ``step.shard_info`` exposes the per-device plans + halo maps so the
    NumPy replay test can follow the exact dialect.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if params.dialect != "xpbd":
        raise ValueError("sharded pallas path implements the xpbd dialect")
    from .xpbd_pallas import _resolve_block_scheme

    D = mesh.shape[axis]
    # At D=1 the sharded sweep IS the single-chip dialect, so 'auto'
    # resolves to the same tuned split defaults as the single-device
    # backend (the D=1 exactness contract); at D>1 blocks are
    # window-split across devices, so within-block multiplicity counts
    # would need cross-device folding (not designed) and 'auto' stays on
    # the legacy scale scheme.
    fam_scheme = _resolve_block_scheme(params, sharded=D > 1)
    if D > 1 and any(f != ("scale", 1.0, 1) for f in fam_scheme.values()):
        raise ValueError(
            "xpbd_block_scheme='split' (and block omega/local_iters) are "
            "single-device only; the window-sharded path at D>1 runs the "
            "legacy scale scheme (leave the xpbd_block_* knobs at "
            "defaults)")
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

    # ---- per-device constraint ownership + ghosts ------------------------
    def _fam(cons, rest, lcap, fam_key):
        return build_sharded_family(
            cons, rest, lcap, old2new=old2new, wd=wd, D=D, vpad=vpad,
            layer_cap=layer_cap, interpret=interpret, kernel="xpbd",
            scheme=fam_scheme[fam_key])

    efam = _fam(topology.edges, topology.edge_rest, 2, "edge") \
        if has_edges else None
    tfam = _fam(topology.tets, topology.tet_rest_vol, 3, "tet") \
        if has_tets else None

    gravity = jnp.asarray(params.gravity, jnp.float32)
    fr = min(1.0, max(0.0, params.friction))
    perm_j = jnp.asarray(perm_layout)
    old2new_j = jnp.asarray(old2new)

    # ---- global collision stages (self / surface), own-slice form --------
    # Device d owns the contiguous layout rows [d*wd*128, (d+1)*wd*128);
    # each iteration all-gathers the full position table and evaluates only
    # the own slice against the global hash (solver/global_stages.py).
    # Dead layout lanes (perm == V) are parked in far-away hash cells.
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
    sc_radius = max(1e-6, params.particle_radius)
    has_stage = self_fn is not None or surf_fn is not None
    vb = wd * LANES

    # ---- sharded sweep with halo exchange (runs inside shard_map) --------
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
        x_ext = jnp.concatenate([xw, ghosts], axis=1).reshape(
            8, (wd + fam.gmax) * LANES)
        return x_ext, ghosts

    def sharded_sweep(fam: _Family, x8, lam, alpha, tabs, statics):
        (gather_src, ghost_mask, inc_src, inc_tgt, inc_mask,
         export_idx) = statics
        # 1. export boundary windows (all devices, same program)
        x_ext, ghosts = _build_ext(fam, x8, statics)
        # 2. local block-sequential sweep (unmodified kernel)
        x_ext, lam = fam.sweep(x_ext, lam, alpha, tabs)
        x_ext = x_ext.reshape(8, wd + fam.gmax, LANES)
        own = x_ext[:, :wd]
        # 3. ghost deltas home to owners
        gd = x_ext[0:3, wd:] - ghosts[0:3]
        gd = jnp.where(ghost_mask[None, :, None], gd, 0.0)
        allg = jax.lax.all_gather(gd, axis)                # (D, 3, gmax, 128)
        gflat = allg.transpose(1, 0, 2, 3).reshape(3, D * fam.gmax, LANES)
        upd = jnp.take(gflat, inc_src, axis=1)             # (3, imax, 128)
        upd = jnp.where(inc_mask[None, :, None], upd, 0.0)
        own = own.at[0:3, inc_tgt].add(upd)   # dup targets sum (scatter-add)
        return own.reshape(8, wd * LANES), lam

    def _statics(fam):
        return (jnp.asarray(fam.gather_src), jnp.asarray(fam.ghost_mask),
                jnp.asarray(fam.incoming_src), jnp.asarray(fam.incoming_tgt),
                jnp.asarray(fam.incoming_mask), jnp.asarray(fam.export_idx))

    e_statics = _statics(efam) if efam else None
    t_statics = _statics(tfam) if tfam else None

    # ---- elementwise stages on the local shard ---------------------------
    def predict(x8, xp, vv, sdt):
        free = x8[3:4] != 0.0
        vv = jnp.where(free, vv + gravity[:, None] * sdt, vv)
        xs = jnp.where(free, xp + vv * sdt, xp)
        return x8.at[0:3].set(xs), vv

    def ground(x8):
        free = x8[3] != 0.0
        y = x8[1]
        return x8.at[1].set(
            jnp.where(free, jnp.maximum(y, params.ground_y), y))

    def primitive_collide(x8):
        """Replicated primitive resolve on the local rows (same extension
        as the single-device xpbd step: world space, zero radius).  Dead /
        pinned lanes (w == 0) are never written."""
        from ..collide.primitives import collide_particles

        free = x8[3] != 0.0
        p = collide_particles(x8[0:3].T, 0.0, colliders)
        return x8.at[0:3].set(jnp.where(free, p.T, x8[0:3]))

    has_cols = colliders is not None and colliders.count > 0

    def commit(x8, xp, vv, sdt):
        inv_dt = jnp.where(sdt > 1e-12, 1.0 / sdt, 0.0)
        free = x8[3:4] != 0.0
        xs = x8[0:3]
        vel = (xs - xp) * inv_dt
        if params.ground_enabled:
            on_g = xs[1] <= (params.ground_y + 1e-6)
            vx = jnp.where(on_g, vel[0] * (1.0 - fr), vel[0])
            vz = jnp.where(on_g, vel[2] * (1.0 - fr), vel[2])
            vy = jnp.where(on_g & (vel[1] < 0.0), 0.0, vel[1])
            vel = jnp.stack([vx, vy, vz], axis=0)
        vv = jnp.where(free, vel, 0.0)
        xp = jnp.where(free, xs, xp)
        return x8.at[0:3].set(xp), xp, vv

    def make_sharded(n):
        """shard_map'd n-step runner (n is static: scan length)."""

        def shard_body(x8, xp, vv, lam_e, lam_t, sdt, e_alpha, t_alpha,
                       e_tabs, t_tabs, e_st, t_st, iso_r):
            # squeeze the leading device axis off every sharded table
            sq = lambda tup: tuple(a[0] for a in tup)
            lam_e = lam_e[0] if efam is not None else lam_e
            lam_t = lam_t[0] if tfam is not None else lam_t
            e_tabs2 = (sq(e_tabs[:5]) + (e_tabs[5], e_tabs[6][0])
                       if efam else None)
            t_tabs2 = (sq(t_tabs[:5]) + (t_tabs[5], t_tabs[6][0])
                       if tfam else None)
            e_st2 = sq(e_st) if efam is not None else None
            t_st2 = sq(t_st) if tfam is not None else None
            # v7 w-fill prologue (once per program): inverse masses are
            # invariant, including the all-gathered ghost windows' w rows
            if efam is not None:
                e_tabs2 = efam.sweep.fill_w(
                    _build_ext(efam, x8, e_st2)[0], e_tabs2)
            if tfam is not None:
                t_tabs2 = tfam.sweep.fill_w(
                    _build_ext(tfam, x8, t_st2)[0], t_tabs2)
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
                (sweeps -> ground -> self -> surface); each stage reads one
                global snapshot, so the union of own-slice hit sets equals
                the unsliced evaluation."""
                free = x8[3] != 0.0
                if self_fn is not None:
                    d = self_fn(_gather_parked(x8), w_full, sc_radius,
                                off, vb)
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
                x8, xp, vv, lam_e, lam_t = carry
                x8, vv = predict(x8, xp, vv, sdt)

                def iteration(c, _):
                    x8, lam_e, lam_t = c
                    if efam is not None:
                        x8, lam_e = sharded_sweep(
                            efam, x8, lam_e, e_alpha, e_tabs2, e_st2)
                    if tfam is not None:
                        x8, lam_t = sharded_sweep(
                            tfam, x8, lam_t, t_alpha, t_tabs2, t_st2)
                    if params.ground_enabled:
                        x8 = ground(x8)
                    if has_cols:
                        x8 = primitive_collide(x8)
                    if has_stage:
                        x8 = collide_stage(x8)
                    return (x8, lam_e, lam_t), None

                (x8, lam_e, lam_t), _ = jax.lax.scan(
                    iteration, (x8, lam_e, lam_t), None,
                    length=params.iterations)
                x8, xp, vv = commit(x8, xp, vv, sdt)
                return (x8, xp, vv, lam_e, lam_t), None

            def one_step(c, _):
                c, _ = jax.lax.scan(substep, c, None, length=ss)
                return c, None

            (x8, xp, vv, lam_e, lam_t), _ = jax.lax.scan(
                one_step, (x8, xp, vv, lam_e, lam_t), None, length=n)
            lam_e = lam_e[None] if efam is not None else lam_e
            lam_t = lam_t[None] if tfam is not None else lam_t
            return x8, xp, vv, lam_e, lam_t

        shp = P(None, axis)          # (8|3, vpad) sharded along windows
        lshp = P(axis, None, None)   # (D, rows, LANES) device-major
        tspec = (P(axis), P(axis), P(axis), P(axis), P(axis), P(None),
                 P(axis))
        sspec = (P(axis),) * 6

        return shard_map(
            shard_body, mesh=mesh,
            in_specs=(shp, shp, shp,
                      lshp if efam else P(None),
                      lshp if tfam else P(None),
                      P(), P(), P(),
                      tspec if efam else P(None),
                      tspec if tfam else P(None),
                      sspec if efam else P(None),
                      sspec if tfam else P(None),
                      P(None, None)),
            out_specs=(shp, shp, shp,
                       lshp if efam else P(None),
                       lshp if tfam else P(None)),
            check_vma=False)

    # ---- public boundary -------------------------------------------------
    def pack_lam(fam, lam_pub):
        if fam is None:
            return jnp.zeros((1, 8, LANES), jnp.float32)
        perm = jnp.asarray(np.maximum(fam.perm, 0))
        mask = jnp.asarray(fam.perm >= 0)
        flat = jnp.where(mask, lam_pub[perm], 0.0)
        return flat.reshape(D, fam.lam_rows, LANES)

    def unpack_lam(fam, lam_dev):
        return lam_dev.reshape(-1)[jnp.asarray(fam.pos_of)]

    def _run(state: SimState, dt, n):
        def rows3(a):
            ap = jnp.concatenate(
                [a, jnp.zeros((1, a.shape[1]), a.dtype)], axis=0)
            return ap[perm_j].T
        w = jnp.concatenate(
            [state.inv_mass, jnp.zeros((1,), jnp.float32)])[perm_j]
        x8 = jnp.concatenate(
            [rows3(state.x_star), w[None, :],
             jnp.zeros((4, vpad), jnp.float32)], axis=0)
        lam_e = pack_lam(efam, state.edge_lambda)
        lam_t = pack_lam(tfam, state.tet_lambda)

        ss = max(1, params.substeps)
        sdt = jnp.float32(dt) / ss
        inv_dt2 = jnp.where(sdt > 1e-12, 1.0 / (sdt * sdt), 0.0)
        e_alpha = jnp.float32(max(0.0, params.edge_compliance)) * inv_dt2
        t_alpha = jnp.float32(max(0.0, params.volume_compliance)) * inv_dt2

        dummy = jnp.zeros((1,), jnp.float32)
        x8, xp, vv, lam_e, lam_t = make_sharded(n)(
            x8, rows3(state.x), rows3(state.v), lam_e, lam_t, sdt,
            e_alpha, t_alpha,
            efam.tables if efam else dummy,
            tfam.tables if tfam else dummy,
            e_statics if efam is not None else dummy,
            t_statics if tfam is not None else dummy,
            iso_rows)

        def unrows(rowsa):
            return rowsa.T[old2new_j]

        return SimState(
            x=unrows(xp), v=unrows(vv), x_star=unrows(x8[0:3]),
            inv_mass=state.inv_mass,
            edge_lambda=(unpack_lam(efam, lam_e)
                         if efam else state.edge_lambda),
            tet_lambda=(unpack_lam(tfam, lam_t)
                        if tfam else state.tet_lambda),
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
