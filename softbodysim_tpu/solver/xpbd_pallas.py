"""XPBD solver, Pallas-sweep backend -- the single-big-scene fast path.

Same physics contract as solver/xpbd.py (the C++ PBDServer semantics,
CProgram/src/Sim.cpp:100-222: XPBD compliance, lambda accumulated across the
whole run, ground clamp inside iterations, friction at commit), but the two
hot constraint sweeps run as Pallas kernels (kernels/sweep.py) that keep the
particle table VMEM-resident.  Ordering semantics are *block-synchronous*
(Jacobi within a 128-constraint block, Gauss-Seidel across blocks); the NumPy
oracle for this ordering is tests/oracle.py::xpbd_block_reference.

Internal state layout (device):
  x8 : (8, Vpad) f32  -- rows 0-2 x* xyz, row 3 inverse mass (lane-major)
  xp : (3, Vpad) f32  -- committed positions
  vv : (3, Vpad) f32  -- velocities
Vertices are permuted to a locality-friendly order (kernels/sweep.py::
order_vertices) and padded to a multiple of 128 with pinned zero-mass slots;
the permutation is applied/inverted only at the public SimState boundary.
``step.step_n(state, dt, n)`` amortizes that boundary over n steps.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import SimState, SolverParams
from ..collide.primitives import Colliders, collide_particles
from ..kernels import sweep as sw
from .spatial import make_self_collision_fn

LANES = 128

# The flat path keeps the whole (8, Vpad) particle table VMEM-resident.
# Under Mosaic's DEFAULT 16 MB scoped-VMEM budget that capped at ~4000
# windows (~512k particles); since round 4d the sweep kernels raise the
# budget to the hardware's real capacity (sw.VMEM_LIMIT_BYTES, 100 MB
# measured working on v5e), scaling the flat cap to ~1.47M particles f32
# / ~2.9M bf16 (see the flat_cap computation in make_xpbd_pallas_step).
# MAX_FLAT_WINDOWS remains the conservative floor.
# Above the cap the step auto-switches to SEGMENTED execution (see
# _build_seg_plan): windows are split into contiguous segments, each family
# sweep runs one trimmed kernel chain per segment over (own + ghost
# windows), segments sequentially.  Because segments run in block order and
# a ghost window has exactly one concurrent holder, writing ghosts back by
# REPLACEMENT makes the segmented sweep bit-identical to a flat sweep over
# the concatenated block order -- same dialect, same oracle replay.
MAX_FLAT_WINDOWS = 4032
DEFAULT_SEG_WINDOWS = 2048

# Packing a 600k-constraint topology takes seconds of host work; memoize per
# (topology object, packing params) so rebuilding steps with different
# substeps/iterations reuses the plans.  Entries die with the topology.
_PLAN_CACHE: dict = {}


def _pack_best(cons, rest, lcap, arity, nwin, slots_cap, layer_cap):
    """Adaptive super-block packing: both greedy-scan orders x slot caps,
    keep the min by the per-block op-count model (see the comment at the
    call site in _cached_plans for the calibration story)."""
    caps = ([slots_cap] if slots_cap is not None else [8, 12, 16])
    best = None
    for order_mode in (1, 0):
        for scap in caps:
            plan = sw.pack_superblocks(
                cons, rest, nwin, slots_cap=scap,
                layer_cap=layer_cap or lcap, order_mode=order_mode)
            # per-block op model: gathers ~12/(role,slot), scatter
            # tiles ~15/(slot,layer), ~80 fixed (compute+lam+RMWs)
            cost = plan.num_super * (12 * arity * scap
                                     + 15 * scap * plan.dmax + 80)
            if best is None or cost < best[0]:
                best = (cost, plan)
            if len(cons) / plan.capacity >= 0.6:
                break   # dense enough; wider pools only add ops
    return best[1]


@dataclasses.dataclass
class _Seg:
    """One window segment of a segmented family plan."""

    w0: int              # first own window (global layout id)
    ngw: int             # ghost window count
    gw: np.ndarray       # (ngw,) global ids of ghost windows
    gids: np.ndarray     # owned constraint ids (public order)
    plan: sw.SuperPlan   # local packing over (ws + ngw) windows, regrouped


@dataclasses.dataclass
class _SegPlan:
    """Segmented family packing: per-segment sub-plans + ghost maps.

    ``perm``/``scale`` expose the CONCATENATED block order (global
    constraint ids / per-lane dlambda scale) so the block-synchronous
    oracle replay (tests/oracle.py::step_blocks) covers the segmented
    execution unchanged; ``super_blocks`` marks the 1024-wide block width
    for kernels.sweep.block_width."""

    ws: int              # windows per segment
    nwin: int            # padded global window count (multiple of ws)
    arity: int
    segs: List[_Seg]
    pos_of: np.ndarray   # (N,) -> concatenated packed position
    perm: np.ndarray     # concat packed position -> global id (-1 pad)
    scale: np.ndarray    # concat per-lane dlambda under-relaxation
    super_blocks: bool = True


def _build_seg_plan(cons_pub, rest_pub, lcap, *, old2new, nwin, ws,
                    slots_cap, layer_cap) -> _SegPlan:
    """Partition a family by owner segment (min window // ws) and pack each
    segment's constraints over LOCAL windows: own windows 0..ws-1, ghost
    (out-of-segment) windows appended at ws+i.  RCM/aligned layouts keep
    constraints band-local, so ghost lists stay O(boundary)."""
    cons = old2new[np.asarray(cons_pub, np.int64)]
    rest = np.asarray(rest_pub, np.float32)
    arity = cons.shape[1]
    win = cons // LANES
    owner = win.min(axis=1) // ws
    nseg = nwin // ws
    segs: List[_Seg] = []
    pos_of = np.full((len(cons),), -1, np.int64)
    perm_parts, scale_parts = [], []
    offset = 0
    loc_w = np.empty((nwin,), np.int64)
    for d in range(nseg):
        gids = np.flatnonzero(owner == d)
        if len(gids) == 0:
            continue
        mine = cons[gids]
        w = mine // LANES
        own_lo, own_hi = d * ws, (d + 1) * ws
        gw = np.unique(w[(w < own_lo) | (w >= own_hi)])
        loc_w[own_lo:own_hi] = np.arange(ws)
        loc_w[gw] = ws + np.arange(len(gw))
        local = loc_w[w] * LANES + mine % LANES
        plan = sw.regroup_plan(_pack_best(
            local, rest[gids], lcap, arity, ws + len(gw),
            slots_cap, layer_cap))
        segs.append(_Seg(w0=own_lo, ngw=len(gw), gw=gw, gids=gids,
                         plan=plan))
        live = plan.perm >= 0
        gperm = np.where(live, gids[np.maximum(plan.perm, 0)], -1)
        pos_of[gperm[live]] = offset + np.flatnonzero(live)
        offset += gperm.size
        perm_parts.append(gperm)
        scale_parts.append(plan.scale.reshape(-1))
    return _SegPlan(
        ws=ws, nwin=nwin, arity=arity, segs=segs, pos_of=pos_of,
        perm=(np.concatenate(perm_parts) if perm_parts
              else np.zeros((0,), np.int64)),
        scale=(np.concatenate(scale_parts) if scale_parts
               else np.zeros((0,), np.float32)))


def _cached_plans(topology, vertex_order, slots_cap, layer_cap,
                  superblocks, seg_windows=0):
    """Returns (perm_layout, old2new, nwin, e_plan, t_plan).

    perm_layout is (nwin*128,) with old vertex ids, entries ==
    num_particles marking dead slots (end padding, and -- for multi-body
    merged meshes -- component-alignment gaps; see sweep.aligned_order).
    """
    import weakref

    key = (id(topology), vertex_order, slots_cap, layer_cap, superblocks,
           seg_windows)
    hit = _PLAN_CACHE.get(key)
    if hit is not None:
        return hit

    V = topology.num_particles
    has_edges = topology.num_edges > 0
    has_tets = topology.num_tets > 0

    # Disk cache (io/plan_store.py): packing is a deterministic function
    # of the topology arrays + packing params, and dominates cold-start
    # host time at scale (~4 min at 1M particles).  vertices are hashed
    # because order_vertices reads them (RCM tie-breaks / spatial modes).
    from ..io import plan_store

    dkey = plan_store.content_key([
        "xpbd_pallas_plans", sw.PACK_VERSION, V,
        topology.vertices,
        topology.edges if has_edges else None,
        topology.edge_rest if has_edges else None,
        topology.tets if has_tets else None,
        topology.tet_rest_vol if has_tets else None,
        vertex_order, slots_cap, layer_cap, superblocks, seg_windows,
    ]) if plan_store.enabled() else None
    if dkey is not None:
        disk = plan_store.load(dkey)
        if disk is not None:
            _PLAN_CACHE[key] = disk
            try:
                weakref.finalize(topology, _PLAN_CACHE.pop, key, None)
            except TypeError:  # pragma: no cover
                pass
            return disk
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
            mode="auto" if vertex_order == "aligned" else vertex_order)
        vpad = -(-V // LANES) * LANES
        perm_layout = np.concatenate(
            [perm, np.full(vpad - V, V, np.int64)])
        old2new = np.empty(V, np.int64)
        old2new[perm] = np.arange(V)
    nwin = len(perm_layout) // LANES

    e_plan = t_plan = None
    if seg_windows:
        ws = int(seg_windows)
        if nwin % ws:                     # pad to a whole segment count
            extra = ws - nwin % ws
            perm_layout = np.concatenate(
                [perm_layout, np.full(extra * LANES, V, np.int64)])
            nwin += extra
        if has_edges:
            e_plan = _build_seg_plan(
                topology.edges, topology.edge_rest, 2, old2new=old2new,
                nwin=nwin, ws=ws, slots_cap=slots_cap, layer_cap=layer_cap)
        if has_tets:
            t_plan = _build_seg_plan(
                topology.tets, topology.tet_rest_vol, 3, old2new=old2new,
                nwin=nwin, ws=ws, slots_cap=slots_cap, layer_cap=layer_cap)
    elif superblocks:
        # 1024-wide super-blocks; same-sublane multiplicity cap 2 for edges
        # (degree ~14 spreads over 8 sublanes), 3 for tets (interior
        # vertices sit in ~24 tets).  The window-slot pool is ADAPTIVE:
        # structured meshes pack densely at S=8 (cheapest gathers), but
        # high-bandwidth unstructured meshes (the reference's Delaunay
        # assets span 5-8 windows per tet even after RCM) fill as little as
        # 0.2 there -- wider pools trade gather ops for fill; _pack_best
        # tries both greedy-scan orders (sweep._pack_order) x slot caps and
        # keeps the min by the op-count model.
        if has_edges:
            e_plan = sw.regroup_plan(_pack_best(
                old2new[topology.edges.astype(np.int64)],
                topology.edge_rest, 2, 2, nwin, slots_cap, layer_cap))
        if has_tets:
            t_plan = sw.regroup_plan(_pack_best(
                old2new[topology.tets.astype(np.int64)],
                topology.tet_rest_vol, 3, 4, nwin, slots_cap, layer_cap))
    else:
        scap = 4 if slots_cap is None else slots_cap
        if has_edges:
            e_plan = sw.pack_constraints(
                old2new[topology.edges.astype(np.int64)],
                topology.edge_rest, nwin,
                slots_cap=scap, layer_cap=layer_cap or 3)
        if has_tets:
            t_plan = sw.pack_constraints(
                old2new[topology.tets.astype(np.int64)],
                topology.tet_rest_vol, nwin,
                slots_cap=scap, layer_cap=layer_cap or 3)

    result = (perm_layout, old2new, nwin, e_plan, t_plan)
    if dkey is not None:
        plan_store.save(dkey, result)
    _PLAN_CACHE[key] = result
    try:
        weakref.finalize(topology, _PLAN_CACHE.pop, key, None)
    except TypeError:  # pragma: no cover - non-weakrefable topology
        pass
    return result


def _resolve_block_scheme(params: SolverParams, sharded: bool = False,
                          legacy: bool = False):
    """Per-family block-scheme config from the params knobs.

    Returns {"edge": (scheme, omega, k), "tet": (scheme, omega, k)}.
    scheme / omega / local_iters accept a scalar (both families) or an
    (edge, tet) pair.

    'auto' resolves to the at-scale tuned split defaults (PLAN.md round
    4a: north-star-scale settled residual vs the compiled reference's
    serial GS -- edge 0.92x, tet 0.80x, from the legacy scale scheme's
    0.92x/1.46x, at IDENTICAL steps/s): both families mass-split, omega
    (1.5, 2.2), no in-block revisits.  When an 'auto' family resolves to
    split, an un-set omega knob (its neutral default 1.0) resolves with
    it; explicit values always win.

    ``sharded``: the window-sharded Pallas path splits blocks across
    devices, so within-block multiplicity counts would need cross-device
    folding -- not designed yet; 'auto' stays on the legacy scale scheme
    there (explicit split raises in the sharded builder).

    ``legacy``: the superblocks=False SweepPlan kernels support only the
    scale scheme; 'auto' resolves to it there so the opt-out path keeps
    working out of the box (explicit split raises in make_sweep)."""

    def pair(v, cast):
        if isinstance(v, (tuple, list)):
            e, t = v
            return cast(e), cast(t)
        return cast(v), cast(v)

    se, st = pair(params.xpbd_block_scheme, str)
    oe, ot = pair(params.xpbd_block_omega, float)
    ke, kt = pair(params.xpbd_block_local_iters, lambda x: max(1, int(x)))
    om_default = not isinstance(params.xpbd_block_omega, (tuple, list)) \
        and float(params.xpbd_block_omega) == 1.0
    auto = "scale" if (sharded or legacy) else "split"
    if se == "auto":
        se = auto
        if se == "split" and om_default:
            oe = 1.5
    if st == "auto":
        st = auto
        if st == "split" and om_default:
            ot = 2.2
    return {"edge": (se, oe, ke), "tet": (st, ot, kt)}


def _make_seg_sweep(segplan: _SegPlan, interpret: bool, alpha_pub=None,
                    scheme: str = "scale", omega: float = 1.0,
                    local_iters: int = 1):
    """Segmented family sweep with the flat sweep's call contract:
    ``sweep(x8, lam_segs, alpha, tables) -> (x8, lam_segs)`` where x8 is
    the full (8, nwin*LANES) table and lam_segs / tables are per-segment
    tuples.

    Per segment: slice own windows + gather ghost windows into a local
    (8, (ws+ngw)*LANES) table, run the segment's trimmed kernel chain, then
    write own windows back and REPLACE ghost windows' xyz rows.  Segments
    run sequentially and a ghost window has exactly one holder between its
    gather and write-back (its owner either already ran or runs later), so
    replacement reproduces the flat sweep over the concatenated block
    order bit-for-bit."""
    ws = segplan.ws
    nwin = segplan.nwin
    vpad = nwin * LANES
    sweeps, tabs_all = [], []
    for seg in segplan.segs:
        a_loc = (np.asarray(alpha_pub, np.float32)[seg.gids]
                 if alpha_pub is not None else None)
        call = sw.make_sweep(seg.plan, ws + seg.ngw, interpret=interpret,
                             per_constraint_alpha=a_loc, scheme=scheme,
                             omega=omega, local_iters=local_iters)
        sweeps.append(call)
        tabs_all.append((call.tables, jnp.asarray(seg.gw, jnp.int32)))

    def _ext(seg, x8, gw):
        """Segment-local table: own windows + gathered ghost windows."""
        c0 = seg.w0 * LANES
        own = x8[:, c0:c0 + ws * LANES]
        if not seg.ngw:
            return own
        xw = x8.reshape(8, nwin, LANES)
        ghosts = jnp.take(xw, gw, axis=1)
        return jnp.concatenate(
            [own.reshape(8, ws, LANES), ghosts],
            axis=1).reshape(8, (ws + seg.ngw) * LANES)

    def fill_w(x8, tables):
        """Per-segment w-fill (once per program; w rows never change)."""
        out = []
        for seg, call, (ktabs, gw) in zip(segplan.segs, sweeps, tables):
            out.append((call.fill_w(_ext(seg, x8, gw), ktabs), gw))
        return tuple(out)

    def sweep(x8, lam_segs, alpha, tables):
        outs = []
        for seg, call, (ktabs, gw), lam in zip(segplan.segs, sweeps,
                                               tables, lam_segs):
            c0 = seg.w0 * LANES
            x_ext, lam_o = call(_ext(seg, x8, gw), lam, alpha, ktabs)
            x_ext = x_ext.reshape(8, ws + seg.ngw, LANES)
            x8 = x8.at[:, c0:c0 + ws * LANES].set(
                x_ext[:, :ws].reshape(8, ws * LANES))
            if seg.ngw:
                xw = x8.reshape(8, nwin, LANES)
                xw = xw.at[0:3, gw].set(x_ext[0:3, ws:])
                x8 = xw.reshape(8, vpad)
            outs.append(lam_o)
        return x8, tuple(outs)

    sweep.tables = tuple(tabs_all)
    sweep.fill_w = fill_w
    sweep.grouped = True
    sweep.segmented = True
    return sweep


def _seg_pack_lam(segplan: _SegPlan, gids_j, lam_pub):
    return tuple(
        sw.split_lambda(seg.plan, sw.pack_lambda(seg.plan, lam_pub[g]))
        for seg, g in zip(segplan.segs, gids_j))


def _seg_unpack_lam(segplan: _SegPlan, gids_j, lam_segs, lam_template):
    out = jnp.zeros_like(lam_template)
    for seg, g, stripes in zip(segplan.segs, gids_j, lam_segs):
        local = sw.unpack_lambda(seg.plan, sw.join_lambda(seg.plan,
                                                          stripes))
        out = out.at[g].set(local)
    return out


def _f32(x):
    return jnp.asarray(x, jnp.float32)


def make_xpbd_pallas_step(topology, params: SolverParams,
                          colliders: Optional[Colliders] = None,
                          *, interpret: Optional[bool] = None,
                          vertex_order: str = "auto",
                          superblocks: bool = True,
                          slots_cap: Optional[int] = None,
                          layer_cap: Optional[int] = None,
                          seg_windows: Optional[int] = None,
                          edge_c=None, tet_c=None):
    """Build ``step(state, dt, ...) -> state`` on the Pallas sweep kernels.

    interpret=None auto-selects Pallas interpreter mode off-TPU (tests run on
    the CPU backend).  The returned function also carries ``step.step_n``:
    ``step_n(state, dt, n) -> state`` runs n steps with the layout/permute
    boundary paid once (the honest multi-step benchmark path).

    edge_c / tet_c: optional (E,)/(T,) per-constraint COMPLIANCE in public
    constraint order (mixed-material merged scenes).  alpha_i =
    compliance_i / dt^2 exactly; step-time edge_compliance /
    volume_compliance overrides then SCALE the tables (default 1.0).

    seg_windows: windows per segment for SEGMENTED execution (see the
    module constants) -- None auto-selects (flat below MAX_FLAT_WINDOWS,
    DEFAULT_SEG_WINDOWS-window segments above, lifting the ~512k-particle
    single-chip VMEM ceiling), 0 forces the flat path.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret and jax.config.jax_compilation_cache_dir:
        # jax 0.9's persistent cache segfaults DESERIALIZING executables that
        # contain interpret-mode pallas_calls (compilation_cache.py:238);
        # interpret mode is a test/debug path, so trade its caching away.
        jax.config.update("jax_compilation_cache_dir", None)

    V = topology.num_particles
    has_edges = topology.num_edges > 0
    has_tets = topology.num_tets > 0

    if params.xpbd_x_dtype == "float32":
        x_dtype = jnp.float32
    elif params.xpbd_x_dtype == "bfloat16":
        x_dtype = jnp.bfloat16
    else:
        raise ValueError(
            f"unknown xpbd_x_dtype {params.xpbd_x_dtype!r} "
            "(float32|bfloat16)")
    bf16 = x_dtype == jnp.bfloat16
    if seg_windows is None:
        est_nwin = -(-V // LANES)
        # Flat capacity scales with the sweep kernels' scoped-VMEM budget
        # (sw.VMEM_LIMIT_BYTES, default 100 MB -- PLAN.md round 4d).  The
        # kernel builder requests min(2*xbytes + 8 MB, VMEM_LIMIT_BYTES)
        # (sweep.py _make_sweep_grouped): cap windows by the SAME formula
        # so the request never exceeds the granted budget (2*xbytes + 8 MB
        # <= limit), else a max-flat-size scene could fail Mosaic
        # allocation instead of auto-segmenting.  bf16 halves the table
        # and doubles the window count (~2.9M particles at the default
        # budget vs ~1.5M f32).
        xb = 8 * LANES * (2 if bf16 else 4)
        flat_cap = max(MAX_FLAT_WINDOWS,
                       (sw.VMEM_LIMIT_BYTES - 8 * 2**20) // (2 * xb))
        seg_windows = (DEFAULT_SEG_WINDOWS
                       if superblocks and est_nwin > flat_cap
                       else 0)
    if seg_windows and not superblocks:
        raise ValueError("segmented execution requires superblocks=True")
    segmented = bool(seg_windows)
    if segmented and bf16:
        raise ValueError(
            "xpbd_x_dtype='bfloat16' is the FLAT-path capacity option; "
            "the segmented path already lifts the VMEM ceiling at full "
            "precision (leave xpbd_x_dtype at 'float32')")

    perm, old2new, nwin, e_plan, t_plan = _cached_plans(
        topology, vertex_order, slots_cap, layer_cap, superblocks,
        seg_windows)
    vpad = nwin * LANES

    fam_scheme = _resolve_block_scheme(params, legacy=not superblocks)
    e_sch, e_om, e_k = fam_scheme["edge"]
    t_sch, t_om, t_k = fam_scheme["tet"]
    edge_sweep = tet_sweep = None
    e_gids = t_gids = None
    if has_edges:
        if segmented:
            edge_sweep = _make_seg_sweep(e_plan, interpret, edge_c,
                                         scheme=e_sch, omega=e_om,
                                         local_iters=e_k)
            e_gids = tuple(jnp.asarray(s.gids, jnp.int32)
                           for s in e_plan.segs)
        else:
            edge_sweep = sw.make_sweep(e_plan, nwin, interpret=interpret,
                                       per_constraint_alpha=edge_c,
                                       scheme=e_sch, omega=e_om,
                                       local_iters=e_k, x_dtype=x_dtype)
    if has_tets:
        if segmented:
            tet_sweep = _make_seg_sweep(t_plan, interpret, tet_c,
                                        scheme=t_sch, omega=t_om,
                                        local_iters=t_k)
            t_gids = tuple(jnp.asarray(s.gids, jnp.int32)
                           for s in t_plan.segs)
        else:
            tet_sweep = sw.make_sweep(t_plan, nwin, interpret=interpret,
                                      per_constraint_alpha=tet_c,
                                      scheme=t_sch, omega=t_om,
                                      local_iters=t_k, x_dtype=x_dtype)
    gravity = jnp.asarray(params.gravity, jnp.float32)
    fr = min(1.0, max(0.0, params.friction))

    # Spatial-hash self/inter-body collision (solver/spatial.py) on the
    # permuted row layout, same design as the jacobi Pallas path: hashing
    # only reads positions so vertex order is irrelevant, but dead layout
    # lanes (perm == V: tail pad + component-alignment gaps) sit at the
    # sentinel origin and would shove nearby live particles -- a static
    # offset table parks each dead lane in its own far-away hash cell.
    # iso rides the tables tuple so it enters the jit as an argument.
    self_collide = None
    surf_collide = None
    sc_radius = max(1e-6, params.particle_radius)
    iso = jnp.zeros((3, 0), jnp.float32)
    if params.self_collision or (params.surface_collision
                                 and len(topology.surface_tris)):
        cell = (float(params.self_collision_cell) if params.self_collision
                else max(float(params.surface_thickness), 2.0 * sc_radius))
        spacing = 2.0 * max(cell, 2.0 * sc_radius,
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
        # Vertex-triangle surface contact on the permuted row layout, same
        # design as the jacobi Pallas path (solver/jacobi_pallas.py):
        # triangle corner ids remapped old->row, dead-lane query points
        # parked in far-away iso cells, w==0 rows never written back.
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

    tables = (edge_sweep.tables if has_edges else (),
              tet_sweep.tables if has_tets else (),
              jnp.asarray(perm), jnp.asarray(old2new), iso)

    # ---- public <-> internal layout --------------------------------------
    # perm entries == V are dead slots (tail pad + component-alignment
    # gaps): they gather a sentinel zero row and stay pinned (w=0).

    def to_rows(state: SimState, perm_j):
        def rows3(a):                      # (V,3) -> (3,Vpad), permuted
            ap = jnp.concatenate(
                [a, jnp.zeros((1, a.shape[1]), a.dtype)], axis=0)
            return ap[perm_j].T
        w = jnp.concatenate(
            [state.inv_mass, jnp.zeros((1,), jnp.float32)])[perm_j]
        x8 = jnp.concatenate(
            [rows3(state.x_star), w[None, :],
             jnp.zeros((4, vpad), jnp.float32)], axis=0).astype(x_dtype)
        # grouped plans carry lambdas as per-group stripe tuples;
        # segmented plans as per-segment tuples of those
        def pack_l(plan, gids, lam):
            if plan is None:
                return jnp.zeros((8, LANES), jnp.float32)
            if segmented:
                return _seg_pack_lam(plan, gids, lam)
            return sw.split_lambda(plan, sw.pack_lambda(plan, lam))

        lam_e = pack_l(e_plan if has_edges else None, e_gids,
                       state.edge_lambda)
        lam_t = pack_l(t_plan if has_tets else None, t_gids,
                       state.tet_lambda)
        return (x8, rows3(state.x), rows3(state.v), lam_e, lam_t)

    def to_public(carry, state: SimState, old2new_j) -> SimState:
        x8, xp, vv, lam_e, lam_t = carry

        def unrows(rows):                  # (3,Vpad) -> (V,3), unpermuted
            return rows.T[old2new_j]

        def unpack_l(plan, gids, lam_dev, lam_pub):
            if plan is None:
                return lam_pub
            if segmented:
                return _seg_unpack_lam(plan, gids, lam_dev, lam_pub)
            return sw.unpack_lambda(plan, sw.join_lambda(plan, lam_dev))

        return SimState(
            x=unrows(xp), v=unrows(vv),
            x_star=unrows(x8[0:3].astype(jnp.float32)),
            inv_mass=state.inv_mass,
            edge_lambda=unpack_l(e_plan if has_edges else None, e_gids,
                                 lam_e, state.edge_lambda),
            tet_lambda=unpack_l(t_plan if has_tets else None, t_gids,
                                lam_t, state.tet_lambda),
        )

    # ---- substep pieces (all on row layout) ------------------------------

    def predict(x8, xp, vv, sdt):
        """Semi-implicit Euler (Sim.cpp:178-185); pinned rows hold still.
        xp/vv stay f32 always; only the x8 working table rounds to the
        opt-in bf16 dtype on write.  Returns the f32 prediction too: the
        commit reconstructs positions as f32_prediction + (rounded table
        delta) so sub-ulp integration increments never quantize away
        (only the constraint/collision corrections round)."""
        free = x8[3:4] != 0.0
        vv = jnp.where(free, vv + gravity[:, None] * sdt, vv)
        xs = jnp.where(free, xp + vv * sdt, xp)
        return x8.at[0:3].set(xs.astype(x8.dtype)), vv, xs

    def ground(x8):
        """Axis-aligned y clamp (Sim.cpp:187-195)."""
        free = x8[3] != 0.0
        y = x8[1]
        return x8.at[1].set(
            jnp.where(free, jnp.maximum(y, params.ground_y), y))

    def collide(x8, cols_rt):
        free = x8[3] != 0.0
        p = x8[0:3].T.astype(jnp.float32)
        pushed = collide_particles(
            p, 0.0, cols_rt if cols_rt is not None else colliders)
        return x8.at[0:3].set(
            jnp.where(free, pushed.T, p.T).astype(x8.dtype))

    def commit(x8, xp, vv, sdt, xs_pred):
        """Velocity update + ground friction (Sim.cpp:197-222).

        bf16 x-table: the committed position is the f32 prediction plus
        the table's correction DELTA (final - rounded prediction) -- the
        two roundings share a grid so the base quantization cancels and
        the f32 integrate path never stalls below the bf16 ulp (without
        this the working table swallows sub-ulp integration increments
        and free fall visibly lags -- measured, PLAN.md round 4d).  The
        f32 table reads positions directly (a + (b - a) is not b in fp;
        the oracle bit-parity contract stays untouched)."""
        inv_dt = jnp.where(sdt > 1e-12, 1.0 / sdt, 0.0)
        free = x8[3:4] != 0.0
        if bf16:
            xs = xs_pred + (x8[0:3].astype(jnp.float32)
                            - xs_pred.astype(x8.dtype)
                            .astype(jnp.float32))
        else:
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
        return x8.at[0:3].set(xp.astype(x8.dtype)), xp, vv

    def substep(carry, sdt, e_alpha, t_alpha, cols_rt, e_tabs, t_tabs,
                iso_t):
        x8, xp, vv, lam_e, lam_t = carry
        x8, vv, xs_pred = predict(x8, xp, vv, sdt)

        def iteration(c, _):
            x8, lam_e, lam_t = c
            if has_edges:
                x8, lam_e = edge_sweep(x8, lam_e, e_alpha, e_tabs)
            if has_tets:
                x8, lam_t = tet_sweep(x8, lam_t, t_alpha, t_tabs)
            if params.ground_enabled:
                x8 = ground(x8)
            if colliders is not None:
                x8 = collide(x8, cols_rt)
            if self_collide is not None:
                # live lanes have iso == 0; dead/pinned lanes (w == 0) are
                # never written back
                p = self_collide(
                    (x8[0:3].astype(jnp.float32) + iso_t).T,
                    x8[3].astype(jnp.float32), sc_radius)
                x8 = x8.at[0:3].set(
                    jnp.where(x8[3] != 0.0, p.T.astype(x8.dtype),
                              x8[0:3]))
            if surf_collide is not None:
                p = surf_collide(
                    (x8[0:3].astype(jnp.float32) + iso_t).T,
                    x8[3].astype(jnp.float32))
                x8 = x8.at[0:3].set(
                    jnp.where(x8[3] != 0.0, p.T.astype(x8.dtype),
                              x8[0:3]))
            return (x8, lam_e, lam_t), None

        (x8, lam_e, lam_t), _ = jax.lax.scan(
            iteration, (x8, lam_e, lam_t), None, length=params.iterations)
        x8, xp, vv = commit(x8, xp, vv, sdt, xs_pred)
        return (x8, xp, vv, lam_e, lam_t)

    def _run_rows(carry, dt, n, ec, vc, cols_rt, e_tabs, t_tabs, iso_t):
        ss = max(1, params.substeps)
        sdt = _f32(dt) / ss
        inv_dt2 = jnp.where(sdt > 1e-12, 1.0 / (sdt * sdt), 0.0)
        e_alpha = jnp.maximum(ec, 0.0) * inv_dt2
        t_alpha = jnp.maximum(vc, 0.0) * inv_dt2

        # v7 w-fill prologue: inverse masses are invariant across the whole
        # program (kernels only write xyz rows), so the streamed w tables
        # are materialized ONCE here, not per sweep.
        if has_edges:
            e_tabs = edge_sweep.fill_w(carry[0], e_tabs)
        if has_tets:
            t_tabs = tet_sweep.fill_w(carry[0], t_tabs)

        def one_step(c, _):
            def one_sub(c2, _):
                return substep(c2, sdt, e_alpha, t_alpha, cols_rt,
                               e_tabs, t_tabs, iso_t), None
            c, _ = jax.lax.scan(one_sub, c, None, length=ss)
            return c, None

        carry, _ = jax.lax.scan(one_step, carry, None, length=n)
        return carry

    def _run(tables, state, dt, n, ec, vc, cols_rt):
        e_tabs, t_tabs, perm_j, old2new_j, iso_t = tables
        carry = to_rows(state, perm_j)
        carry = _run_rows(carry, dt, n, ec, vc, cols_rt, e_tabs, t_tabs,
                          iso_t)
        return to_public(carry, state, old2new_j)

    _jit_run = jax.jit(_run, static_argnums=3, donate_argnums=1)

    # ---- carry API: the layout/lambda boundary paid once per RUN ---------
    # pack_state -> run_carry* -> unpack_state keeps the internal row/packed
    # layout (x8 rows, per-group lambda stripes) resident in HBM across an
    # arbitrary number of jitted calls -- the TPU analog of the reference's
    # zero-readback GPU mode (SoftBodySolver.cs:870-904 renders straight
    # from solver ComputeBuffers).  carry_positions exposes the committed
    # positions without the full (lambda-unpacking) boundary.

    def _pack(tables, state):
        return to_rows(state, tables[2])

    def _run_c(tables, carry, dt, n, ec, vc, cols_rt):
        return _run_rows(carry, dt, n, ec, vc, cols_rt,
                         tables[0], tables[1], tables[4])

    def _unpack(tables, carry, state):
        return to_public(carry, state, tables[3])

    def _carry_x(tables, carry):
        return carry[1].T[tables[3]]

    _jit_pack = jax.jit(_pack)
    _jit_run_c = jax.jit(_run_c, static_argnums=3, donate_argnums=1)
    _jit_unpack = jax.jit(_unpack)
    _jit_carry_x = jax.jit(_carry_x)

    def pack_state(state: SimState):
        """Public state -> internal carry.  Does NOT donate: the caller
        keeps the state object as the template for unpack_state."""
        return _jit_pack(tables, state)

    def run_carry(carry, dt, n: int, edge_compliance=None,
                  volume_compliance=None,
                  colliders_rt: Optional[Colliders] = None):
        """n steps on the internal carry (donated); no boundary cost."""
        ec, vc = _resolve(edge_compliance, volume_compliance, colliders_rt)
        return _jit_run_c(tables, carry, dt, int(n), ec, vc, colliders_rt)

    def unpack_state(carry, state: SimState) -> SimState:
        """Carry -> public state.  Does NOT donate the carry: ``state``
        supplies inv_mass (and lambda placeholders for absent families);
        stepping can continue from the same carry afterwards."""
        return _jit_unpack(tables, carry, state)

    def carry_positions(carry):
        """Committed positions (V,3) straight off the carry (row gather
        only -- skips the lambda unpack)."""
        return _jit_carry_x(tables, carry)[:V]

    def _resolve(edge_compliance, volume_compliance, colliders_rt):
        if colliders_rt is not None and colliders is None:
            raise ValueError(
                "runtime colliders require a make-time collider template")
        # with per-constraint tables the scalars SCALE the tables
        ec = _f32((1.0 if edge_c is not None else params.edge_compliance)
                  if edge_compliance is None else edge_compliance)
        vc = _f32((1.0 if tet_c is not None else params.volume_compliance)
                  if volume_compliance is None else volume_compliance)
        return ec, vc

    def step(state: SimState, dt, edge_compliance=None,
             volume_compliance=None,
             colliders_rt: Optional[Colliders] = None) -> SimState:
        ec, vc = _resolve(edge_compliance, volume_compliance, colliders_rt)
        return _jit_run(tables, state, dt, 1, ec, vc, colliders_rt)

    def step_n(state: SimState, dt, n: int, edge_compliance=None,
               volume_compliance=None,
               colliders_rt: Optional[Colliders] = None) -> SimState:
        ec, vc = _resolve(edge_compliance, volume_compliance, colliders_rt)
        return _jit_run(tables, state, dt, int(n), ec, vc, colliders_rt)

    step.step_n = step_n
    step.prejit = True
    step_n.prejit = True
    step.pack_state = pack_state
    step.run_carry = run_carry
    step.unpack_state = unpack_state
    step.carry_positions = carry_positions
    # the packed plans define the block-synchronous constraint ordering the
    # oracle must replay (perm + per-lane dlambda scale)
    step.block_order = {
        "edges": e_plan if has_edges else None,
        "tets": t_plan if has_tets else None,
    }
    # the in-block solve scheme the oracle replay must mirror
    # (tests/oracle.py::step_blocks scheme/omega/local_iters kwargs);
    # scheme/omega/local_iters are (edge, tet) pairs
    step.block_scheme = {
        "scheme": (e_sch, t_sch), "omega": (e_om, t_om),
        "local_iters": (e_k, t_k),
    }
    return step
