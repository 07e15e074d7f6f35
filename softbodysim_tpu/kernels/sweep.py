"""Pallas TPU constraint-sweep kernels -- the PBDServer hot loop, on-chip.

This is the TPU-native replacement for the reference's two hot constraint
sweeps (C++ Gauss-Seidel: CProgram/src/Sim.cpp:100-173; HLSL Jacobi twins
K_EdgeGather / K_VolumeGather: Assets/Shaders/SoftBodyCompute.compute:230-370).
The XLA formulation of those sweeps bottoms out at a flat ~3.2 ns per gathered
row (measured, PLAN.md); these kernels keep the particle table resident in
VMEM and replace every gather/scatter with 128-lane VPU shuffles.

Design (measured on TPU v5e, see PLAN.md round-2 tables):

* Particle state lives in VMEM for the whole sweep as an (8, Vpad) f32 table,
  lane-major: sublanes 0-2 = xyz of x*, sublane 3 = inverse mass.  103k
  particles = 3.3 MB, well under the ~16 MB VMEM budget.
* Constraints are packed host-side (``pack_constraints``) into 128-lane
  *blocks*.  Each block touches at most S (default 4) distinct 128-vertex
  windows ("slots").  All per-block data (relative lane indices, inverse
  scatter maps, rest values, lambdas) streams through the grid pipeline.
* Gather: per role, the endpoint index is stored as slot*128+lane; the kernel
  does one ``take_along_axis`` lane-shuffle per slot and masks.  Measured
  ~2-3 ns per (role, slot) visit -- vs 3.2 ns *per row* for XLA gathers.
* Scatter: corrections for all roles are assembled into 8-sublane tiles and
  written back with ONE read-modify-write per slot, using precomputed inverse
  lane maps.  Within-block duplicate vertices are handled by static "layers"
  (a vertex hit k times gets k inverse-map entries, summed in-register) --
  this is what frees the packing from global graph coloring.
* Ordering semantics: blocks execute sequentially (grid steps on one core),
  so updates propagate between blocks exactly like Gauss-Seidel; within a
  block all constraints read the same pre-block state and their corrections
  sum (Jacobi).  This "block-synchronous" hybrid sits between the reference's
  two dialects (C++ serial GS, Unity per-particle Jacobi) and is bitwise
  deterministic; tests/oracle.py::xpbd_block_reference replays it exactly.

The kernels are fp32 end-to-end with the reference's guard constants
(Sim.cpp:101,114,157).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBBLOCKS = 8          # constraint blocks processed per grid step
# scoped-VMEM budget for the sweep kernels (see _make_sweep_grouped);
# overridable for smaller parts / experiments
VMEM_LIMIT_BYTES = int(os.environ.get("SOFTBODYSIM_VMEM_LIMIT_MB",
                                      "100")) * 2**20

# Bump on ANY change to packing/ordering outputs (pack_constraints,
# pack_superblocks, _pack_order, regroup_plan, order_vertices,
# aligned_order, or the seg-plan builder in solver/xpbd_pallas.py): it
# invalidates the persistent packed-plan cache (io/plan_store.py).
PACK_VERSION = 1


# --------------------------------------------------------------------------
# Host-side packing
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SweepPlan:
    """Static packed-block schedule for one constraint family.

    Arrays are laid out for direct streaming through the Pallas grid:

    slots : (NBLK, 8) int32   -- cols 0..S-1: window ids; col S: used count
    rel   : (NBLK*arity, LANES) int32 -- per role, slot*128 + lane_in_window
    inv   : (NBLK*S*dmax, LANES) int32 -- per (slot, layer): lane -> source
            (role*128 + block_lane), or -1
    rest  : (NBLK, LANES) f32 -- rest length / signed rest volume, 1.0 pad
    perm  : (NBLK*LANES,) int64 -- packed lane -> original constraint id (-1 pad)
    pos_of: (N,) int64 -- original constraint id -> packed lane
    """

    arity: int
    num_blocks: int
    nslots: int
    dmax: int
    slots: np.ndarray
    rel: np.ndarray
    inv: np.ndarray
    rest: np.ndarray
    perm: np.ndarray
    pos_of: np.ndarray
    scale: np.ndarray   # (rows, LANES) f32 per-lane dlambda under-relaxation

    @property
    def capacity(self) -> int:
        return self.num_blocks * LANES


def _pack_order(win: np.ndarray, mode: int = 1) -> np.ndarray:
    """Greedy-scan order for the packers.

    mode 0: stable lexicographic by per-role window tuple (the round-2
    order; strong on structured meshes whose roles form pre-sorted bands).
    mode 1: (min window, max window) ascending -- sorting by per-role
    windows interleaves constraints whose window SETS differ even when
    their vertex ranges overlap, so the slot pool exhausts early; the
    range order keeps the pool a slowly-sliding band.  Measured on the
    merged BatchTest mesh (slot-limited fill, layers unbounded): edges
    S=8 0.80 -> 0.99, tets S=8 0.43 -> 0.88.

    Neither dominates (mode 0 wins on tet_cube, mode 1 on the reference
    Delaunay assets): pack_best packs under both and keeps the cheaper
    plan by op-count model.
    """
    if mode == 0:
        return np.lexsort(tuple(win[:, r]
                                for r in reversed(range(win.shape[1]))))
    wmin = win.min(axis=1)
    wmax = win.max(axis=1)
    return np.lexsort((wmax, wmin))


def pack_constraints(cons: np.ndarray, rest: np.ndarray, num_windows: int,
                     *, slots_cap: int = 4, layer_cap: int = 3,
                     order_mode: int = 1) -> SweepPlan:
    """Pack constraints into 128-lane blocks with bounded window slots.

    Greedy multi-pass: constraints sorted by window tuple fill blocks in
    order; one that would exceed the slot budget, the lane budget, or the
    per-vertex layer budget spills to the next pass.  O(N * passes).
    """
    cons = np.asarray(cons, np.int64)
    n, arity = cons.shape
    win = cons // LANES

    order = _pack_order(win, order_mode)
    remaining = list(order)

    blocks = []     # list of (slot_list, [constraint ids])

    while remaining:
        spill = []
        cur_slots: list = []
        cur_ids: list = []
        cur_counts: dict = {}
        streak = 0          # consecutive rejects: close stalled blocks

        def close():
            nonlocal cur_slots, cur_ids, cur_counts, streak
            if cur_ids:
                blocks.append((cur_slots, cur_ids))
            cur_slots, cur_ids, cur_counts = [], [], {}
            streak = 0

        for i in remaining:
            ws = dict.fromkeys(win[i])
            new_slots = [w for w in ws if w not in cur_slots]
            if (len(cur_ids) >= LANES
                    or len(cur_slots) + len(new_slots) > slots_cap):
                # Full blocks close immediately; slot-starved blocks close
                # once enough consecutive items bounced (otherwise a single
                # 4-window block would reject the entire rest of the pass,
                # degenerating to O(N) passes).
                if len(cur_ids) >= LANES or streak >= 64:
                    close()
                    new_slots = list(ws)
                else:
                    spill.append(i)
                    streak += 1
                    continue
            if any(cur_counts.get(v, 0) >= layer_cap for v in cons[i]):
                spill.append(i)
                streak += 1
                continue
            cur_slots.extend(new_slots)
            cur_ids.append(i)
            streak = 0
            for v in cons[i]:
                cur_counts[v] = cur_counts.get(v, 0) + 1
        close()
        remaining = spill

    nblk = -(-max(len(blocks), 1) // SUBBLOCKS) * SUBBLOCKS
    s_cap = slots_cap
    dmax = 1

    slots = np.zeros((nblk, 8), np.int32)
    rel = np.zeros((nblk, arity, LANES), np.int32)
    rest_p = np.ones((nblk, LANES), np.float32)
    perm = np.full((nblk * LANES,), -1, np.int64)
    scale = np.ones((nblk, LANES), np.float32)

    inv_entries = np.full((nblk, s_cap, layer_cap, LANES), -1, np.int32)

    for b, (slot_list, ids) in enumerate(blocks):
        slot_list = list(slot_list)
        for t, w in enumerate(slot_list):
            slots[b, t] = w
        for t in range(len(slot_list), s_cap):
            slots[b, t] = slot_list[0] if slot_list else 0
        slots[b, s_cap] = len(slot_list)

        lane_layers: dict = {}
        for j, i in enumerate(ids):
            perm[b * LANES + j] = i
            rest_p[b, j] = rest[i]
            for r in range(arity):
                v = int(cons[i, r])
                t = slot_list.index(v // LANES)
                l_in = v % LANES
                rel[b, r, j] = t * LANES + l_in
                layer = lane_layers.get((t, l_in), 0)
                lane_layers[(t, l_in)] = layer + 1
                dmax = max(dmax, layer + 1)
                inv_entries[b, t, layer, l_in] = r * LANES + j
        # dlambda under-relaxation: a constraint whose vertex receives m
        # summed corrections this block applies (and accumulates) dlambda/m
        # -- the reference's cnt-averaged Jacobi apply
        # (SoftBodySolver.cs:521-527), kept XPBD-consistent.  m==1 (the
        # common case) leaves pure block-GS behavior untouched.
        for j, i in enumerate(ids):
            m = 1
            for r in range(arity):
                v = int(cons[i, r])
                m = max(m, lane_layers[(slot_list.index(v // LANES),
                                        v % LANES)])
            scale[b, j] = np.float32(1.0) / np.float32(m)

    inv = inv_entries[:, :, :dmax, :].reshape(nblk * s_cap * dmax, LANES)
    inv = np.ascontiguousarray(inv)

    pos_of = np.full((n,), -1, np.int64)
    valid = perm >= 0
    pos_of[perm[valid]] = np.flatnonzero(valid)

    return _trim_plan(SweepPlan(
        arity=arity, num_blocks=nblk, nslots=s_cap, dmax=dmax,
        slots=slots, rel=rel.reshape(nblk * arity, LANES), inv=inv,
        rest=rest_p, perm=perm, pos_of=pos_of, scale=scale,
    ))


@dataclasses.dataclass(frozen=True)
class SuperPlan:
    """Packed schedule at super-block granularity: 1024 constraints (8
    sublanes x 128 lanes) per block, sharing one window-slot pool.

    Every VPU op in the kernel then processes 1024 constraints (sublane =
    sub-block), vs 128 for SweepPlan -- measured ~2.5-3x fewer ops/constraint.
    Within a super-block all constraints read pre-block state and their
    corrections sum (cross-sublane duplicates via an in-register sublane
    reduction, same-sublane duplicates via static scatter layers).

    slots : (NSUP, 128) int32 -- cols 0..S-1 windows, col S used count
    rel   : (NSUP*arity*8, 128) int32 -- per (block, role) an (8,128) tile,
            value slot*128+lane, tile position (sublane, lane) = constraint
    inv   : (NSUP*S*dmax*8, 128) int32 -- per (block, slot, layer) an (8,128)
            tile: [sublane g, window-lane l] = role*128 + source lane, or -1
    rest,lam layout: (NSUP*8, 128)
    perm  : (NSUP*8*128,) packed position -> constraint id (-1 pad)
    """

    arity: int
    num_super: int
    nslots: int
    dmax: int
    slots: np.ndarray
    rel: np.ndarray
    inv: np.ndarray
    rest: np.ndarray
    perm: np.ndarray
    pos_of: np.ndarray
    scale: np.ndarray   # (NSUP*8, LANES) f32 per-lane dlambda under-relaxation
    # Optional execution grouping (regroup_plan): contiguous block runs that
    # a kernel can execute with smaller slot/layer caps than the plan-wide
    # (nslots, dmax).  Tuple of (num_blocks, S_g, D_g) in block order; None
    # means one full-config kernel over all blocks.
    groups: Optional[Tuple[Tuple[int, int, int], ...]] = None

    @property
    def capacity(self) -> int:
        return self.num_super * 8 * LANES


def _trim_plan(plan):
    """Drop trailing all-empty blocks below one kernel grid step.

    Both packers pad the block count to a SUBBLOCKS multiple, but a mesh
    that needs fewer than SUBBLOCKS blocks then runs (and compiles) up to
    8x dead work: the kernel body unrolls every sub-block of the group.
    When the used block count is under SUBBLOCKS, slice the plan down and
    let the kernel group exactly that many (interpret-mode compile of the
    test meshes drops ~8x; small real scenes shed the same padding).
    Above SUBBLOCKS the multiple-of-8 padding is kept (gb=8 must divide)."""
    is_super = isinstance(plan, SuperPlan)
    nb = plan.num_super if is_super else plan.num_blocks
    rows = 8 * LANES if is_super else LANES
    used_mask = (plan.perm.reshape(nb, rows) >= 0).any(axis=1)
    used = max(1, int(np.flatnonzero(used_mask).max()) + 1
               if used_mask.any() else 1)
    if used >= SUBBLOCKS or used == nb:
        return plan
    S, dmax, arity = plan.nslots, plan.dmax, plan.arity
    sub = 8 if is_super else 1
    kw = dict(
        arity=arity, nslots=S, dmax=dmax,
        slots=plan.slots[:used],
        rel=plan.rel[: used * arity * sub],
        inv=plan.inv[: used * S * dmax * sub],
        rest=plan.rest[: used * sub],
        scale=plan.scale[: used * sub],
        perm=plan.perm[: used * rows],
        pos_of=plan.pos_of,
    )
    if is_super:
        return SuperPlan(num_super=used, **kw)
    return SweepPlan(num_blocks=used, **kw)


def pack_superblocks(cons: np.ndarray, rest: np.ndarray, num_windows: int,
                     *, slots_cap: int = 8, layer_cap: int = 2,
                     use_native: bool = True,
                     order_mode: int = 1) -> SuperPlan:
    """Pack constraints into 1024-lane super-blocks (see SuperPlan).

    The greedy packer runs in native C++ when the softtopo library is
    available (native/softtopo.cpp::st_pack_super, ~20x the Python loop at
    100k constraints; bit-identical plans) with this Python implementation
    as the fallback and the reference semantics."""
    cons = np.asarray(cons, np.int64)
    n, arity = cons.shape

    if use_native:
        from ..core.native import native_pack_super

        packed = native_pack_super(cons, slots_cap, layer_cap, order_mode)
        if packed is not None:
            nsup, dmax, slots, rel, inv, perm, scale = packed
            rest_p = np.ones((nsup * 8, LANES), np.float32)
            valid = perm >= 0
            rest_p.reshape(-1)[valid] = np.asarray(rest, np.float32)[
                perm[valid]]
            pos_of = np.full((n,), -1, np.int64)
            pos_of[perm[valid]] = np.flatnonzero(valid)
            return _trim_plan(SuperPlan(
                arity=arity, num_super=nsup, nslots=slots_cap, dmax=dmax,
                slots=slots, rel=rel, inv=inv, rest=rest_p, perm=perm,
                pos_of=pos_of, scale=scale))

    win = cons // LANES

    order = _pack_order(win, order_mode)
    remaining = list(order)

    blocks = []   # (slot_list, lanes) where lanes = list of 8 lists of ids

    while remaining:
        spill = []
        cur_slots: list = []
        lanes = [[] for _ in range(8)]
        counts: dict = {}         # (sublane, vertex) -> multiplicity
        cur_n = 0
        streak = 0

        def close():
            nonlocal cur_slots, lanes, counts, cur_n, streak
            if cur_n:
                blocks.append((cur_slots, lanes))
            cur_slots = []
            lanes = [[] for _ in range(8)]
            counts = {}
            cur_n = 0
            streak = 0

        for i in remaining:
            ws = dict.fromkeys(win[i])
            new_slots = [w for w in ws if w not in cur_slots]
            if (cur_n >= 8 * LANES
                    or len(cur_slots) + len(new_slots) > slots_cap):
                if cur_n >= 8 * LANES or streak >= 256:
                    close()
                    new_slots = list(ws)
                else:
                    spill.append(i)
                    streak += 1
                    continue
            # pick the sublane with a free lane where this constraint's
            # vertices have the lowest multiplicity
            best_g, best_m = -1, layer_cap
            for off in range(8):
                g = (cur_n + off) % 8
                if len(lanes[g]) >= LANES:
                    continue
                m = max(counts.get((g, v), 0) for v in cons[i])
                if m < best_m:
                    best_g, best_m = g, m
                    if m == 0:
                        break
            if best_g < 0:
                spill.append(i)
                streak += 1
                continue
            cur_slots.extend(new_slots)
            lanes[best_g].append(i)
            cur_n += 1
            streak = 0
            for v in cons[i]:
                counts[(best_g, v)] = counts.get((best_g, v), 0) + 1
        close()
        remaining = spill

    nsup = -(-max(len(blocks), 1) // SUBBLOCKS) * SUBBLOCKS
    s_cap = slots_cap
    dmax = 1

    slots = np.zeros((nsup, LANES), np.int32)
    rel = np.zeros((nsup, arity, 8, LANES), np.int32)
    rest_p = np.ones((nsup, 8, LANES), np.float32)
    perm = np.full((nsup * 8 * LANES,), -1, np.int64)
    scale = np.ones((nsup, 8, LANES), np.float32)
    inv_entries = np.full((nsup, s_cap, layer_cap, 8, LANES), -1, np.int32)

    for b, (slot_list, lanes) in enumerate(blocks):
        slot_list = list(slot_list)
        for t, w in enumerate(slot_list):
            slots[b, t] = w
        for t in range(len(slot_list), s_cap):
            slots[b, t] = slot_list[0] if slot_list else 0
        slots[b, s_cap] = len(slot_list)

        lane_layers: dict = {}
        totals: dict = {}          # cross-sublane multiplicity per vertex
        for g in range(8):
            for j, i in enumerate(lanes[g]):
                perm[(b * 8 + g) * LANES + j] = i
                rest_p[b, g, j] = rest[i]
                for r in range(arity):
                    v = int(cons[i, r])
                    t = slot_list.index(v // LANES)
                    l_in = v % LANES
                    rel[b, r, g, j] = t * LANES + l_in
                    layer = lane_layers.get((g, t, l_in), 0)
                    lane_layers[(g, t, l_in)] = layer + 1
                    dmax = max(dmax, layer + 1)
                    inv_entries[b, t, layer, g, l_in] = r * LANES + j
                    totals[v] = totals.get(v, 0) + 1
        # cnt-averaged Jacobi apply (see pack_constraints): each constraint
        # scales dlambda by 1 / (max summed corrections over its vertices)
        for g in range(8):
            for j, i in enumerate(lanes[g]):
                m = max(totals[int(cons[i, r])] for r in range(arity))
                scale[b, g, j] = np.float32(1.0) / np.float32(m)

    inv = np.ascontiguousarray(
        inv_entries[:, :, :dmax].reshape(nsup * s_cap * dmax * 8, LANES))

    pos_of = np.full((n,), -1, np.int64)
    valid = perm >= 0
    pos_of[perm[valid]] = np.flatnonzero(valid)

    return _trim_plan(SuperPlan(
        arity=arity, num_super=nsup, nslots=s_cap, dmax=dmax,
        slots=slots, rel=rel.reshape(nsup * arity * 8, LANES), inv=inv,
        rest=rest_p.reshape(nsup * 8, LANES), perm=perm, pos_of=pos_of,
        scale=scale.reshape(nsup * 8, LANES),
    ))


def regroup_plan(plan, *, max_groups: int = 3,
                 min_blocks: int = 4 * SUBBLOCKS):
    """Reorder super-blocks into trimmed execution groups.

    The branchless kernels pay full (nslots x dmax) work for every block,
    but most blocks need less (measured on the north-star mesh: 85% of edge
    blocks use <=6 of 8 slots, 13% of tet blocks need 1 of 3 layers).  Per-
    block trimming can't be dynamic (one unrolled kernel body serves every
    grid step, and a pl.when branch costs ~50 ns -- PLAN.md), but it CAN be
    static: sort blocks by their required (slots, layers), partition into
    <=max_groups contiguous runs, and let make_sweep build one kernel per
    run with that run's caps.  Per-kernel launch overhead inside a jitted
    program measured ~0 (job 028), so the grouping is ~free.

    Returns a new SuperPlan with permuted block order and ``groups``
    metadata, or the plan unchanged when grouping wouldn't pay (small
    plans, uniform occupancy).  Block-synchronous semantics are preserved:
    the kernels execute the permuted plan's block order sequentially, and
    ``perm``/``pos_of``/``scale`` are permuted with the blocks, so oracle
    replays (tests/oracle.py::step_blocks) follow automatically.

    Not applied to the sharded per-device plans (xpbd_pallas_sharded):
    SPMD requires identical table shapes on every device.
    """
    if not isinstance(plan, SuperPlan) or plan.groups is not None:
        return plan
    nb, S, D, a = plan.num_super, plan.nslots, plan.dmax, plan.arity
    if nb < min_blocks:
        return plan

    occ = plan.inv.reshape(nb, S, D, 8, LANES) >= 0
    lay = occ.any(axis=(1, 3, 4))                      # (nb, D)
    d_used = np.where(lay.any(axis=1),
                      D - np.argmax(lay[:, ::-1], axis=1), 1).astype(np.int64)
    slt = occ.any(axis=(2, 3, 4))                      # (nb, S)
    s_occ = np.where(slt.any(axis=1),
                     S - np.argmax(slt[:, ::-1], axis=1), 1)
    # the packer also records the used-slot count; gather validity needs
    # S_g to cover every slot referenced by rel, which is exactly this
    s_cnt = plan.slots[:, S].astype(np.int64)
    s_used = np.maximum(np.maximum(s_occ, s_cnt), 1)
    d_used = np.maximum(d_used, 1)

    def cost(s, d):                    # pack_best's per-block op model
        return 12 * a * s + 15 * s * d + 80

    catch = (int(s_used.max()), int(d_used.max()))
    corners = sorted({(int(s), int(d)) for s, d in zip(s_used, d_used)}
                     | {catch})
    if len(corners) == 1:
        return plan
    # cost of each block under each corner (inf where the corner doesn't
    # dominate the block's needs)
    cs = np.array([c[0] for c in corners])
    cd = np.array([c[1] for c in corners])
    dom = (cs[None, :] >= s_used[:, None]) & (cd[None, :] >= d_used[:, None])
    cmat = np.where(dom, np.array([cost(s, d) for s, d in corners])[None, :],
                    np.inf)

    # pick <=max_groups corners (catch-all always in) minimizing total cost
    import itertools
    ci_catch = corners.index(catch)
    others = [i for i in range(len(corners)) if i != ci_catch]
    best_cost, best_set = cmat[:, ci_catch].sum(), (ci_catch,)
    for r in range(1, max_groups):
        for combo in itertools.combinations(others, r):
            sel = (ci_catch,) + combo
            tot = cmat[:, sel].min(axis=1).sum()
            if tot < best_cost - 1e-9:
                best_cost, best_set = tot, sel
    if len(best_set) == 1:
        return plan
    # require a real win (>2%) over the single full-config kernel
    if best_cost > 0.98 * nb * cost(S, D):
        return plan

    sel = list(best_set)
    assign = np.array(sel)[np.argmin(cmat[:, sel], axis=1)]   # corner index
    # group order: catch-all first, the rest by descending config cost
    gorder = sorted(set(assign.tolist()) | {ci_catch},
                    key=lambda ci: (ci != ci_catch,
                                    -cost(*corners[ci]), corners[ci]))
    members = {ci: list(np.flatnonzero(assign == ci)) for ci in gorder}
    # round non-catch-all groups down to SUBBLOCKS multiples; remainders go
    # to the catch-all config (which dominates everything)
    for ci in gorder:
        if ci == ci_catch:
            continue
        r = len(members[ci]) % SUBBLOCKS
        if r:
            members[ci_catch].extend(members[ci][-r:])
            del members[ci][-r:]
    gorder = [ci for ci in gorder if members[ci]]
    if len(gorder) == 1:
        return plan
    members[ci_catch].sort()

    order = np.concatenate([np.asarray(members[ci], np.int64)
                            for ci in gorder])
    groups = tuple((len(members[ci]),) + corners[ci] for ci in gorder)

    from ..core import native as _native

    def pb(arr):                       # permute block-major rows
        blk = np.ascontiguousarray(arr).reshape(nb, -1)
        out = _native.native_permute_blocks(blk, order)
        if out is None:                # numpy fallback, bit-identical
            out = blk[order]
        return np.ascontiguousarray(out.reshape(arr.shape))

    perm = pb(plan.perm).reshape(-1)
    pos_of = np.full_like(plan.pos_of, -1)
    valid = perm >= 0
    pos_of[perm[valid]] = np.flatnonzero(valid)

    return dataclasses.replace(
        plan,
        slots=pb(plan.slots),
        rel=pb(plan.rel),
        inv=pb(plan.inv),
        rest=pb(plan.rest),
        scale=pb(plan.scale),
        perm=perm, pos_of=pos_of, groups=groups)


def rcm_order(num_vertices: int, edges: np.ndarray) -> np.ndarray:
    """Reverse Cuthill-McKee permutation (new slot -> old id) from the edge
    graph.  Bandwidth-minimizing orders beat Morton codes for packing
    unstructured (Delaunay-style) tet meshes: after RCM an edge spans
    O(bandwidth/128) windows, so super-blocks fill from a narrow sliding
    window band (measured: the reference's BatchTest assets pack at 0.03
    fill under Morton vs ~0.5+ under RCM)."""
    if len(edges) == 0:
        return np.arange(num_vertices, dtype=np.int64)
    e = np.asarray(edges, np.int64)
    try:
        from scipy.sparse import coo_matrix
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        m = coo_matrix(
            (np.ones(len(e) * 2, np.float32),
             (np.concatenate([e[:, 0], e[:, 1]]),
              np.concatenate([e[:, 1], e[:, 0]]))),
            shape=(num_vertices, num_vertices)).tocsr()
        return reverse_cuthill_mckee(m).astype(np.int64)
    except ImportError:  # pragma: no cover - scipy is normally present
        pass
    src = np.concatenate([e[:, 0], e[:, 1]])
    dst = np.concatenate([e[:, 1], e[:, 0]])
    order_ = np.argsort(src, kind="stable")
    src, dst = src[order_], dst[order_]
    indptr = np.zeros(num_vertices + 1, np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)
    degree = np.diff(indptr)

    visited = np.zeros(num_vertices, bool)
    out = np.empty(num_vertices, np.int64)
    pos = 0
    # component seeds in ascending degree (classic CM heuristic)
    seeds = np.argsort(degree, kind="stable")
    si = 0
    while pos < num_vertices:
        while si < len(seeds) and visited[seeds[si]]:
            si += 1
        root = seeds[si]
        visited[root] = True
        frontier = np.array([root], np.int64)
        out[pos] = root
        pos += 1
        while len(frontier):
            # gather all unvisited neighbors of the frontier, sorted by
            # (parent order, degree) -- vectorized level-BFS
            counts = indptr[frontier + 1] - indptr[frontier]
            starts = indptr[frontier]
            idx = np.repeat(starts - np.cumsum(counts) + counts,
                            counts) + np.arange(counts.sum())
            nbrs = dst[idx]
            parent_rank = np.repeat(np.arange(len(frontier)), counts)
            keep = ~visited[nbrs]
            nbrs, parent_rank = nbrs[keep], parent_rank[keep]
            if len(nbrs) == 0:
                break
            key = np.lexsort((degree[nbrs], parent_rank))
            nbrs = nbrs[key]
            _, first_idx = np.unique(nbrs, return_index=True)
            level = nbrs[np.sort(first_idx)]  # dedup keeping key order
            visited[level] = True
            out[pos:pos + len(level)] = level
            pos += len(level)
            frontier = level
    return out[::-1].copy()           # the *reverse* in RCM


def aligned_order(num_vertices: int, edges: np.ndarray,
                  group_target: int = 2048):
    """Group-aligned layout for disconnected (multi-body/fragmented)
    meshes.

    Connected components are greedily grouped (in first-vertex order) into
    ~group_target-vertex groups; each group is RCM-ordered onto its OWN
    128-aligned span of the particle table, dead sentinel slots padding
    the gaps.  Without alignment, packing blocks straddle group boundaries
    whose windows share nothing, so the slot pool spills.  Measured on the
    merged BatchTest scene (20 reference bodies, internally fragmented to
    5990 components): edge fill 0.599 -> 0.670, tet 0.610 -> 0.719 at
    ~1% dead slots; per-component alignment (no grouping) would waste 10x
    the table, and true per-BODY groups pack worse than the greedy cut.

    Returns (perm_layout, old2new): perm_layout[slot] is the old vertex id
    or ``num_vertices`` for dead slots (gather from a zero/pinned sentinel
    row); old2new[old] is the layout slot.  Returns None for connected
    meshes (plain orderings apply).
    """
    e = np.asarray(edges, np.int64)
    if len(e) == 0:
        return None
    try:
        from scipy.sparse import coo_matrix
        from scipy.sparse.csgraph import (connected_components,
                                          reverse_cuthill_mckee)
    except ImportError:  # pragma: no cover - scipy is normally present
        return None
    A = coo_matrix(
        (np.ones(len(e) * 2, np.float32),
         (np.concatenate([e[:, 0], e[:, 1]]),
          np.concatenate([e[:, 1], e[:, 0]]))),
        shape=(num_vertices, num_vertices)).tocsr()
    ncomp, labels = connected_components(A, directed=False)
    if ncomp <= 1:
        return None
    comps = [np.flatnonzero(labels == c) for c in range(ncomp)]
    comps.sort(key=lambda v: int(v.min()))    # body order from merging

    groups, cur, n = [], [], 0
    for vs in comps:
        cur.append(vs)
        n += len(vs)
        if n >= group_target:
            groups.append(np.concatenate(cur))
            cur, n = [], 0
    if cur:
        groups.append(np.concatenate(cur))

    slots = []
    for group in groups:
        sub = A[group][:, group]
        local = reverse_cuthill_mckee(sub).astype(np.int64)
        slots.append(group[local])
        pad = -len(group) % LANES
        if pad:
            slots.append(np.full(pad, num_vertices, np.int64))
    perm_layout = np.concatenate(slots)
    old2new = np.empty(num_vertices, np.int64)
    live = perm_layout < num_vertices
    old2new[perm_layout[live]] = np.flatnonzero(live)
    return perm_layout, old2new


def order_vertices(vertices: np.ndarray, edges: np.ndarray,
                   tets: np.ndarray, mode: str = "auto") -> np.ndarray:
    """Choose a vertex permutation (new <- old) minimizing window spread.

    "natural" keeps the input order; "morton" sorts by 3D Morton code of the
    rest positions; "rcm" is reverse Cuthill-McKee on the edge graph (best
    for unstructured meshes); "auto" evaluates all with a cheap slot-visit
    estimate and picks the best.
    """
    v = np.asarray(vertices, np.float64)

    def morton(p):
        lo = p.min(0)
        ext = np.maximum(p.max(0) - lo, 1e-9)
        q = ((p - lo) / ext * 1023.0).astype(np.uint32)

        def spread(x):
            x = x.astype(np.uint64)
            x = (x | (x << 16)) & 0x030000FF
            x = (x | (x << 8)) & 0x0300F00F
            x = (x | (x << 4)) & 0x030C30C3
            x = (x | (x << 2)) & 0x09249249
            return x

        return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)

    if mode == "natural":
        return np.arange(len(v), dtype=np.int64)
    if mode == "rcm":
        return rcm_order(len(v), edges if edges is not None else
                         np.zeros((0, 2), np.int64))
    mor = np.argsort(morton(v), kind="stable").astype(np.int64)
    if mode == "morton":
        return mor

    def visits(perm):
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm))
        total = 0
        for cons in (edges, tets):
            if cons is None or len(cons) == 0:
                continue
            w = inv[np.asarray(cons, np.int64)] // LANES
            # single packed-key argsort == the lexsort (windows < 2^15 up
            # to ~4M particles; fall back to lexsort beyond) -- the sort
            # dominated auto-order time at megascale
            if w.max(initial=0) < (1 << 15) and w.shape[1] <= 4:
                key = np.zeros(len(w), np.uint64)
                for r in range(w.shape[1]):
                    key = (key << np.uint64(15)) | w[:, r].astype(np.uint64)
                so = np.argsort(key, kind="stable")
            else:
                so = np.lexsort(
                    tuple(w[:, r] for r in reversed(range(w.shape[1]))))
            w = w[so]
            nb = -(-len(w) // LANES)
            pad = nb * LANES - len(w)
            if pad:
                w = np.concatenate([w, np.repeat(w[-1:], pad, 0)], 0)
            blk = np.sort(w.reshape(nb, LANES, -1), axis=1)
            total += int((blk[:, 1:] != blk[:, :-1]).sum()) + nb * blk.shape[2]
        return total

    nat = np.arange(len(v), dtype=np.int64)
    cands = [nat, mor]
    if edges is not None and len(edges):
        cands.append(rcm_order(len(v), edges))
    scores = [visits(p) for p in cands]
    return cands[int(np.argmin(scores))]


# --------------------------------------------------------------------------
# Kernels
# --------------------------------------------------------------------------

def _gather_role(xout_ref, wins, rel_row, nslots):
    """Gather one role's (8, LANES) particle rows via per-slot lane shuffles."""
    rel8 = jnp.broadcast_to(rel_row, (8, LANES))
    acc = jnp.zeros((8, LANES), jnp.float32)
    for t in range(nslots):
        xw = xout_ref[:, pl.ds(wins[t] * LANES, LANES)]
        relt = rel8 - t * LANES
        valid = (relt >= 0) & (relt < LANES)
        g = jnp.take_along_axis(xw, jnp.clip(relt, 0, LANES - 1), axis=1)
        acc = jnp.where(valid, g, acc)
    return acc


def _scatter_slot(xout_ref, w, adds3):
    """One read-modify-write of a 128-vertex window: xyz += adds3."""
    xw = xout_ref[:, pl.ds(w * LANES, LANES)]
    new = jnp.concatenate([xw[0:3] + adds3, xw[3:8]], axis=0)
    xout_ref[:, pl.ds(w * LANES, LANES)] = new


def _edge_kernel(alpha_ref, slots_ref, rel_ref, inv_ref, rest_ref,
                 scale_ref, a_ref, lam_ref, xin_ref, xout_ref, lamout_ref,
                 *, S, DMAX, GB, PERA):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        xout_ref[:] = xin_ref[:]

    alpha = alpha_ref[0, 0]
    for g in range(GB):
        wins = [slots_ref[g, t] for t in range(S)]
        ns = slots_ref[g, S]

        a0 = _gather_role(xout_ref, wins, rel_ref[pl.ds(2 * g, 1), :], S)
        a1 = _gather_role(xout_ref, wins, rel_ref[pl.ds(2 * g + 1, 1), :], S)

        # XPBD distance projection (Sim.cpp:100-130)
        d = a0[0:3] - a1[0:3]
        length = jnp.sqrt(jnp.sum(d * d, axis=0, keepdims=True))
        w0 = a0[3:4]
        w1 = a1[3:4]
        wsum = w0 + w1
        valid = (wsum != 0.0) & (length >= 1e-12)
        c = length - rest_ref[g:g + 1, :]
        lam = lam_ref[g:g + 1, :]
        al = alpha * a_ref[g:g + 1, :] if PERA else alpha
        denom = wsum + al
        dlam = jnp.where(valid, (-c - al * lam)
                         / jnp.where(denom == 0.0, 1.0, denom), 0.0)
        dlam = dlam * scale_ref[g:g + 1, :]
        nrm = d / jnp.where(length < 1e-12, 1.0, length)
        corr = nrm * dlam
        lamout_ref[g:g + 1, :] = lam + dlam

        zero1 = jnp.zeros((1, LANES), jnp.float32)
        c8 = jnp.concatenate(
            [corr * w0, zero1, -corr * w1, zero1], axis=0)  # (8,128)

        for t in range(S):
            @pl.when(t < ns)
            def _(t=t):
                adds = jnp.zeros((3, LANES), jnp.float32)
                for l in range(DMAX):
                    row = g * S * DMAX + t * DMAX + l
                    idx = jnp.broadcast_to(
                        inv_ref[pl.ds(row, 1), :], (8, LANES))
                    has = idx >= 0
                    j = jnp.clip(idx, 0, 2 * LANES - 1)
                    role1 = j >= LANES
                    g8 = jnp.take_along_axis(c8, j & (LANES - 1), axis=1)
                    pick = jnp.where(role1[0:3], g8[4:7], g8[0:3])
                    adds = adds + jnp.where(has[0:3], pick, 0.0)
                _scatter_slot(xout_ref, wins[t], adds)


def _cross3(a, b):
    """Cross product on (3, LANES) component-row tiles."""
    return jnp.concatenate([
        a[1:2] * b[2:3] - a[2:3] * b[1:2],
        a[2:3] * b[0:1] - a[0:1] * b[2:3],
        a[0:1] * b[1:2] - a[1:2] * b[0:1],
    ], axis=0)


def _dot3(a, b):
    return jnp.sum(a * b, axis=0, keepdims=True)


def _tet_kernel(alpha_ref, slots_ref, rel_ref, inv_ref, rest_ref,
                scale_ref, a_ref, lam_ref, xin_ref, xout_ref, lamout_ref,
                *, S, DMAX, GB, PERA):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        xout_ref[:] = xin_ref[:]

    alpha = alpha_ref[0, 0]
    for g in range(GB):
        wins = [slots_ref[g, t] for t in range(S)]
        ns = slots_ref[g, S]

        acc = [_gather_role(xout_ref, wins, rel_ref[pl.ds(4 * g + r, 1), :], S)
               for r in range(4)]
        pa, pb, pc, pd = (a[0:3] for a in acc)
        wa, wb, wc, wd = (a[3:4] for a in acc)

        # XPBD volume projection, gradient form (Sim.cpp:132-173)
        sixth = jnp.float32(1.0 / 6.0)
        ga = _cross3(pd - pb, pc - pb) * sixth
        gb = _cross3(pc - pa, pd - pa) * sixth
        gc = _cross3(pd - pa, pb - pa) * sixth
        gd = _cross3(pb - pa, pc - pa) * sixth

        wsum = (wa * _dot3(ga, ga) + wb * _dot3(gb, gb)
                + wc * _dot3(gc, gc) + wd * _dot3(gd, gd))
        valid = ((wa + wb + wc + wd) != 0.0) & (wsum >= 1e-20)

        vol = _dot3(_cross3(pb - pa, pc - pa), pd - pa) * sixth
        cfn = vol - rest_ref[g:g + 1, :]
        lam = lam_ref[g:g + 1, :]
        al = alpha * a_ref[g:g + 1, :] if PERA else alpha
        denom = wsum + al
        dlam = jnp.where(valid, (-cfn - al * lam)
                         / jnp.where(denom == 0.0, 1.0, denom), 0.0)
        dlam = dlam * scale_ref[g:g + 1, :]
        lamout_ref[g:g + 1, :] = lam + dlam

        zero1 = jnp.zeros((1, LANES), jnp.float32)
        cab = jnp.concatenate(
            [ga * (wa * dlam), zero1, gb * (wb * dlam), zero1], axis=0)
        ccd = jnp.concatenate(
            [gc * (wc * dlam), zero1, gd * (wd * dlam), zero1], axis=0)

        for t in range(S):
            @pl.when(t < ns)
            def _(t=t):
                adds = jnp.zeros((3, LANES), jnp.float32)
                for l in range(DMAX):
                    row = g * S * DMAX + t * DMAX + l
                    idx = jnp.broadcast_to(
                        inv_ref[pl.ds(row, 1), :], (8, LANES))
                    has = idx >= 0
                    j = jnp.clip(idx, 0, 4 * LANES - 1)
                    hi = (j >= 2 * LANES)
                    half = (j & LANES) > 0
                    lane = j & (LANES - 1)
                    g_ab = jnp.take_along_axis(cab, lane, axis=1)
                    g_cd = jnp.take_along_axis(ccd, lane, axis=1)
                    g8 = jnp.where(hi, g_cd, g_ab)
                    pick = jnp.where(half[0:3], g8[4:7], g8[0:3])
                    adds = adds + jnp.where(has[0:3], pick, 0.0)
                _scatter_slot(xout_ref, wins[t], adds)


def _slot_sort(plan: "SuperPlan") -> "SuperPlan":
    """Reorder each super-block's slots descending by scatter-layer count.

    Pure build-time transform (the persistent plan cache stores unsorted
    plans; PACK_VERSION is unaffected): constraint order, perm, scale and
    pos_of are untouched -- only the slot POSITIONS within each block are
    permuted, with rel (slot bits) and inv (tile positions) rewritten to
    match.  After sorting, the per-position layer maxima over a kernel
    group form the tightest static ragged profile (PROF) the grouped
    kernels can unroll."""
    nb, S, D, a = plan.num_super, plan.nslots, plan.dmax, plan.arity
    inv5 = plan.inv.reshape(nb, S, D, 8, LANES)
    occ = inv5 >= 0
    lay = occ.any(axis=(3, 4))                          # (nb, S, D)
    d_bs = np.where(lay.any(axis=2),
                    D - np.argmax(lay[:, :, ::-1], axis=2), 0)
    used = plan.slots[:, S].astype(np.int64)
    # sort only within the used-slot prefix (padding slots stay behind:
    # gather validity needs every rel-referenced slot below the group cap)
    key = np.where(np.arange(S)[None, :] < used[:, None], -d_bs, 1000)
    order = np.argsort(key, axis=1, kind="stable")      # new pos -> old pos
    newpos = np.argsort(order, axis=1)                  # old pos -> new pos
    if np.array_equal(order, np.broadcast_to(np.arange(S), (nb, S))):
        return plan
    slots = plan.slots.copy()
    slots[:, :S] = np.take_along_axis(plan.slots[:, :S], order, axis=1)
    rel = plan.rel.reshape(nb, a * 8, LANES)
    oldslot = (rel >> 7).astype(np.int64)
    lane = rel & (LANES - 1)
    ns = np.take_along_axis(
        np.broadcast_to(newpos[:, None, :], (nb, a * 8, S)), oldslot, axis=2)
    rel2 = (ns * LANES + lane).astype(np.int32).reshape(nb * a * 8, LANES)
    inv2 = np.take_along_axis(inv5, order[:, :, None, None, None], axis=1)
    return dataclasses.replace(
        plan, slots=slots, rel=rel2,
        inv=np.ascontiguousarray(inv2).reshape(nb * S * D * 8, LANES))


# --------------------------------------------------------------------------
# Super-block kernels: every VPU op covers 1024 constraints (sublane = the
# 128-constraint sub-block).  Gather: one (8,128) window slice per slot,
# per-component sublane broadcast + lane shuffle.  Scatter: per-sublane lane
# shuffle from per-(role,comp) correction tiles, summed across sublanes, one
# RMW per slot.
#
# v7 (round 3): inverse masses are NOT gathered per sweep.  They are static
# across a step program (the kernels only write xyz rows), so a one-time
# w-fill prologue kernel (make time: _w_fill_kernel; runtime: fill_w, once
# per jitted program) materializes per-constraint wsum (edges) / per-role w
# (tets) tables that then STREAM through the grid like rest/scale.  Measured
# at north-star scale: edge sweep -8%, tet sweep -7%.  The scatter loop is
# additionally RAGGED: slots are sorted per block by layer occupancy
# (_slot_sort) and each kernel group unrolls per-slot-position layer counts
# (PROF) instead of a flat (S x DMAX); all-empty (slot, layer) tiles
# disappear statically (another ~3-4%).
# --------------------------------------------------------------------------

def block_counts(plan) -> np.ndarray:
    """Within-super-block per-role vertex multiplicity, rel-layout.

    Returns (num_super * arity * 8, LANES) f32: for each constraint lane,
    how many constraints of ITS 1024-wide super-block touch the vertex it
    references through that role.  Derived from the plan arrays (slots +
    rel + perm), so cached plans need no repack and PACK_VERSION is
    untouched.  Pad lanes get 1.0.

    This is the mass-splitting table: with inverse masses inflated to
    c_i * w_i in the dlambda denominator (and the apply using plain w),
    the within-block Jacobi solve is the equal-mass-copy split scheme --
    provably overshoot-free without the 1/max dlambda damping.
    """
    a, nb = plan.arity, plan.num_super
    rel = plan.rel.reshape(nb, a, 8, LANES)
    t = rel >> 7
    lane = rel & (LANES - 1)
    # global vertex id per (b, role, g, lane)
    win = np.take_along_axis(
        np.broadcast_to(plan.slots[:, None, None, :],
                        (nb, a, 8, plan.slots.shape[1])), t, axis=3)
    v = win.astype(np.int64) * LANES + lane
    live = np.broadcast_to(
        (plan.perm.reshape(nb, 8, LANES) >= 0)[:, None, :, :], v.shape)
    nv = int(v.max()) + 1 if v.size else 1
    key = (np.arange(nb, dtype=np.int64)[:, None, None, None] * nv
           + v)[live]
    uniq, inv = np.unique(key, return_inverse=True)
    cnt_u = np.bincount(inv.ravel(), minlength=len(uniq))
    out = np.ones((nb, a, 8, LANES), np.float32)
    out[live] = cnt_u[inv.ravel()].astype(np.float32)
    return out.reshape(nb * a * 8, LANES)


def _gather_super(xout_ref, wins, rel, S):
    """rel (8,128) -> ((8,128) x 4): x,y,z,invmass tiles for one role.

    The lane index (rel & 127) is window-independent, so the shuffle index
    and the slot id (rel >> 7) are hoisted out of the slot loop; per slot
    only one compare remains (vs the round-2 subtract/range-test/clip).
    """
    lane = rel & (LANES - 1)
    slot_of = rel >> 7
    ax = ay = az = aw = jnp.zeros((8, LANES), jnp.float32)
    for t in range(S):
        # astype: identity on the f32 table; upcast on the opt-in bf16
        # x-table (compute stays f32 everywhere)
        xw = xout_ref[:, pl.ds(wins[t] * LANES, LANES)] \
            .astype(jnp.float32)
        val = slot_of == t
        for c, acc in enumerate((ax, ay, az, aw)):
            row = jnp.broadcast_to(xw[c:c + 1, :], (8, LANES))
            g = jnp.take_along_axis(row, lane, axis=1)
            if c == 0:
                ax = jnp.where(val, g, acc)
            elif c == 1:
                ay = jnp.where(val, g, acc)
            elif c == 2:
                az = jnp.where(val, g, acc)
            else:
                aw = jnp.where(val, g, acc)
    return ax, ay, az, aw


def _gather_xyz(xout_ref, wins, rel, S):
    """rel (8,128) -> ((8,128) x 3): xyz tiles for one role (w streamed)."""
    lane = rel & (LANES - 1)
    slot_of = rel >> 7
    ax = ay = az = jnp.zeros((8, LANES), jnp.float32)
    for t in range(S):
        xw = xout_ref[:, pl.ds(wins[t] * LANES, LANES)] \
            .astype(jnp.float32)
        val = slot_of == t
        for c in range(3):
            row = jnp.broadcast_to(xw[c:c + 1, :], (8, LANES))
            g = jnp.take_along_axis(row, lane, axis=1)
            if c == 0:
                ax = jnp.where(val, g, ax)
            elif c == 1:
                ay = jnp.where(val, g, ay)
            else:
                az = jnp.where(val, g, az)
    return ax, ay, az


def _gather_w(xref, wins, rel, S):
    """rel (8,128) -> (8,128) inverse-mass tile for one role."""
    lane = rel & (LANES - 1)
    slot_of = rel >> 7
    aw = jnp.zeros((8, LANES), jnp.float32)
    for t in range(S):
        row = jnp.broadcast_to(
            xref[3:4, pl.ds(wins[t] * LANES, LANES)]
            .astype(jnp.float32), (8, LANES))
        g = jnp.take_along_axis(row, lane, axis=1)
        aw = jnp.where(slot_of == t, g, aw)
    return aw


def _w_fill_kernel(slots_ref, rel_ref, cnt_ref, xin_ref, wout_ref, *,
                   S, GB, ROLES):
    """One-time prologue: gather per-constraint inverse masses from the
    particle table into streamable tables.  Edges (ROLES=2) store the wsum
    row per sub-block; tets (ROLES=4) store one row-block per role.

    cnt_ref is the per-role within-block multiplicity table
    (block_counts): each gathered w is multiplied by its count, so with
    the mass-splitting scheme the streamed tables hold the split inverse
    masses c_i * w_i; the legacy scale scheme passes all-ones counts and
    the tables hold plain w (bit-identical: x * 1.0 is exact).

    Pad lanes gather garbage (rel=0 -> window 0 lane 0) exactly like the
    old in-sweep gathers did; they stay inert in the sweeps through the
    geometry guards (zero-length edge / degenerate tet)."""
    for sb in range(GB):
        wins = [slots_ref[sb, t] for t in range(S)]
        if ROLES == 2:
            w0 = _gather_w(xin_ref, wins,
                           rel_ref[(sb * 2) * 8:(sb * 2) * 8 + 8, :], S)
            w1 = _gather_w(xin_ref, wins,
                           rel_ref[(sb * 2 + 1) * 8:(sb * 2 + 1) * 8 + 8, :],
                           S)
            c0 = cnt_ref[(sb * 2) * 8:(sb * 2) * 8 + 8, :]
            c1 = cnt_ref[(sb * 2 + 1) * 8:(sb * 2 + 1) * 8 + 8, :]
            wout_ref[sb * 8:sb * 8 + 8, :] = w0 * c0 + w1 * c1
        else:
            for r in range(ROLES):
                row = (sb * ROLES + r) * 8
                wr = _gather_w(xin_ref, wins, rel_ref[row:row + 8, :], S)
                wout_ref[row:row + 8, :] = wr * cnt_ref[row:row + 8, :]


def _scatter_super(xout_ref, w, accx, accy, accz):
    """Sum (8,128) per-sublane contributions and RMW one window.

    On the opt-in bf16 x-table the RMW upcasts, adds in f32, and
    rounds back on store (the quantization the tolerance bound covers);
    on the f32 table the casts are identities."""
    addx = jnp.sum(accx, axis=0, keepdims=True)
    addy = jnp.sum(accy, axis=0, keepdims=True)
    addz = jnp.sum(accz, axis=0, keepdims=True)
    xw = xout_ref[:, pl.ds(w * LANES, LANES)]
    xf = xw[0:3].astype(jnp.float32)
    new = jnp.concatenate(
        [(xf[0:1] + addx).astype(xw.dtype),
         (xf[1:2] + addy).astype(xw.dtype),
         (xf[2:3] + addz).astype(xw.dtype), xw[3:8]], axis=0)
    xout_ref[:, pl.ds(w * LANES, LANES)] = new


def _edge_kernel_super(alpha_ref, slots_ref, rel_ref, inv_ref, rest_ref,
                       scale_ref, a_ref, w_ref, lam_ref, xin_ref, xout_ref,
                       lamout_ref, *, S, PROF, GB, PERA, K=1):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        xout_ref[:] = xin_ref[:]

    sumd = max(1, sum(PROF))
    off = [0]
    for d in PROF:
        off.append(off[-1] + d)
    alpha = alpha_ref[0, 0]
    for sb in range(GB):
        wins = [slots_ref[sb, t] for t in range(S)]
        r0 = rel_ref[(sb * 2) * 8:(sb * 2) * 8 + 8, :]
        r1 = rel_ref[(sb * 2 + 1) * 8:(sb * 2 + 1) * 8 + 8, :]
        # K: local block re-iterations (mass-splitting scheme) -- the block
        # data is already VMEM-resident, so revisits re-run only gathers +
        # VPU compute; lambda accumulates across revisits.
        lam = lam_ref[sb * 8:sb * 8 + 8, :]
        for _rep in range(K):
            a0x, a0y, a0z = _gather_xyz(xout_ref, wins, r0, S)
            a1x, a1y, a1z = _gather_xyz(xout_ref, wins, r1, S)

            dx = a0x - a1x
            dy = a0y - a1y
            dz = a0z - a1z
            length = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            # v7: wsum streamed (the w-fill prologue), not gathered per
            # sweep; under the split scheme this is the multiplicity-
            # inflated sum c0*w0 + c1*w1 (mass splitting)
            wsum = w_ref[sb * 8:sb * 8 + 8, :]
            valid = (wsum != 0.0) & (length >= 1e-12)
            c = length - rest_ref[sb * 8:sb * 8 + 8, :]
            # PERA: per-constraint compliance tile; alpha scalar is 1/dt^2
            al = alpha * a_ref[sb * 8:sb * 8 + 8, :] if PERA else alpha
            denom = wsum + al
            dlam = jnp.where(valid, (-c - al * lam)
                             / jnp.where(denom == 0.0, 1.0, denom), 0.0)
            dlam = dlam * scale_ref[sb * 8:sb * 8 + 8, :]
            lam = lam + dlam
            # same association as the classic kernel / oracle:
            # (d/len)*dlam*w
            inv_len = 1.0 / jnp.where(length < 1e-12, 1.0, length)
            nx, ny, nz = dx * inv_len, dy * inv_len, dz * inv_len
            cx, cy, cz = nx * dlam, ny * dlam, nz * dlam

            # No pl.when on the slot loop: a conditional branch costs
            # ~50 ns on this chip (measured, PLAN.md round-2 grid) -- more
            # than the masked tile work it would skip.  Unused slots RMW +0
            # into a real window.
            #
            # v6 scatter (round 3): ONE correction source per component
            # (n*dlam) plus a signed target-side weight factor -- the
            # scattered vertex's own inverse mass lives at the TARGET lane
            # (sublane 3 of the window being written), so corr*w needs no
            # per-role source tiles and no role demux: factor = (+-1
            # presence) * w_target.  Exactly the old arithmetic
            # bit-for-bit (the +-1 and w multiplies are exact).
            #
            # v7 ragged layers: PROF[t] is slot position t's static layer
            # count for this kernel group (slots pre-sorted by occupancy,
            # _slot_sort); all-empty tiles are skipped at trace time.  The
            # skipped tiles contributed exact +0.0 (sf=0), but the shorter
            # op sequence lets XLA associate the surviving sums differently
            # -- expect ULP-level deviation from the dense kernel, with an
            # exact contribution mapping (tests/test_sweep_groups.py,
            # test_jacobi_groups.py).
            for t in range(S):
                if PROF[t] == 0:
                    continue
                w8 = jnp.broadcast_to(
                    xout_ref[3:4, pl.ds(wins[t] * LANES, LANES)]
                    .astype(jnp.float32), (8, LANES))
                accx = accy = accz = jnp.zeros((8, LANES), jnp.float32)
                for l in range(PROF[t]):
                    row = (sb * sumd + off[t] + l) * 8
                    inv = inv_ref[row:row + 8, :]
                    jl = inv & (LANES - 1)       # -1 -> 127, masked by sf=0
                    sf = jnp.where(inv >= 0,
                                   jnp.where(inv >= LANES, -1.0, 1.0), 0.0)
                    factor = sf * w8
                    accx = (accx
                            + jnp.take_along_axis(cx, jl, axis=1) * factor)
                    accy = (accy
                            + jnp.take_along_axis(cy, jl, axis=1) * factor)
                    accz = (accz
                            + jnp.take_along_axis(cz, jl, axis=1) * factor)
                _scatter_super(xout_ref, wins[t], accx, accy, accz)
        lamout_ref[sb * 8:sb * 8 + 8, :] = lam


def _cross_c(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _tet_kernel_super(alpha_ref, slots_ref, rel_ref, inv_ref, rest_ref,
                      scale_ref, a_ref, w_ref, lam_ref, xin_ref, xout_ref,
                      lamout_ref, *, S, PROF, GB, PERA, MS=False, K=1):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        xout_ref[:] = xin_ref[:]

    sumd = max(1, sum(PROF))
    off = [0]
    for d in PROF:
        off.append(off[-1] + d)
    alpha = alpha_ref[0, 0]
    sixth = jnp.float32(1.0 / 6.0)
    for sb in range(GB):
        wins = [slots_ref[sb, t] for t in range(S)]
        lam = lam_ref[sb * 8:sb * 8 + 8, :]
        # K: local block re-iterations; see the edge kernel's note.
        for _rep in range(K):
            acc = []
            for r in range(4):
                rel = rel_ref[(sb * 4 + r) * 8:(sb * 4 + r) * 8 + 8, :]
                acc.append(_gather_xyz(xout_ref, wins, rel, S))
            (pax, pay, paz), (pbx, pby, pbz), \
                (pcx, pcy, pcz), (pdx, pdy, pdz) = acc
            # v7: per-role inverse masses streamed (w-fill prologue).
            # MS (mass splitting): the streamed tables hold c_r * w_r --
            # used for the wsum denominator only; the apply multiplies by
            # the TARGET lane's plain w (sublane 3) in the scatter loop,
            # exactly like the edge kernel's v6 scatter.
            wa = w_ref[(sb * 4 + 0) * 8:(sb * 4 + 0) * 8 + 8, :]
            wb = w_ref[(sb * 4 + 1) * 8:(sb * 4 + 1) * 8 + 8, :]
            wc = w_ref[(sb * 4 + 2) * 8:(sb * 4 + 2) * 8 + 8, :]
            wd = w_ref[(sb * 4 + 3) * 8:(sb * 4 + 3) * 8 + 8, :]

            # gradients (Sim.cpp:132-173), per component
            gax, gay, gaz = _cross_c(pdx - pbx, pdy - pby, pdz - pbz,
                                     pcx - pbx, pcy - pby, pcz - pbz)
            gbx, gby, gbz = _cross_c(pcx - pax, pcy - pay, pcz - paz,
                                     pdx - pax, pdy - pay, pdz - paz)
            gcx, gcy, gcz = _cross_c(pdx - pax, pdy - pay, pdz - paz,
                                     pbx - pax, pby - pay, pbz - paz)
            gdx, gdy, gdz = _cross_c(pbx - pax, pby - pay, pbz - paz,
                                     pcx - pax, pcy - pay, pcz - paz)
            gax, gay, gaz = gax * sixth, gay * sixth, gaz * sixth
            gbx, gby, gbz = gbx * sixth, gby * sixth, gbz * sixth
            gcx, gcy, gcz = gcx * sixth, gcy * sixth, gcz * sixth
            gdx, gdy, gdz = gdx * sixth, gdy * sixth, gdz * sixth

            wsum = (wa * (gax * gax + gay * gay + gaz * gaz)
                    + wb * (gbx * gbx + gby * gby + gbz * gbz)
                    + wc * (gcx * gcx + gcy * gcy + gcz * gcz)
                    + wd * (gdx * gdx + gdy * gdy + gdz * gdz))
            valid = ((wa + wb + wc + wd) != 0.0) & (wsum >= 1e-20)

            # signed volume = cross(b-a, c-a) . (d-a) / 6 == gd . (d-a)
            vol = (gdx * (pdx - pax) + gdy * (pdy - pay)
                   + gdz * (pdz - paz))
            cfn = vol - rest_ref[sb * 8:sb * 8 + 8, :]
            al = alpha * a_ref[sb * 8:sb * 8 + 8, :] if PERA else alpha
            denom = wsum + al
            dlam = jnp.where(valid, (-cfn - al * lam)
                             / jnp.where(denom == 0.0, 1.0, denom), 0.0)
            dlam = dlam * scale_ref[sb * 8:sb * 8 + 8, :]
            lam = lam + dlam

            if MS:
                sa = sb_ = sc = sd = dlam
            else:
                sa = wa * dlam
                sb_ = wb * dlam
                sc = wc * dlam
                sd = wd * dlam
            comps = (
                (gax * sa, gbx * sb_, gcx * sc, gdx * sd),
                (gay * sa, gby * sb_, gcy * sc, gdy * sd),
                (gaz * sa, gbz * sb_, gcz * sc, gdz * sd),
            )

            # branchless slot loop -- see the edge kernel's note.  Role
            # bits are decoded straight off inv (no clip): -1 entries
            # produce garbage lane/odd/hi but the has-mask kills them.
            for t in range(S):
                if PROF[t] == 0:
                    continue
                if MS:
                    w8 = jnp.broadcast_to(
                        xout_ref[3:4, pl.ds(wins[t] * LANES, LANES)]
                        .astype(jnp.float32), (8, LANES))
                accs = [jnp.zeros((8, LANES), jnp.float32)
                        for _ in range(3)]
                for l in range(PROF[t]):
                    row = (sb * sumd + off[t] + l) * 8
                    inv = inv_ref[row:row + 8, :]
                    has = inv >= 0
                    hi = inv >= 2 * LANES
                    odd = (inv & LANES) > 0
                    jl = inv & (LANES - 1)
                    for ci in range(3):
                        ca, cb, cc, cd = comps[ci]
                        g_ab = jnp.where(
                            odd, jnp.take_along_axis(cb, jl, axis=1),
                            jnp.take_along_axis(ca, jl, axis=1))
                        g_cd = jnp.where(
                            odd, jnp.take_along_axis(cd, jl, axis=1),
                            jnp.take_along_axis(cc, jl, axis=1))
                        pick = jnp.where(hi, g_cd, g_ab)
                        add = jnp.where(has, pick, 0.0)
                        if MS:
                            add = add * w8
                        accs[ci] = accs[ci] + add
                _scatter_super(xout_ref, wins[t], accs[0], accs[1],
                               accs[2])
        lamout_ref[sb * 8:sb * 8 + 8, :] = lam


# --------------------------------------------------------------------------
# Call builders
# --------------------------------------------------------------------------

def _make_sweep_grouped(plan: SuperPlan, num_windows: int, *,
                        interpret: bool = False,
                        per_constraint_alpha=None, ragged: bool = True,
                        scheme: str = "scale", omega: float = 1.0,
                        local_iters: int = 1, x_dtype=jnp.float32):
    """Grouped build: one trimmed pallas_call per execution group.

    Groups run sequentially in block order, threading x8 -- exactly the
    plan's block-synchronous GS sequence, with each group's kernel unrolled
    only to that group's slot/layer caps.  Lambdas travel as per-group
    stripe arrays (see split_lambda/join_lambda); the caller carries the
    tuple and joins only at the public boundary.

    ragged=True (default): slots are sorted per block by layer occupancy
    (_slot_sort) and each group's inv table is re-laid out to the group's
    per-slot-position layer profile -- all-empty (slot, layer) tiles vanish
    statically.  ragged=False keeps the dense (S, DMAX) layout (the SPMD
    sharded path stacks per-device plan arrays directly and needs identical
    shapes/indexing on every device).

    The returned sweep is called ``sweep(x8, lam_stripes, alpha, tables)``
    where ``tables`` must have been completed by ``sweep.fill_w(x8,
    sweep.tables)`` once per jitted program: the fill runs the w prologue
    kernel per group and appends the streamed inverse-mass table (wsum for
    edges, per-role w for tets) to each group's static tuple.
    """
    if scheme not in ("scale", "split"):
        raise ValueError(f"unknown block scheme {scheme!r}")
    # Mosaic's default scoped-VMEM budget is a conservative 16 MB; v5e
    # physically carries far more (measured: a 100 MB budget compiles and
    # runs, lifting the flat x8 capacity to ~1.55M particles f32 / ~3.2M
    # bf16 -- PLAN.md round 4d).  Demand-driven: small scenes keep the
    # default (a blanket 100 MB budget measured ~7% slower at north-star
    # scale -- the compiler trades pipeline buffers differently); big
    # flat tables request the x8 operand pair + slack, capped at the
    # measured ceiling.
    xbytes = 8 * num_windows * LANES * jnp.dtype(x_dtype).itemsize
    need = 2 * xbytes + 8 * 2**20
    _cp = None
    if need > 16 * 2**20:
        lim = min(need, VMEM_LIMIT_BYTES)
        try:
            _cp = pltpu.CompilerParams(vmem_limit_bytes=lim)
        except (TypeError, AttributeError):  # older pallas naming
            _cp = pltpu.TPUCompilerParams(vmem_limit_bytes=lim)
    if ragged:
        plan = _slot_sort(plan)
    S, D, a = plan.nslots, plan.dmax, plan.arity
    nb = plan.num_super
    vpad = num_windows * LANES
    kernel = _edge_kernel_super if a == 2 else _tet_kernel_super
    wrows = 8 if a == 2 else 4 * 8
    pera = per_constraint_alpha is not None
    a_full = (pack_lambda(plan, jnp.maximum(
        jnp.asarray(per_constraint_alpha, jnp.float32), 0.0))
        if pera else None)
    inv5 = plan.inv.reshape(nb, S, D, 8, LANES)
    occ5 = inv5 >= 0
    split = scheme == "split"
    K = max(1, int(local_iters))
    # split: the fill prologue's count table inflates the streamed inverse
    # masses to c_i * w_i (mass splitting) and the per-lane dlambda scale
    # becomes a flat over-relaxation omega; scale: legacy 1/max-multiplicity
    # damping (counts of 1.0 keep the fill bit-identical), omega on top.
    cnt_full = (block_counts(plan) if split
                else np.ones_like(plan.rel, np.float32))
    if split:
        scale_full = np.full_like(plan.scale, np.float32(omega))
    elif omega != 1.0:
        scale_full = plan.scale * np.float32(omega)
    else:
        scale_full = plan.scale

    calls, fills, tabs_all = [], [], []
    b0 = 0
    for nbg, Sg, Dg in plan.groups or ((nb, S, D),):
        b1 = b0 + nbg
        gb = min(SUBBLOCKS, nbg)
        nstep = nbg // gb
        if ragged:
            lay = occ5[b0:b1, :Sg].any(axis=(3, 4))     # (nbg, Sg, D)
            d_bs = np.where(lay.any(axis=2),
                            D - np.argmax(lay[:, :, ::-1], axis=2), 0)
            prof = tuple(int(v) for v in d_bs.max(axis=0))
            pieces = [inv5[b0:b1, t, :prof[t]]
                      for t in range(Sg) if prof[t]]
            invr = (np.concatenate(pieces, axis=1) if pieces
                    else np.full((nbg, 1, 8, LANES), -1, np.int32))
        else:
            prof = (Dg,) * Sg
            invr = inv5[b0:b1, :Sg, :Dg]
        sumd = max(1, sum(prof))
        invr = np.ascontiguousarray(invr).reshape(nbg * sumd * 8, LANES)
        slots_spec = pl.BlockSpec((gb, LANES), lambda s: (s, 0),
                                  memory_space=pltpu.SMEM)
        rel_spec = pl.BlockSpec((gb * a * 8, LANES), lambda s: (s, 0),
                                memory_space=pltpu.VMEM)
        inv_spec = pl.BlockSpec((gb * sumd * 8, LANES), lambda s: (s, 0),
                                memory_space=pltpu.VMEM)
        data_spec = pl.BlockSpec((gb * 8, LANES), lambda s: (s, 0),
                                 memory_space=pltpu.VMEM)
        w_spec = pl.BlockSpec((gb * wrows, LANES), lambda s: (s, 0),
                              memory_space=pltpu.VMEM)
        if pera:
            atab = a_full[b0 * 8:b1 * 8]
            a_spec = data_spec
        else:
            atab = jnp.zeros((gb * 8, LANES), jnp.float32)
            a_spec = pl.BlockSpec((gb * 8, LANES), lambda s: (0, 0),
                                  memory_space=pltpu.VMEM)
        kw = dict(S=Sg, PROF=prof, GB=gb, PERA=pera, K=K)
        if a == 4:
            kw["MS"] = split
        call = pl.pallas_call(
            functools.partial(kernel, **kw),
            grid=(nstep,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda s: (0, 0),
                             memory_space=pltpu.SMEM),
                slots_spec, rel_spec, inv_spec, data_spec, data_spec,
                a_spec, w_spec, data_spec,
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                data_spec,
            ),
            out_shape=(
                jax.ShapeDtypeStruct((8, vpad), x_dtype),
                jax.ShapeDtypeStruct((nbg * 8, LANES), jnp.float32),
            ),
            interpret=interpret,
            compiler_params=None if interpret else _cp,
        )
        fill = pl.pallas_call(
            functools.partial(_w_fill_kernel, S=Sg, GB=gb, ROLES=a),
            grid=(nstep,),
            in_specs=[
                slots_spec, rel_spec, rel_spec,
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=w_spec,
            out_shape=jax.ShapeDtypeStruct((nbg * wrows, LANES),
                                           jnp.float32),
            interpret=interpret,
            compiler_params=None if interpret else _cp,
        )
        calls.append(call)
        fills.append(fill)
        tabs_all.append((
            jnp.asarray(plan.slots[b0:b1]),
            jnp.asarray(plan.rel[b0 * a * 8:b1 * a * 8]),
            jnp.asarray(invr),
            jnp.asarray(plan.rest[b0 * 8:b1 * 8]),
            jnp.asarray(scale_full[b0 * 8:b1 * 8]),
            atab,
            jnp.asarray(cnt_full[b0 * a * 8:b1 * a * 8]),
        ))
        b0 = b1

    def fill_w(x8, tables):
        """Append the streamed inverse-mass tables (once per program)."""
        return tuple(tabs[:7] + (fc(tabs[0], tabs[1], tabs[6], x8),)
                     for fc, tabs in zip(fills, tables))

    def sweep(x8, lam_stripes, alpha, tables):
        alpha2 = jnp.asarray(alpha, jnp.float32).reshape(1, 1)
        outs = []
        for call, tabs, lam_g in zip(calls, tables, lam_stripes):
            slots, rel, inv, rest, scale, atab, _cnt, wtab = tabs
            x8, lam_o = call(alpha2, slots, rel, inv, rest, scale, atab,
                             wtab, lam_g, x8)
            outs.append(lam_o)
        return x8, tuple(outs)

    sweep.tables = tuple(tabs_all)
    sweep.fill_w = fill_w
    sweep.per_constraint = pera
    sweep.grouped = True
    sweep.scheme = scheme
    sweep.omega = float(omega)
    sweep.local_iters = K
    return sweep


def split_lambda(plan, packed: jnp.ndarray):
    """Packed (lam_rows, LANES) -> per-group stripe tuple (grouped plans)."""
    if not getattr(plan, "groups", None):
        return packed
    stripes, r0 = [], 0
    for nbg, _, _ in plan.groups:
        stripes.append(packed[r0:r0 + nbg * 8])
        r0 += nbg * 8
    return tuple(stripes)


def join_lambda(plan, stripes):
    """Per-group stripe tuple -> packed (lam_rows, LANES)."""
    if not isinstance(stripes, tuple):
        return stripes
    return jnp.concatenate(list(stripes), axis=0)


def make_sweep(plan, num_windows: int, *, interpret: bool = False,
               per_constraint_alpha=None, scheme: str = "scale",
               omega: float = 1.0, local_iters: int = 1,
               x_dtype=jnp.float32):
    """Build ``sweep(x8, lam_packed, alpha, tables) -> (x8, lam_packed)``.

    x8 is the (8, Vpad) particle table (rows 0-2 xyz, row 3 inverse mass);
    lam_packed is (lam_rows(plan), LANES) f32 in packed lane order; alpha is
    a traced f32 scalar (compliance / dt^2).  Accepts either a SweepPlan
    (128-constraint blocks) or a SuperPlan (1024-constraint super-blocks).

    ``tables`` is the sweep's ``.tables`` attribute (slots/rel/inv/rest/
    scale device arrays), threaded through the caller's jit as ARGUMENTS:
    at 100k-constraint scale the packed plans are >100 MB, and closure-
    captured tables would be lowered as HLO literals (~40 s of trace+lower
    and a ~47 MB cache entry per program, measured).  Before the first
    sweep of a jitted program, complete them once with ``tables =
    sweep.fill_w(x8, tables)`` -- the w-fill prologue appends the streamed
    inverse-mass tables the v7 kernels consume (a no-op identity for the
    legacy SweepPlan kernels).

    per_constraint_alpha: optional (N,) public-order COMPLIANCE per
    constraint (mixed-material merged scenes).  The traced alpha scalar is
    then 1/dt^2 -- alpha_i = compliance_i/dt^2 exactly, no approximation.

    Regrouped SuperPlans (regroup_plan) build one trimmed kernel per
    execution group; lambda then travels as a per-group stripe tuple
    (split_lambda/join_lambda convert to/from the packed array form).
    Ungrouped SuperPlans keep the flat array contract (and the dense inv
    layout -- the sharded path stacks per-device plan arrays directly).
    """
    if isinstance(plan, SuperPlan):
        if plan.groups:
            return _make_sweep_grouped(
                plan, num_windows, interpret=interpret,
                per_constraint_alpha=per_constraint_alpha, scheme=scheme,
                omega=omega, local_iters=local_iters, x_dtype=x_dtype)
        g = _make_sweep_grouped(
            plan, num_windows, interpret=interpret,
            per_constraint_alpha=per_constraint_alpha, ragged=False,
            scheme=scheme, omega=omega, local_iters=local_iters,
            x_dtype=x_dtype)

        def sweep(x8, lam_packed, alpha, tables):
            x8, (lam_o,) = g(x8, (lam_packed,), alpha, (tables,))
            return x8, lam_o

        def fill_w(x8, tables):
            return g.fill_w(x8, (tables,))[0]

        sweep.tables = g.tables[0]
        sweep.fill_w = fill_w
        sweep.per_constraint = g.per_constraint
        sweep.grouped = False
        return sweep

    if scheme != "scale" or omega != 1.0 or local_iters != 1 \
            or x_dtype != jnp.float32:
        raise ValueError("the legacy SweepPlan kernels support only the "
                         "scale scheme on the f32 x-table (use "
                         "superblocks=True for split/omega/local_iters/"
                         "x_dtype)")
    S, DMAX = plan.nslots, plan.dmax
    vpad = num_windows * LANES
    nb = plan.num_blocks
    gb = min(SUBBLOCKS, nb)        # small plans are trimmed below SUBBLOCKS
    kernel = _edge_kernel if plan.arity == 2 else _tet_kernel
    nstep = plan.num_blocks // gb
    lam_rows_ = plan.num_blocks
    slots_spec = pl.BlockSpec((gb, 8), lambda s: (s, 0),
                              memory_space=pltpu.SMEM)
    rel_spec = pl.BlockSpec((gb * plan.arity, LANES), lambda s: (s, 0),
                            memory_space=pltpu.VMEM)
    inv_spec = pl.BlockSpec((gb * S * DMAX, LANES), lambda s: (s, 0),
                            memory_space=pltpu.VMEM)
    data_spec = pl.BlockSpec((gb, LANES), lambda s: (s, 0),
                             memory_space=pltpu.VMEM)

    pera = per_constraint_alpha is not None
    if pera:
        a_table = pack_lambda(plan, jnp.maximum(
            jnp.asarray(per_constraint_alpha, jnp.float32), 0.0))
        a_spec = data_spec
    else:
        # unused dummy (kernel never reads it); pinned to block 0
        a_table = jnp.zeros((gb, LANES), jnp.float32)
        a_spec = pl.BlockSpec((gb, LANES), lambda s: (0, 0),
                              memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        functools.partial(kernel, S=S, DMAX=DMAX, GB=gb, PERA=pera),
        grid=(nstep,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda s: (0, 0), memory_space=pltpu.SMEM),
            slots_spec, rel_spec, inv_spec, data_spec, data_spec, a_spec,
            data_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            data_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, vpad), jnp.float32),
            jax.ShapeDtypeStruct((lam_rows_, LANES), jnp.float32),
        ),
        interpret=interpret,
    )

    def sweep(x8, lam_packed, alpha, tables):
        alpha2 = jnp.asarray(alpha, jnp.float32).reshape(1, 1)
        slots, rel, inv, rest, scale, atab = tables
        return call(alpha2, slots, rel, inv, rest, scale, atab, lam_packed,
                    x8)

    sweep.tables = (jnp.asarray(plan.slots), jnp.asarray(plan.rel),
                    jnp.asarray(plan.inv), jnp.asarray(plan.rest),
                    jnp.asarray(plan.scale), a_table)
    sweep.fill_w = lambda x8, tables: tables   # legacy kernels gather w
    sweep.per_constraint = pera
    sweep.grouped = False
    return sweep


def lam_rows(plan) -> int:
    return (plan.num_super * 8 if isinstance(plan, SuperPlan)
            else plan.num_blocks)


def block_width(plan) -> int:
    """Constraints per synchronous block (the oracle's replay granularity).

    Accepts SweepPlan, SuperPlan, or any object exposing concatenated
    ``perm``/``scale`` with a ``super_blocks`` marker (the segmented
    execution plan, solver/xpbd_pallas.py::_SegPlan)."""
    if isinstance(plan, SuperPlan) or getattr(plan, "super_blocks", False):
        return 8 * LANES
    return LANES


def pack_lambda(plan, lam: jnp.ndarray) -> jnp.ndarray:
    """Public-order (N,) lambdas -> packed (lam_rows, LANES)."""
    perm = jnp.asarray(np.maximum(plan.perm, 0))
    mask = jnp.asarray(plan.perm >= 0)
    flat = jnp.where(mask, lam[perm], 0.0)
    return flat.reshape(lam_rows(plan), LANES)


def unpack_lambda(plan, lam_packed: jnp.ndarray) -> jnp.ndarray:
    """Packed (lam_rows, LANES) -> public-order (N,)."""
    return lam_packed.reshape(-1)[jnp.asarray(plan.pos_of)]
