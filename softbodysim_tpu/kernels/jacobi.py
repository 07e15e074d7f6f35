"""Pallas TPU Jacobi-dialect constraint passes -- the in-engine GPU kernels.

TPU-native form of the reference's Unity compute-shader pipeline
(K_EdgeGather -> K_ApplyDelta -> K_VolumeGather -> K_ApplyDelta,
Assets/Shaders/SoftBodyCompute.compute:230-392, dispatched per iteration by
SoftBodySolver.cs:778-788): one kernel per constraint family computes every
constraint's stiffness-weighted contribution from the FROZEN iteration-start
positions, accumulates per-particle (delta, count) -- and applies
x += (omega / cnt) * delta in an epilogue on the last grid step, so a whole
gather+apply stage is ONE kernel with zero intermediate HBM traffic.

Unlike the XPBD sweeps (kernels/sweep.py), ordering inside a pass is
irrelevant -- pure Jacobi reads one snapshot -- so this backend is *exactly*
the reference Jacobi semantics (tests/oracle.py::JacobiOracle) up to fp32
summation order; no block-synchronous approximation is involved.

Reuses the SuperPlan packing (1024-constraint super-blocks, shared window
pool, layered inverse scatter maps) and the branchless masked scatter loop
(a pl.when branch costs ~50 ns on v5e -- PLAN.md).  The per-lane dlambda
scale of the XPBD kernels is NOT used: the global omega/cnt apply is the
reference's own averaging.

Layout contract (shared with solver/xpbd_pallas.py): the particle table is
(8, Vpad) f32, sublanes 0-2 = xyz, sublane 3 = inverse mass.  The pass
returns the applied table; sublanes 3-7 are passed through.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sweep import (LANES, SUBBLOCKS, SuperPlan, _gather_xyz, _slot_sort,
                    _w_fill_kernel)

__all__ = ["make_jacobi_pass"]


def _scatter_acc4(acc_ref, w, ax, ay, az, ac):
    """Sum (8,128) per-sublane contributions, RMW (delta_xyz, cnt) rows of
    one 128-vertex window of the accumulator table."""
    addx = jnp.sum(ax, axis=0, keepdims=True)
    addy = jnp.sum(ay, axis=0, keepdims=True)
    addz = jnp.sum(az, axis=0, keepdims=True)
    addc = jnp.sum(ac, axis=0, keepdims=True)
    aw = acc_ref[:, pl.ds(w * LANES, LANES)]
    new = jnp.concatenate(
        [aw[0:1] + addx, aw[1:2] + addy, aw[2:3] + addz, aw[3:4] + addc,
         aw[4:8]], axis=0)
    acc_ref[:, pl.ds(w * LANES, LANES)] = new


def _apply_epilogue(xin_ref, xout_ref, omega):
    """x += (omega / cnt) * delta for free particles with cnt > 0
    (K_ApplyDelta, SoftBodyCompute.compute:372-392; SoftBodySolver.cs:
    521-527).  xout currently holds the (delta, cnt) accumulator."""
    xi = xin_ref[:]
    wrow = xi[3:4]
    cnt = xout_ref[3:4]
    ok = (cnt > 0.0) & (wrow != 0.0)
    scale = omega / jnp.maximum(cnt, 1.0)
    newx = jnp.where(ok, xi[0:3] + scale * xout_ref[0:3], xi[0:3])
    xout_ref[:] = jnp.concatenate([newx, xi[3:8]], axis=0)


def _edge_pass_kernel(scal_ref, slots_ref, rel_ref, inv_ref, rest_ref,
                      k_ref, w_ref, xin_ref, *refs, S, PROF, NSTEP, GB,
                      PERK, INIT=True, FINAL=True):
    # Grouped execution (make_jacobi_pass on a regrouped plan): the
    # accumulator threads across group kernels -- only the first group
    # zeroes it (INIT), later groups seed xout from the incoming acc_ref
    # (aliased to xout, so the copy is an identity in compiled mode), and
    # only the last group runs the apply epilogue (FINAL).
    xout_ref = refs[-1]
    s = pl.program_id(0)

    if INIT:
        @pl.when(s == 0)
        def _():
            xout_ref[:] = jnp.zeros_like(xout_ref)
    else:
        acc_ref = refs[0]

        @pl.when(s == 0)
        def _():
            xout_ref[:] = acc_ref[:]

    sumd = max(1, sum(PROF))
    off = [0]
    for d in PROF:
        off.append(off[-1] + d)
    k = scal_ref[0, 0]
    for sb in range(GB):
        wins = [slots_ref[sb, t] for t in range(S)]
        r0 = rel_ref[(sb * 2) * 8:(sb * 2) * 8 + 8, :]
        r1 = rel_ref[(sb * 2 + 1) * 8:(sb * 2 + 1) * 8 + 8, :]
        a0x, a0y, a0z = _gather_xyz(xin_ref, wins, r0, S)
        a1x, a1y, a1z = _gather_xyz(xin_ref, wins, r1, S)

        # GatherEdgesForParticle (SoftBodySolver.cs:395-433):
        # lambda = -k * (len - rest) / (wa + wb); contribution to a is
        # n * lambda * wa, to b is -n * lambda * wb; both endpoints' counts
        # bump when the edge is valid.
        dx = a0x - a1x
        dy = a0y - a1y
        dz = a0z - a1z
        len2 = dx * dx + dy * dy + dz * dz
        # v7: wsum streamed (w-fill prologue), not gathered per pass
        w = w_ref[sb * 8:sb * 8 + 8, :]
        valid = (w != 0.0) & (len2 >= 1e-18)
        ln = jnp.sqrt(jnp.maximum(len2, 1e-30))
        c = ln - rest_ref[sb * 8:sb * 8 + 8, :]
        # PERK: per-constraint stiffness tile (mixed-material merged
        # scenes); the scalar then acts as a runtime multiplier.
        kk = k * k_ref[sb * 8:sb * 8 + 8, :] if PERK else k
        lam = jnp.where(valid, -kk * c / jnp.where(w == 0.0, 1.0, w), 0.0)
        # v6 scatter: ONE source per component (n*lam = d*(lam/len)) and a
        # signed target-side weight -- the endpoint's inverse mass IS the
        # target lane's w (sublane 3 of the window, read from the frozen
        # xin snapshot), so per-role source tiles and the role demux
        # disappear (kernels/sweep.py edge kernel has the derivation).
        sl = lam / ln
        sx, sy, sz = dx * sl, dy * sl, dz * sl
        cn = jnp.where(valid, 1.0, 0.0)

        for t in range(S):
            if PROF[t] == 0:
                continue
            w8 = jnp.broadcast_to(
                xin_ref[3:4, pl.ds(wins[t] * LANES, LANES)], (8, LANES))
            ax = ay = az = ac = jnp.zeros((8, LANES), jnp.float32)
            for l in range(PROF[t]):
                row = (sb * sumd + off[t] + l) * 8
                inv = inv_ref[row:row + 8, :]
                has = inv >= 0
                jl = inv & (LANES - 1)       # -1 -> 127, masked by sf=0
                sf = jnp.where(has,
                               jnp.where(inv >= LANES, -1.0, 1.0), 0.0)
                factor = sf * w8
                ax = ax + jnp.take_along_axis(sx, jl, axis=1) * factor
                ay = ay + jnp.take_along_axis(sy, jl, axis=1) * factor
                az = az + jnp.take_along_axis(sz, jl, axis=1) * factor
                gc = jnp.take_along_axis(cn, jl, axis=1)  # same either role
                ac = ac + jnp.where(has, gc, 0.0)
            _scatter_acc4(xout_ref, wins[t], ax, ay, az, ac)

    if FINAL:
        @pl.when(s == NSTEP - 1)
        def _():
            _apply_epilogue(xin_ref, xout_ref, scal_ref[0, 1])


def _tet_pass_kernel(scal_ref, slots_ref, rel_ref, inv_ref, rest_ref,
                     k_ref, w_ref, xin_ref, *refs, S, PROF, NSTEP, GB,
                     PERK, INIT=True, FINAL=True):
    xout_ref = refs[-1]
    s = pl.program_id(0)

    if INIT:
        @pl.when(s == 0)
        def _():
            xout_ref[:] = jnp.zeros_like(xout_ref)
    else:
        acc_ref = refs[0]

        @pl.when(s == 0)
        def _():
            xout_ref[:] = acc_ref[:]

    sumd = max(1, sum(PROF))
    off = [0]
    for d in PROF:
        off.append(off[-1] + d)
    k = scal_ref[0, 0]
    sixth = jnp.float32(1.0 / 6.0)
    for sb in range(GB):
        wins = [slots_ref[sb, t] for t in range(S)]
        acc = []
        for r in range(4):
            rel = rel_ref[(sb * 4 + r) * 8:(sb * 4 + r) * 8 + 8, :]
            acc.append(_gather_xyz(xin_ref, wins, rel, S))
        (pax, pay, paz), (pbx, pby, pbz), \
            (pcx, pcy, pcz), (pdx, pdy, pdz) = acc
        # v7: per-role inverse masses streamed (w-fill prologue)
        wa = w_ref[(sb * 4 + 0) * 8:(sb * 4 + 0) * 8 + 8, :]
        wb = w_ref[(sb * 4 + 1) * 8:(sb * 4 + 1) * 8 + 8, :]
        wc = w_ref[(sb * 4 + 2) * 8:(sb * 4 + 2) * 8 + 8, :]
        wd = w_ref[(sb * 4 + 3) * 8:(sb * 4 + 3) * 8 + 8, :]

        # GatherVolumesForParticle (SoftBodySolver.cs:451-519): role
        # gradients, lambda = -k * (vol - rest) / wsum, contribution per
        # role g_r * lambda * w_r; count bumps only for corners with
        # w_r != 0 on valid tets.
        def cross(ax_, ay_, az_, bx_, by_, bz_):
            return (ay_ * bz_ - az_ * by_, az_ * bx_ - ax_ * bz_,
                    ax_ * by_ - ay_ * bx_)

        gax, gay, gaz = cross(pdx - pbx, pdy - pby, pdz - pbz,
                              pcx - pbx, pcy - pby, pcz - pbz)
        gbx, gby, gbz = cross(pcx - pax, pcy - pay, pcz - paz,
                              pdx - pax, pdy - pay, pdz - paz)
        gcx, gcy, gcz = cross(pdx - pax, pdy - pay, pdz - paz,
                              pbx - pax, pby - pay, pbz - paz)
        gdx, gdy, gdz = cross(pbx - pax, pby - pay, pbz - paz,
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

        vol = (gdx * (pdx - pax) + gdy * (pdy - pay) + gdz * (pdz - paz))
        cfn = vol - rest_ref[sb * 8:sb * 8 + 8, :]
        kk = k * k_ref[sb * 8:sb * 8 + 8, :] if PERK else k
        lam = jnp.where(
            valid, -kk * cfn / jnp.where(wsum == 0.0, 1.0, wsum), 0.0)

        sa, sb_, sc, sd = lam * wa, lam * wb, lam * wc, lam * wd
        comps = (
            (gax * sa, gbx * sb_, gcx * sc, gdx * sd),
            (gay * sa, gby * sb_, gcy * sc, gdy * sd),
            (gaz * sa, gbz * sb_, gcz * sc, gdz * sd),
        )
        # cnt trick (v6): a corner's count bumps iff the tet is valid AND
        # that corner's w != 0 -- but the corner IS the scatter target, so
        # the w test moves to the target side (w8 != 0) and the cnt source
        # collapses from four per-role tiles to ONE validity tile.
        validf = jnp.where(valid, 1.0, 0.0)

        for t in range(S):
            if PROF[t] == 0:
                continue
            wnz = jnp.where(
                xin_ref[3:4, pl.ds(wins[t] * LANES, LANES)] != 0.0, 1.0, 0.0)
            wnz8 = jnp.broadcast_to(wnz, (8, LANES))
            accs = [jnp.zeros((8, LANES), jnp.float32) for _ in range(4)]
            for l in range(PROF[t]):
                row = (sb * sumd + off[t] + l) * 8
                inv = inv_ref[row:row + 8, :]
                has = inv >= 0
                hi = inv >= 2 * LANES
                odd = (inv & LANES) > 0
                jl = inv & (LANES - 1)
                for ci in range(3):
                    ca, cb, cc, cd = comps[ci]
                    g_ab = jnp.where(odd,
                                     jnp.take_along_axis(cb, jl, axis=1),
                                     jnp.take_along_axis(ca, jl, axis=1))
                    g_cd = jnp.where(odd,
                                     jnp.take_along_axis(cd, jl, axis=1),
                                     jnp.take_along_axis(cc, jl, axis=1))
                    pick = jnp.where(hi, g_cd, g_ab)
                    accs[ci] = accs[ci] + jnp.where(has, pick, 0.0)
                hasf = jnp.where(has, 1.0, 0.0)
                accs[3] = accs[3] + (jnp.take_along_axis(validf, jl, axis=1)
                                     * (hasf * wnz8))
            _scatter_acc4(xout_ref, wins[t], accs[0], accs[1], accs[2],
                          accs[3])

    if FINAL:
        @pl.when(s == NSTEP - 1)
        def _():
            _apply_epilogue(xin_ref, xout_ref, scal_ref[0, 1])


def _make_jacobi_pass_grouped(plan: SuperPlan, num_windows: int, *,
                              interpret: bool = False,
                              per_constraint_k=None, apply: bool = True,
                              ragged: bool = True):
    """Grouped build: one trimmed pallas_call per execution group
    (sweep.regroup_plan), threading the (delta, cnt) accumulator table
    through the group sequence.  Jacobi is snapshot-Jacobi, so group order
    is irrelevant to the physics -- grouping only trims each kernel's
    unrolled slot/layer caps to its group's occupancy.  Group 0 zeroes the
    accumulator, the last group applies the epilogue; intermediate
    accumulators alias input->output so no extra HBM buffer is allocated.

    ragged / fill_w: same v7 design as the sweep kernels (see
    kernels/sweep.py) -- slots sorted by layer occupancy, per-slot-position
    static layer profiles, and streamed inverse-mass tables appended by
    ``pass.fill_w(x8, pass.tables)`` once per jitted program.
    """
    if ragged:
        plan = _slot_sort(plan)
    S, D, a = plan.nslots, plan.dmax, plan.arity
    nb = plan.num_super
    vpad = num_windows * LANES
    kernel = _edge_pass_kernel if a == 2 else _tet_pass_kernel
    wrows = 8 if a == 2 else 4 * 8
    perk = per_constraint_k is not None

    from .sweep import pack_lambda

    k_full = (pack_lambda(plan, jnp.asarray(per_constraint_k, jnp.float32))
              if perk else None)
    inv5 = plan.inv.reshape(nb, S, D, 8, LANES)
    occ5 = inv5 >= 0

    groups = plan.groups or ((nb, S, D),)
    calls, fills, tabs_all = [], [], []
    b0 = 0
    ng = len(groups)
    for gi, (nbg, Sg, Dg) in enumerate(groups):
        b1 = b0 + nbg
        gb = min(SUBBLOCKS, nbg)
        nstep = nbg // gb
        first, last = gi == 0, gi == ng - 1
        if ragged:
            lay = occ5[b0:b1, :Sg].any(axis=(3, 4))
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
        w_spec = pl.BlockSpec((gb * wrows, LANES), lambda s: (s, 0),
                              memory_space=pltpu.VMEM)
        if perk:
            ktab = k_full[b0 * 8:b1 * 8]
            k_spec = pl.BlockSpec((gb * 8, LANES), lambda s: (s, 0),
                                  memory_space=pltpu.VMEM)
        else:
            ktab = jnp.zeros((gb * 8, LANES), jnp.float32)
            k_spec = pl.BlockSpec((gb * 8, LANES), lambda s: (0, 0),
                                  memory_space=pltpu.VMEM)
        slots_spec = pl.BlockSpec((gb, LANES), lambda s: (s, 0),
                                  memory_space=pltpu.SMEM)
        rel_spec = pl.BlockSpec((gb * a * 8, LANES), lambda s: (s, 0),
                                memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((1, 2), lambda s: (0, 0), memory_space=pltpu.SMEM),
            slots_spec, rel_spec,
            pl.BlockSpec((gb * sumd * 8, LANES), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb * 8, LANES), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            k_spec, w_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        kwargs = {}
        if not first:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            kwargs["input_output_aliases"] = {8: 0}
        call = pl.pallas_call(
            functools.partial(kernel, S=Sg, PROF=prof, NSTEP=nstep, GB=gb,
                              PERK=perk, INIT=first, FINAL=last and apply),
            grid=(nstep,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, vpad), jnp.float32),
            interpret=interpret,
            **kwargs,
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
        )
        calls.append(call)
        fills.append(fill)
        tabs_all.append((
            jnp.asarray(plan.slots[b0:b1]),
            jnp.asarray(plan.rel[b0 * a * 8:b1 * a * 8]),
            jnp.asarray(invr),
            jnp.asarray(plan.rest[b0 * 8:b1 * 8]),
            ktab,
        ))
        b0 = b1

    def fill_w(x8, tables):
        """Append the streamed inverse-mass tables (once per program).
        The fill kernel's count input (mass splitting, xpbd only) is fed
        in-jit ones here: the jacobi dialect always streams plain w."""
        return tuple(
            tabs[:5] + (fc(tabs[0], tabs[1],
                           jnp.ones(tabs[1].shape, jnp.float32), x8),)
            for fc, tabs in zip(fills, tables))

    def jacobi_pass(x8, k, omega, tables):
        scal = jnp.stack([jnp.asarray(k, jnp.float32),
                          jnp.asarray(omega, jnp.float32)]).reshape(1, 2)
        acc = None
        for gi, (call, tabs) in enumerate(zip(calls, tables)):
            slots, rel, inv, rest, ktab, wtab = tabs
            if gi == 0:
                acc = call(scal, slots, rel, inv, rest, ktab, wtab, x8)
            else:
                acc = call(scal, slots, rel, inv, rest, ktab, wtab, x8, acc)
        return acc

    jacobi_pass.tables = tuple(tabs_all)
    jacobi_pass.fill_w = fill_w
    jacobi_pass.per_constraint = perk
    jacobi_pass.grouped = True
    return jacobi_pass


def make_jacobi_pass(plan: SuperPlan, num_windows: int, *,
                     interpret: bool = False, per_constraint_k=None,
                     apply: bool = True):
    """Build ``pass(x8, k, omega, tables) -> x8``: one full Jacobi
    gather+apply stage for one constraint family on the (8, Vpad) particle
    table.

    apply=False skips the in-kernel epilogue and returns the RAW
    accumulator table (rows 0-2 delta, row 3 cnt, rows 4-7 zero) instead
    of the applied positions -- the sharded path homes ghost-window
    accumulator strips to their owners and applies omega/cnt on the local
    shard afterwards (solver/jacobi_pallas_sharded.py).

    k is the family stiffness, omega the SOR factor (both traced f32
    scalars).  The pass reads the frozen x8 snapshot, so calling edge and
    tet passes in sequence reproduces the reference's per-iteration
    dispatch order exactly.

    per_constraint_k: optional (N,) public-order stiffness per constraint
    (mixed-material merged scenes -- the reference's per-SoftBodySolver
    stiffness, SoftBodySolver.cs inspector fields).  When given, the
    scalar k becomes a runtime multiplier on the packed table.

    ``tables`` is the pass's own ``.tables`` attribute (slots/rel/inv/rest
    device arrays), threaded through the caller's jit as ARGUMENTS: at
    100k-constraint scale the packed plans are >100 MB, and closure-
    captured tables would be lowered as HLO literals -- ~40 s of trace+
    lower and a 47 MB compile-cache entry per program (measured on the
    BatchTest step).  As parameters they cost nothing at trace time.
    """
    if not isinstance(plan, SuperPlan):
        raise TypeError("jacobi passes require SuperPlan packing")
    if plan.groups:
        return _make_jacobi_pass_grouped(
            plan, num_windows, interpret=interpret,
            per_constraint_k=per_constraint_k, apply=apply)
    # ungrouped: one synthetic group, flat contract, dense inv layout (the
    # sharded path stacks per-device plan arrays directly)
    g = _make_jacobi_pass_grouped(
        plan, num_windows, interpret=interpret,
        per_constraint_k=per_constraint_k, apply=apply, ragged=False)

    def jacobi_pass(x8, k, omega, tables):
        return g(x8, k, omega, (tables,))

    def fill_w(x8, tables):
        return g.fill_w(x8, (tables,))[0]

    jacobi_pass.tables = g.tables[0]
    jacobi_pass.fill_w = fill_w
    jacobi_pass.per_constraint = g.per_constraint
    jacobi_pass.grouped = False
    return jacobi_pass
