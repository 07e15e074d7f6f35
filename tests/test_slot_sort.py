"""_slot_sort (kernels/sweep.py) mapping invariants -- pure host, no pallas.

_slot_sort permutes each super-block's slot POSITIONS (descending by
scatter-layer count) and rewrites rel's slot bits and inv's slot axis to
match; constraint order, perm, scale, pos_of and the block's WINDOW SET
must be untouched.  The v7 ragged kernels derive their static PROF
profiles from the sorted plan, so a mapping bug here corrupts physics
silently (the kernels would gather/scatter the wrong vertices).  These
checks decode both plans to (constraint -> vertex) and
(target-vertex <- source-constraint-lane, role) relations and require
exact equality -- the discipline the grouped-parity tests can't provide
(they compare fp results, which reassociate at the ULP level).
"""

import numpy as np
import pytest

from softbodysim_tpu.core import meshes
from softbodysim_tpu.kernels import sweep as sw
from softbodysim_tpu.kernels.sweep import _slot_sort


def _plan_for(topo, family):
    V = topo.num_particles
    nwin = -(-V // sw.LANES)
    if family == "edge":
        cons, rest, lcap = topo.edges, topo.edge_rest, 2
    else:
        cons, rest, lcap = topo.tets, topo.tet_rest_vol, 3
    plan = sw.pack_superblocks(np.asarray(cons, np.int64), rest, nwin,
                               slots_cap=8, layer_cap=lcap)
    return plan


def _decode_gather(plan):
    """(nb*a*8, LANES) rel -> per (role, packed position) vertex id."""
    nb, a, S = plan.num_super, plan.arity, plan.nslots
    rel = plan.rel.reshape(nb, a, 8, sw.LANES)
    slotpos = rel >> 7
    lane = rel & (sw.LANES - 1)
    wins = np.take_along_axis(
        np.broadcast_to(plan.slots[:, None, None, :S],
                        (nb, a, 8, S)), slotpos, axis=3)
    return wins * sw.LANES + lane            # (nb, a, 8, LANES) vertex ids


def _decode_scatter(plan):
    """inv -> set of (target vertex, source block, sublane, lane, role)."""
    nb, S, D = plan.num_super, plan.nslots, plan.dmax
    inv = plan.inv.reshape(nb, S, D, 8, sw.LANES)
    b, t, d, g, l = np.nonzero(inv >= 0)
    code = inv[b, t, d, g, l]
    tgt = plan.slots[b, t] * sw.LANES + l
    src_lane = code & (sw.LANES - 1)
    role = code >> 7
    rows = np.stack([tgt, b, g, src_lane, role], axis=1)
    return set(map(tuple, rows.tolist()))


@pytest.mark.quick
@pytest.mark.parametrize("family", ["edge", "tet"])
def test_slot_sort_preserves_mapping(family):
    topo = meshes.tet_cube(9, 9, 9, size=1.0, center=(0.0, 1.0, 0.0))
    plan = _plan_for(topo, family)
    ps = _slot_sort(plan)

    # untouched fields
    for fld in ("perm", "pos_of", "rest", "scale"):
        assert np.array_equal(getattr(plan, fld), getattr(ps, fld)), fld
    S = plan.nslots
    assert np.array_equal(plan.slots[:, S:], ps.slots[:, S:])  # used counts
    # each block's window SET is a permutation of the original
    assert np.array_equal(np.sort(plan.slots[:, :S], axis=1),
                          np.sort(ps.slots[:, :S], axis=1))

    # gather relation: every (role, packed position) resolves to the SAME
    # vertex id through the rewritten (slot, lane) encoding
    assert np.array_equal(_decode_gather(plan), _decode_gather(ps))

    # scatter relation: identical (target vertex <- source lane, role)
    # multiset (layers within a slot keep their order; set equality plus
    # equal cardinality == multiset equality since entries are unique)
    a_np, b_np = _decode_scatter(plan), _decode_scatter(ps)
    assert (plan.inv >= 0).sum() == (ps.inv >= 0).sum()
    assert a_np == b_np

    # sortedness: within each block's used prefix, layer counts descend
    inv5 = ps.inv.reshape(ps.num_super, S, ps.dmax, 8, sw.LANES)
    lay = (inv5 >= 0).any(axis=(3, 4))
    d_bs = np.where(lay.any(axis=2),
                    ps.dmax - np.argmax(lay[:, :, ::-1], axis=2), 0)
    used = ps.slots[:, S]
    for bi in range(ps.num_super):
        u = int(used[bi])
        prof = d_bs[bi, :u]
        assert (np.diff(prof) <= 0).all(), (bi, prof)


@pytest.mark.quick
def test_slot_sort_idempotent_and_stable():
    topo = meshes.tet_cube(7, 7, 7, size=0.8, center=(0.0, 1.0, 0.0))
    plan = _plan_for(topo, "edge")
    ps = _slot_sort(plan)
    ps2 = _slot_sort(ps)
    for fld in ("slots", "rel", "inv"):
        assert np.array_equal(getattr(ps, fld), getattr(ps2, fld)), fld
