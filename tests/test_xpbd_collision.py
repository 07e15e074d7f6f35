"""Self / surface collision on the XPBD dialect (server contract) paths.

The reference server only clamps against the ground plane
(CProgram/src/Sim.cpp:208-213); spatial-hash self-collision and
vertex-triangle surface collision are jacobi-dialect extensions that round 3
lifted onto the xpbd dialect too -- same per-iteration slot (edge -> tet ->
ground/colliders -> self -> surface), same solver/spatial.py machinery.
"""

import numpy as np
import pytest

from softbodysim_tpu import Engine, SolverParams
from softbodysim_tpu.core import meshes
from softbodysim_tpu.core.adjacency import combine_topologies

DT = 1.0 / 60.0


def _params(**kw):
    base = dict(dialect="xpbd", substeps=2, iterations=4,
                gravity=(0.0, -10.0, 0.0))
    base.update(kw)
    return SolverParams(**base)


_SC = dict(particle_radius=0.04, self_collision=True,
           self_collision_cell=0.08, self_collision_max_per_cell=16)


def test_xpbd_interbody_collision_merged_scene():
    """Two balls dropped onto the same spot under the xpbd dialect: with
    spatial-hash collision they stack instead of interpenetrating (the
    same behavioral contract as the jacobi test in test_spatial_hash)."""
    a = meshes.tet_ball(1, 0.15, (0.0, 0.35, 0.0))
    b = meshes.tet_ball(1, 0.15, (0.02, 0.9, 0.0))
    merged, slices = combine_topologies([a, b])

    on = _params(substeps=2, iterations=6, **_SC)
    off = on.replace(self_collision=False)

    def centers(eng):
        pos = eng.positions()
        return pos[slices[0]].mean(axis=0), pos[slices[1]].mean(axis=0)

    e_on = Engine(merged, on)
    e_off = Engine(merged, off)
    for _ in range(150):
        e_on.step(DT)
        e_off.step(DT)

    ca_on, cb_on = centers(e_on)
    ca_off, cb_off = centers(e_off)
    # ball diameter 0.3: off leaves the centers overlapped (~0.25 measured);
    # on pushes them at least past touching (~2.1 measured -- they roll
    # apart on the ground)
    assert np.linalg.norm(cb_off - ca_off) < 0.27   # interpenetrating
    assert np.linalg.norm(cb_on - ca_on) > 0.32     # separated


def test_xpbd_scatter_gather_agree_with_self_collision():
    """Both colored XLA backends run the identical GS ordering; the self
    stage must not break their fp-level agreement."""
    topo = meshes.tet_cube(3, 3, 3, size=0.5, center=(0.0, 0.3, 0.0))
    kw = dict(particle_radius=0.15, self_collision=True,
              self_collision_cell=0.3, self_collision_max_per_cell=128)
    a = Engine(topo, _params(xpbd_backend="gather", **kw))
    b = Engine(topo, _params(xpbd_backend="scatter", **kw))
    c = Engine(topo, _params(xpbd_backend="gather"))   # stage-off control
    for _ in range(12):
        a.step(DT)
        b.step(DT)
        c.step(DT)
    assert np.abs(a.positions() - c.positions()).max() > 1e-3   # stage fired
    np.testing.assert_allclose(a.positions(), b.positions(), atol=2e-5)


def test_spatial_stage_layout_equivalence_with_dead_lanes():
    """The exact contract the Pallas row layout relies on, tested
    deterministically at the stage level: embedding the particles into a
    padded slot layout with dead lanes parked in far-away iso cells (the
    same parking formula as solver/xpbd_pallas.py) changes NOTHING --
    dead lanes receive exactly zero delta and live lanes match the public
    layout to fp-summation noise (the hash table size and argsort order
    are layout-dependent, so bitwise equality is not expected)."""
    from softbodysim_tpu.solver.spatial import self_collision_deltas

    rng = np.random.default_rng(0)
    V, vpad = 64, 128
    cell, radius, cap = 0.3, 0.15, 128
    p = rng.uniform(-0.4, 0.4, (V, 3)).astype(np.float32)
    w = rng.uniform(0.5, 2.0, V).astype(np.float32)
    w[:5] = 0.0                                   # some pinned

    slots = rng.permutation(vpad)[:V]             # random embedding
    perm = np.full(vpad, V, np.int64)
    perm[slots] = np.arange(V)
    dead = perm == V
    spacing = 2.0 * max(cell, 2.0 * radius)
    x_rows = np.zeros((vpad, 3), np.float32)
    x_rows[slots] = p
    x_rows[dead, 0] = 1e6 * cell + np.arange(vpad)[dead] * spacing
    w_rows = np.zeros(vpad, np.float32)
    w_rows[slots] = w

    import jax.numpy as jnp

    d_pub = np.asarray(self_collision_deltas(
        jnp.asarray(p), jnp.asarray(w), radius, cell, cap))
    d_rows = np.asarray(self_collision_deltas(
        jnp.asarray(x_rows), jnp.asarray(w_rows), radius, cell, cap))
    assert np.abs(d_pub).max() > 0.1              # stage actually fired
    assert np.abs(d_rows[dead]).max() == 0.0      # dead lanes fully inert
    np.testing.assert_allclose(d_rows[slots], d_pub, atol=1e-6)


def test_xpbd_pallas_self_collision_one_step_matches_gather():
    """E2e wiring pin for the sweep path's self-collision slot: one step
    with compliance huge (constraint projections <1e-10, removing the
    block-synchronous vs colored-GS ordering difference) must match the
    XLA gather backend -- predict -> ground -> self -> commit is all that
    remains.  Measured agreement 3e-8; a dead-lane interaction or missed
    pair would show at the 0.01+ push scale.  ONE step only: this config
    (min_dist 2x the lattice spacing, no constraints) is an exploding
    particle gas that dynamically creates near-coincident pairs, whose
    push direction is fp-noise-determined (spatial.py docstring) -- at
    step 2+ the backends legitimately diverge."""
    topo = meshes.tet_cube(3, 3, 3, size=0.5, center=(0.0, 0.3, 0.0))
    kw = dict(particle_radius=0.15, self_collision=True,
              self_collision_cell=0.3, self_collision_max_per_cell=128,
              edge_compliance=1e6, volume_compliance=1e6,
              substeps=1, iterations=1)
    a = Engine(topo, _params(xpbd_backend="pallas", **kw))
    b = Engine(topo, _params(xpbd_backend="gather", **kw))
    c = Engine(topo, _params(xpbd_backend="gather",
                             edge_compliance=1e6, volume_compliance=1e6,
                             substeps=1, iterations=1))  # stage-off control
    a.step(DT)
    b.step(DT)
    c.step(DT)
    assert np.abs(b.positions() - c.positions()).max() > 1e-3  # stage fired
    np.testing.assert_allclose(a.positions(), b.positions(), atol=1e-5)
    np.testing.assert_allclose(a.velocities(), b.velocities(), atol=1e-3)


def test_xpbd_pallas_self_collision_behavioral():
    """End-to-end on the sweep path with real constraints: overlapping
    lattice (radius > spacing) must expand vs the stage-off control."""
    topo = meshes.tet_cube(3, 3, 3, size=0.5, center=(0.0, 0.3, 0.0))
    kw = dict(particle_radius=0.15, self_collision=True,
              self_collision_cell=0.3, self_collision_max_per_cell=128,
              substeps=1, iterations=2)
    on = Engine(topo, _params(xpbd_backend="pallas", **kw))
    off = Engine(topo, _params(xpbd_backend="pallas", substeps=1,
                               iterations=2, particle_radius=0.15))
    for _ in range(8):
        on.step(DT)
        off.step(DT)

    def spread(eng):
        p = eng.positions()
        return np.linalg.norm(p - p.mean(axis=0), axis=1).mean()

    assert spread(on) > spread(off) + 1e-3


def test_xpbd_surface_collision_behavioral():
    """Two slightly-overlapping balls under the xpbd dialect with
    surface_collision on: surfaces push apart (cell autosized)."""
    b1 = meshes.tet_ball(1, 0.25, (0.0, 0.5, 0.0))
    b2 = meshes.tet_ball(1, 0.25, (0.42, 0.5, 0.0))
    merged, slices = combine_topologies([b1, b2])

    on = _params(gravity=(0.0, 0.0, 0.0), ground_enabled=False,
                 surface_collision=True, surface_thickness=0.06,
                 surface_collision_max_per_cell=64)
    off = on.replace(surface_collision=False)

    def sep(eng):
        p = eng.positions()
        return np.linalg.norm(p[slices[1]].mean(0) - p[slices[0]].mean(0))

    e_on = Engine(merged, on)
    e_off = Engine(merged, off)
    for _ in range(40):
        e_on.step(DT)
        e_off.step(DT)
    assert sep(e_on) > sep(e_off) + 0.01


def test_xpbd_pallas_surface_collision_one_step_matches_gather():
    """E2e wiring pin for the sweep path's surface-collision slot (triangle
    corner ids remapped old->row, dead lanes parked far away): one step
    with compliance huge (constraint projections <1e-10, removing the
    block-synchronous vs colored-GS ordering difference) must match the
    XLA gather backend -- predict -> surface -> commit is all that
    remains.  The balls overlap within surface_thickness at t=0 so the
    stage fires immediately; max_per_cell covers every hash bucket on
    both layouts so the hit sets are identical."""
    b1 = meshes.tet_ball(1, 0.25, (0.0, 0.5, 0.0))
    b2 = meshes.tet_ball(1, 0.25, (0.42, 0.5, 0.0))
    merged, _ = combine_topologies([b1, b2])
    kw = dict(gravity=(0.0, 0.0, 0.0), ground_enabled=False,
              surface_collision=True, surface_thickness=0.06,
              surface_collision_max_per_cell=256,
              edge_compliance=1e6, volume_compliance=1e6,
              substeps=1, iterations=1)
    a = Engine(merged, _params(xpbd_backend="pallas", **kw))
    b = Engine(merged, _params(xpbd_backend="gather", **kw))
    c = Engine(merged, _params(
        xpbd_backend="gather", gravity=(0.0, 0.0, 0.0), ground_enabled=False,
        edge_compliance=1e6, volume_compliance=1e6,
        substeps=1, iterations=1))                    # stage-off control
    a.step(DT)
    b.step(DT)
    c.step(DT)
    assert np.abs(b.positions() - c.positions()).max() > 1e-4  # stage fired
    np.testing.assert_allclose(a.positions(), b.positions(), atol=1e-5)
    np.testing.assert_allclose(a.velocities(), b.velocities(), atol=1e-3)


def test_xpbd_pallas_surface_collision_behavioral():
    """End-to-end on the sweep path with real constraints: overlapping
    balls separate vs the stage-off control."""
    b1 = meshes.tet_ball(1, 0.25, (0.0, 0.5, 0.0))
    b2 = meshes.tet_ball(1, 0.25, (0.42, 0.5, 0.0))
    merged, slices = combine_topologies([b1, b2])
    kw = dict(gravity=(0.0, 0.0, 0.0), ground_enabled=False,
              substeps=1, iterations=2)
    on = Engine(merged, _params(
        xpbd_backend="pallas", surface_collision=True,
        surface_thickness=0.06, surface_collision_max_per_cell=64, **kw))
    off = Engine(merged, _params(xpbd_backend="pallas", **kw))

    def sep(eng):
        p = eng.positions()
        return np.linalg.norm(p[slices[1]].mean(0) - p[slices[0]].mean(0))

    for _ in range(6):
        on.step(DT)
        off.step(DT)
    assert sep(on) > sep(off) + 0.005


# (round 3 lifted the self/surface stages onto every sharded backend --
# the old reject-the-flags contract is superseded by the parity tests in
# tests/test_sharding_collision.py and tests/test_pallas_sharded_collision.py)
