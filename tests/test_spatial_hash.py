"""Spatial-hash self/inter-body collision (BASELINE config #4)."""

import numpy as np
import jax.numpy as jnp

from softbodysim_tpu import Engine, SolverParams
from softbodysim_tpu.core import meshes
from softbodysim_tpu.core.adjacency import combine_topologies
from softbodysim_tpu.solver.spatial import self_collision_deltas

DT = 1.0 / 60.0


def brute_force_deltas(p, w, radius):
    n = len(p)
    delta = np.zeros_like(p)
    min_dist = 2 * radius
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = p[i] - p[j]
            dist2 = float(d @ d)
            if dist2 >= min_dist * min_dist or dist2 <= 1e-18:
                continue
            dist = np.sqrt(dist2)
            nvec = d / dist
            wsum = w[i] + w[j]
            share = w[i] / wsum if wsum > 0 else 0.0
            delta[i] += nvec * (min_dist - dist) * share
    return delta


def test_deltas_match_brute_force():
    rng = np.random.default_rng(0)
    p = rng.uniform(0, 0.5, (60, 3)).astype(np.float32)
    w = rng.uniform(0.5, 2.0, (60,)).astype(np.float32)
    w[::9] = 0.0
    r = 0.05
    got = np.asarray(self_collision_deltas(
        jnp.asarray(p), jnp.asarray(w), r, cell_size=2 * r, max_per_cell=32))
    want = brute_force_deltas(p, w, r)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_overlapping_particles_separate():
    # two particles closer than 2r get pushed apart symmetrically
    p = jnp.asarray([[0.0, 0.0, 0.0], [0.05, 0.0, 0.0]], jnp.float32)
    w = jnp.ones((2,), jnp.float32)
    d = np.asarray(self_collision_deltas(p, w, 0.05, 0.1, 8))
    assert d[0, 0] < -1e-3 and d[1, 0] > 1e-3
    np.testing.assert_allclose(d[0], -d[1], atol=1e-6)


def test_interbody_collision_in_merged_scene():
    """Two balls dropped onto the same spot: with spatial-hash collision in
    a merged scene they stack instead of interpenetrating."""
    a = meshes.tet_ball(1, 0.15, (0.0, 0.35, 0.0))
    b = meshes.tet_ball(1, 0.15, (0.02, 0.9, 0.0))
    merged, slices = combine_topologies([a, b])

    radius = 0.04
    on = SolverParams(dialect="jacobi", substeps=2, iterations=6,
                      particle_radius=radius, gravity=(0, -10.0, 0),
                      self_collision=True, self_collision_cell=2 * radius,
                      self_collision_max_per_cell=16, use_pallas="off")
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

    # without collision the balls interpenetrate (centers nearly coincide);
    # with it they stay separated (stacked or rolled apart -- the exact
    # arrangement is chaotic, only non-penetration is deterministic)
    sep_on = np.linalg.norm(cb_on - ca_on)
    sep_off = np.linalg.norm(cb_off - ca_off)
    assert sep_off < 0.12          # interpenetrating
    assert sep_on > 0.22           # separated ~2 ball radii


def test_overflow_counter_and_autosize():
    """Dense pile: default-style small cap drops candidates (non-zero
    overflow); the autosized cap reports zero dropped (VERDICT weak #5)."""
    import numpy as np
    import jax.numpy as jnp
    from softbodysim_tpu.solver.spatial import (
        self_collision_deltas, required_max_per_cell)

    rng = np.random.default_rng(0)
    # 400 particles crammed into ~2 cells of size 0.2
    p = rng.uniform(0, 0.25, (400, 3)).astype(np.float32)
    w = np.ones(400, np.float32)

    _, dropped_small = self_collision_deltas(
        jnp.asarray(p), jnp.asarray(w), 0.01, 0.2, 8, return_overflow=True)
    assert int(dropped_small) > 0

    cap = required_max_per_cell(p, 0.2)
    assert cap >= 100
    deltas, dropped_fit = self_collision_deltas(
        jnp.asarray(p), jnp.asarray(w), 0.01, 0.2, cap, return_overflow=True)
    assert int(dropped_fit) == 0
    assert np.isfinite(np.asarray(deltas)).all()


def test_cap_autosize_from_rest_positions():
    """self_collision_max_per_cell=0 autosizes at solver build time (2x
    the rest-position bucket occupancy, floor 8) on every backend that
    runs the stage, including the Pallas row layouts (which size off the
    parked-lane layout with the row-count table size)."""
    topo = meshes.tet_cube(3, 3, 3, size=0.5, center=(0.0, 0.3, 0.0))
    kw = dict(gravity=(0.0, -10.0, 0.0), particle_radius=0.15,
              self_collision=True, self_collision_cell=0.3,
              self_collision_max_per_cell=0, substeps=1, iterations=2)
    dt = 1.0 / 60.0

    engines = [
        Engine(topo, SolverParams(dialect="jacobi", jacobi_backend="pallas",
                                  use_pallas="off", **kw)),
        Engine(topo, SolverParams(dialect="jacobi",
                                  jacobi_backend="gather", **kw)),
        Engine(topo, SolverParams(dialect="xpbd",
                                  xpbd_backend="gather", **kw)),
        Engine(topo, SolverParams(dialect="xpbd",
                                  xpbd_backend="pallas", **kw)),
    ]
    off = Engine(topo, SolverParams(dialect="xpbd", xpbd_backend="gather",
                                    gravity=(0.0, -10.0, 0.0),
                                    particle_radius=0.15,
                                    substeps=1, iterations=2))
    for _ in range(4):
        for e in engines:
            e.step(dt)
        off.step(dt)
    # the stage fired on every backend (autosized cap did not truncate to
    # nothing): the overlapping lattice expands vs the stage-off control
    for e in engines:
        assert np.abs(e.positions() - off.positions()).max() > 1e-3
        assert np.isfinite(e.positions()).all()
