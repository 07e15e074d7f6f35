"""Self / surface collision on the sharded Pallas paths.

Round 3 lifted the global spatial-hash stages onto the sharded Pallas
backends (solver/global_stages.py own-slice form: all_gather positions,
query the device's own contiguous layout-row slice, psum surface corner
reactions home).  Contracts tested:

- jacobi: the sharded execution is NOT a dialect change, so with stages on
  it must still match the single-device jacobi Pallas backend at 1e-5
  (same hit set; fp32 summation order differs);
- xpbd: the sharded block dialect is replayed exactly in NumPy
  (test_pallas_sharded.ShardedReplay) extended with an O(N^2) exact-overlap
  self-collision stage -- valid while max_per_cell does not truncate and
  cell_size >= 2*radius (every overlapping pair is in a neighbor cell);
- surface stage: behavioral (two overlapping balls separate vs flags-off).

Reference behavior: the C++ server clamps only against the ground plane
(CProgram/src/Sim.cpp:208-213); these stages are framework extensions and
the contract is self-consistency with the single-device backends.
"""

import numpy as np
import pytest

import jax

from softbodysim_tpu import SolverParams
from softbodysim_tpu.core import meshes
from softbodysim_tpu.core.adjacency import combine_topologies
from softbodysim_tpu.core.state import init_state
from softbodysim_tpu.solver.jacobi_pallas import make_jacobi_pallas_step
from softbodysim_tpu.solver.jacobi_pallas_sharded import (
    make_jacobi_pallas_sharded_step)
from softbodysim_tpu.solver.spatial import park_offsets
from softbodysim_tpu.solver.xpbd_pallas_sharded import (
    make_xpbd_pallas_sharded_step)

from test_pallas_sharded import ShardedReplay, mesh_of

F = np.float32
DT = 1.0 / 60.0

_SC = dict(particle_radius=0.04, self_collision=True,
           self_collision_cell=0.1, self_collision_max_per_cell=32)
_SURF = dict(particle_radius=0.04, surface_collision=True,
             surface_thickness=0.03, surface_collision_max_per_cell=16)


@pytest.fixture(scope="module")
def two_balls():
    a = meshes.tet_ball(1, 0.22, (0.0, 0.35, 0.0))
    b = meshes.tet_ball(1, 0.22, (0.40, 0.42, 0.0))
    merged, _ = combine_topologies([a, b])
    return merged


def test_jacobi_sharded_collision_matches_single(two_balls):
    """Both stages on: sharded jacobi == single-device jacobi Pallas."""
    mesh = mesh_of(4)
    params = SolverParams(dialect="jacobi", substeps=1, iterations=2,
                          jacobi_backend="pallas", use_pallas="off",
                          surface_collision=True, surface_thickness=0.03,
                          surface_collision_max_per_cell=16, **_SC)
    sstep = make_jacobi_pallas_sharded_step(two_balls, params, mesh,
                                            interpret=True)
    ref = make_jacobi_pallas_step(two_balls, params, interpret=True)
    s_state = init_state(two_balls, inv_mass_mode="density")
    r_state = init_state(two_balls, inv_mass_mode="density")
    for _ in range(8):
        s_state = sstep(s_state, DT)
        r_state = ref(r_state, DT)
    np.testing.assert_allclose(np.asarray(s_state.x),
                               np.asarray(r_state.x), atol=1e-5)
    # the stages actually fired: flags-off run diverges
    off = make_jacobi_pallas_step(
        two_balls,
        params.replace(self_collision=False, surface_collision=False),
        interpret=True)
    o_state = init_state(two_balls, inv_mass_mode="density")
    for _ in range(8):
        o_state = off(o_state, DT)
    assert np.abs(np.asarray(o_state.x)
                  - np.asarray(r_state.x)).max() > 1e-3


class ReplayWithSelfCollision(ShardedReplay):
    """ShardedReplay + exact-overlap self-collision stage after ground."""

    def __init__(self, step, state, params):
        super().__init__(step, state, params)
        r = max(1e-6, params.particle_radius)
        dead = self.perm_layout == (len(self.old2new))
        self.iso = park_offsets(dead, float(params.self_collision_cell),
                                r, float(params.surface_thickness))
        self.r = F(r)

    def _self_collide(self):
        p = (self.xs + self.iso).astype(F)
        w = self.w.astype(F)
        d = p[:, None, :] - p[None, :, :]               # (N, N, 3)
        dist2 = (d * d).sum(-1)
        min_dist = F(2.0) * self.r
        n = len(p)
        hit = (dist2 < min_dist * min_dist) & (dist2 > F(1e-18))
        hit &= ~np.eye(n, dtype=bool)
        dist = np.sqrt(np.maximum(dist2, F(1e-18))).astype(F)
        nvec = d / dist[..., None]
        wsum = w[:, None] + w[None, :]
        share = np.where(wsum > 0.0,
                         w[:, None] / np.where(wsum == 0.0, F(1.0), wsum),
                         F(0.0)).astype(F)
        overlap = ((min_dist - dist) * share).astype(F)
        push = nvec * np.where(hit, overlap, F(0.0))[..., None]
        deltas = push.sum(axis=1).astype(F)
        self.xs = np.where((self.w != 0.0)[:, None],
                           self.xs + deltas, self.xs)

    def step(self, dt):
        p = self.params
        ss = max(1, p.substeps)
        sdt = F(dt) / F(ss)
        alpha_e = F(max(0.0, p.edge_compliance)) / (sdt * sdt)
        alpha_t = F(max(0.0, p.volume_compliance)) / (sdt * sdt)
        g = np.asarray(p.gravity, F)
        free = self.w != 0.0
        for _ in range(ss):
            self.vv = np.where(free[:, None], self.vv + g * sdt, self.vv)
            self.xs = np.where(free[:, None], self.xp + self.vv * sdt,
                               self.xp)
            for _ in range(p.iterations):
                if self.efam is not None:
                    self._sweep(self.efam, "e", alpha_e,
                                self._solve_edge_block)
                if self.tfam is not None:
                    self._sweep(self.tfam, "t", alpha_t,
                                self._solve_tet_block)
                if p.ground_enabled:
                    self.xs[:, 1] = np.where(
                        free, np.maximum(self.xs[:, 1], F(p.ground_y)),
                        self.xs[:, 1])
                self._self_collide()
            inv_dt = F(1.0) / sdt
            vel = (self.xs - self.xp) * inv_dt
            if p.ground_enabled:
                fr = F(min(1.0, max(0.0, p.friction)))
                on_g = self.xs[:, 1] <= F(p.ground_y) + F(1e-6)
                vel[:, 0] = np.where(on_g, vel[:, 0] * (F(1.0) - fr),
                                     vel[:, 0])
                vel[:, 2] = np.where(on_g, vel[:, 2] * (F(1.0) - fr),
                                     vel[:, 2])
                vel[:, 1] = np.where(on_g & (vel[:, 1] < 0.0), 0.0,
                                     vel[:, 1])
            self.vv = np.where(free[:, None], vel, 0.0)
            self.xp = np.where(free[:, None], self.xs, self.xp)


@pytest.mark.parametrize("d", [2, 4])
def test_xpbd_sharded_self_collision_matches_replay(two_balls, d):
    mesh = mesh_of(d)
    params = SolverParams(dialect="xpbd", substeps=2, iterations=2, **_SC)
    step = make_xpbd_pallas_sharded_step(two_balls, params, mesh)
    state = init_state(two_balls)
    replay = ReplayWithSelfCollision(step, state, params)
    for _ in range(4):
        state = step(state, DT)
        replay.step(DT)
    np.testing.assert_allclose(np.asarray(state.x), replay.positions(),
                               atol=1e-5)


def test_xpbd_sharded_surface_collision_behavioral():
    """Surface stage on the sharded xpbd Pallas path pushes the two
    overlapping balls apart (vs the flags-off run).  Same geometry as the
    proven single-device behavioral test (test_xpbd_collision.py)."""
    b1 = meshes.tet_ball(1, 0.25, (0.0, 0.5, 0.0))
    b2 = meshes.tet_ball(1, 0.25, (0.42, 0.5, 0.0))
    merged, slices = combine_topologies([b1, b2])
    mesh = mesh_of(4)
    kw = dict(dialect="xpbd", gravity=(0.0, 0.0, 0.0),
              ground_enabled=False, substeps=1, iterations=2)
    on_p = SolverParams(surface_collision=True, surface_thickness=0.06,
                        surface_collision_max_per_cell=64, **kw)
    off_p = SolverParams(**kw)
    on_s = make_xpbd_pallas_sharded_step(merged, on_p, mesh)
    off_s = make_xpbd_pallas_sharded_step(merged, off_p, mesh)
    a = init_state(merged)
    b = init_state(merged)

    def sep(state):
        p = np.asarray(state.x)
        return np.linalg.norm(p[slices[1]].mean(0) - p[slices[0]].mean(0))

    for _ in range(6):
        a = on_s(a, DT)
        b = off_s(b, DT)
    assert np.isfinite(np.asarray(a.x)).all()
    assert sep(a) > sep(b) + 0.005
