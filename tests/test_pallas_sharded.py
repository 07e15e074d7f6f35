"""Multi-chip merged-Pallas sweeps vs an exact NumPy replay (VERDICT #2).

The sharded dialect is deterministic: within a device, block-synchronous
Gauss-Seidel (the single-chip Pallas dialect); across devices, one family
sweep is Jacobi over frozen boundary positions with summed ghost deltas
and a 1/k cross-device dlambda scale.  The replay below follows the
step's own shard_info (per-device packed plans + halo maps) and must
match the shard_map execution at 1e-5 over multiple steps -- the same
contract the XLA sharded modes prove in test_sharding.py.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from softbodysim_tpu import SolverParams
from softbodysim_tpu.core import meshes
from softbodysim_tpu.core.state import init_state
from softbodysim_tpu.solver.xpbd_pallas_sharded import (
    make_xpbd_pallas_sharded_step)

F = np.float32
DT = 1.0 / 60.0


def mesh_of(d):
    devs = jax.devices()[:d]
    if len(devs) < d:
        pytest.skip(f"needs {d} devices")
    return Mesh(np.asarray(devs), axis_names=("model",))


class ShardedReplay:
    """Scalar-faithful replay of the sharded block dialect in layout space."""

    def __init__(self, step, state, params):
        info = step.shard_info
        self.D = info["D"]
        self.wd = info["wd"]
        self.params = params
        self.perm_layout = info["perm_layout"]
        self.old2new = info["old2new"]
        self.efam = info["edges"]
        self.tfam = info["tets"]
        vpad = len(self.perm_layout)
        self.vpad = vpad

        def to_layout(a):
            ap = np.concatenate([np.asarray(a, F),
                                 np.zeros((1, a.shape[1]), F)])
            return ap[self.perm_layout]

        self.xs = to_layout(np.asarray(state.x_star))
        self.xp = to_layout(np.asarray(state.x))
        self.vv = to_layout(np.asarray(state.v))
        self.w = np.concatenate(
            [np.asarray(state.inv_mass), np.zeros(1, F)])[self.perm_layout]
        self.lam = {}
        for name, fam, pub in (("e", self.efam, state.edge_lambda),
                               ("t", self.tfam, state.tet_lambda)):
            if fam is None:
                continue
            lam = np.zeros((self.D, fam.lam_rows * 128), F)
            pub = np.asarray(pub)
            for d in range(self.D):
                live = fam.plans[d].perm >= 0
                lam[d][live] = pub[fam.plans[d].perm[live]]
            self.lam[name] = lam

    # -- family sweeps ----------------------------------------------------
    def _solve_edge_block(self, local, lw, rows, rest, lam, scale, alpha):
        i0, i1 = rows[:, 0], rows[:, 1]
        w0, w1 = lw[i0], lw[i1]
        wsum = w0 + w1
        d = local[i0] - local[i1]
        length = np.sqrt((d * d).sum(-1)).astype(F)
        valid = (wsum != 0.0) & (length >= 1e-12)
        c = length - rest
        denom = wsum + alpha
        dlam = np.where(valid, (-c - alpha * lam)
                        / np.where(denom == 0.0, F(1.0), denom), F(0.0))
        dlam = (dlam * scale).astype(F)
        n = d / np.where(length < 1e-12, F(1.0), length)[:, None]
        corr = n * dlam[:, None]
        np.add.at(local, i0, corr * w0[:, None])
        np.add.at(local, i1, -corr * w1[:, None])
        return lam + dlam

    def _solve_tet_block(self, local, lw, rows, rest, lam, scale, alpha):
        a, b, c_, d_ = (rows[:, r] for r in range(4))
        wa, wb, wc, wd_ = (lw[i] for i in (a, b, c_, d_))
        pa, pb, pc, pd = (local[i] for i in (a, b, c_, d_))
        sixth = F(1.0 / 6.0)
        ga = np.cross(pd - pb, pc - pb) * sixth
        gb = np.cross(pc - pa, pd - pa) * sixth
        gc = np.cross(pd - pa, pb - pa) * sixth
        gd = np.cross(pb - pa, pc - pa) * sixth
        wsum = (wa * (ga * ga).sum(-1) + wb * (gb * gb).sum(-1)
                + wc * (gc * gc).sum(-1) + wd_ * (gd * gd).sum(-1)).astype(F)
        valid = ((wa + wb + wc + wd_) != 0.0) & (wsum >= 1e-20)
        vol = (np.cross(pb - pa, pc - pa) * (pd - pa)).sum(-1) * sixth
        cfn = vol.astype(F) - rest
        denom = wsum + alpha
        dlam = np.where(valid, (-cfn - alpha * lam)
                        / np.where(denom == 0.0, F(1.0), denom), F(0.0))
        dlam = (dlam * scale).astype(F)
        np.add.at(local, a, ga * (wa * dlam)[:, None])
        np.add.at(local, b, gb * (wb * dlam)[:, None])
        np.add.at(local, c_, gc * (wc * dlam)[:, None])
        np.add.at(local, d_, gd * (wd_ * dlam)[:, None])
        return lam + dlam

    def _sweep(self, fam, name, alpha, solve):
        wd, D = self.wd, self.D
        pre = self.xs.copy()
        own_parts = []
        ghost_deltas = np.zeros_like(self.xs)
        for d in range(D):
            l2g = fam.l2g[d]
            gidx = (l2g[:, None] * 128 + np.arange(128)[None, :]).reshape(-1)
            local = pre[gidx].copy()
            lw = self.w[gidx]
            gstart = wd * 128
            ghosts0 = local[gstart:].copy()
            lam = self.lam[name][d]
            pc = fam.packed_cons[d]
            ps = fam.packed_scale[d]
            pr = fam.packed_rest[d]
            for b in range(len(pc) // 1024):
                sl = np.arange(b * 1024, (b + 1) * 1024)
                ids = sl[pc[sl, 0] >= 0]
                if not len(ids):
                    continue
                lam[ids] = solve(local, lw, pc[ids], pr[ids], lam[ids],
                                 ps[ids], alpha)
            own_parts.append(local[:gstart])
            gd = local[gstart:] - ghosts0
            for i in range(fam.gmax):
                if fam.ghost_mask[d, i]:
                    gw = int(l2g[wd + i])
                    ghost_deltas[gw * 128:(gw + 1) * 128] += \
                        gd[i * 128:(i + 1) * 128]
        self.xs = np.concatenate(own_parts) + ghost_deltas

    # -- step -------------------------------------------------------------
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

    def positions(self):
        out = np.empty((len(self.old2new), 3), F)
        out[:] = self.xp[self.old2new[np.arange(len(self.old2new))]] \
            if False else self.xp[self.old2new]
        return out


@pytest.mark.parametrize("d", [2, 4])
def test_sharded_matches_replay(d):
    mesh = mesh_of(d)
    topo = meshes.tet_cube(7, 7, 7, size=0.7, center=(0.0, 0.9, 0.0))
    params = SolverParams(dialect="xpbd", substeps=2, iterations=2)
    step = make_xpbd_pallas_sharded_step(topo, params, mesh)
    state = init_state(topo)
    replay = ShardedReplay(step, state, params)
    for _ in range(3):
        state = step(state, DT)
        replay.step(DT)
    np.testing.assert_allclose(np.asarray(state.x), replay.positions(),
                               atol=1e-5)
    # lambdas agree in public order
    lam_pub = np.zeros(topo.num_edges, F)
    efam = step.shard_info["edges"]
    for dd in range(d):
        live = efam.plans[dd].perm >= 0
        lam_pub[efam.plans[dd].perm[live]] = replay.lam["e"][dd][live]
    np.testing.assert_allclose(np.asarray(state.edge_lambda), lam_pub,
                               atol=1e-4)


def test_sharded_settles_on_ground():
    """Physical sanity at D=4: the sharded dialect drops and rests like the
    single-chip path (min_y ~ 0, no NaN, bounded overshoot)."""
    mesh = mesh_of(4)
    topo = meshes.tet_cube(7, 7, 7, size=0.7, center=(0.0, 0.5, 0.0))
    params = SolverParams(dialect="xpbd", substeps=2, iterations=4)
    step = make_xpbd_pallas_sharded_step(topo, params, mesh)
    state = init_state(topo)
    state = step.step_n(state, DT, 60)
    pos = np.asarray(state.x)
    assert np.isfinite(pos).all()
    assert pos[:, 1].min() > -1e-4
    assert pos[:, 1].min() < 5e-2
