"""NumPy oracles: scalar-faithful reimplementations of both reference solvers.

These are written from the reference *semantics* (not its code) and serve as
golden models for the JAX solvers:

  - ``XpbdOracle``  == C++ PBDServer stepper (CProgram/src/Sim.cpp:100-305):
    sequential Gauss-Seidel XPBD with compliance and persistent lambdas.
    The constraint sweep order is configurable so it can replay the colored
    order the TPU solver uses (SURVEY.md "GS<->Jacobi fidelity").

  - ``JacobiOracle`` == Unity in-engine CPU solver
    (Assets/Scripts/Softbody/SoftBodySolver.cs:282-564): per-particle Jacobi
    gather with count-averaged SOR apply, world-space collisions.

All math in float32 like the reference.
"""

from __future__ import annotations

import numpy as np

F = np.float32


def _dot3(a, b):
    """3-vector dot with one rounding per op, matching the C++ ``dot``
    (PBDServer.h semantics).  np.dot routes through BLAS sdot, which may
    use FMA (no intermediate rounding) and then disagrees with the
    compiled reference by 1 ulp -- caught by tests/test_golden_ref.py."""
    return (a[0] * b[0] + a[1] * b[1]) + a[2] * b[2]


def _tet_vol(p0, p1, p2, p3):
    return _dot3(np.cross(p1 - p0, p2 - p0), p3 - p0) / F(6.0)


class XpbdOracle:
    def __init__(self, topo, params, pinned=None):
        self.params = params
        x0 = topo.vertices.astype(F)
        self.x = x0.copy()
        self.v = np.zeros_like(x0)
        self.x_star = x0.copy()
        self.edges = topo.edges.astype(np.int64)
        self.tets = topo.tets.astype(np.int64)
        self.edge_rest = topo.edge_rest.astype(F)
        self.tet_rest = topo.tet_rest_vol.astype(F)
        self.edge_lambda = np.zeros(len(self.edges), F)
        self.tet_lambda = np.zeros(len(self.tets), F)

        # compute_inv_mass (Sim.cpp:63-79)
        w = np.zeros(len(x0), F)
        for t in self.tets:
            vol = _tet_vol(*x0[t])
            mvol = abs(vol)
            if mvol > 1e-12:
                inv = F(4.0) / F(mvol)
                for vi in t:
                    w[vi] += inv
        if pinned is not None:
            for i in pinned:
                if 0 <= i < len(w):
                    w[i] = 0.0
        self.w = w

    def step(self, dt, edge_order=None, tet_order=None):
        p = self.params
        ss = max(1, p.substeps)
        sdt = F(dt) / F(ss)
        if edge_order is None:
            edge_order = range(len(self.edges))
        if tet_order is None:
            tet_order = range(len(self.tets))
        for _ in range(ss):
            self._predict(sdt)
            for _ in range(p.iterations):
                self._solve_edges(sdt, edge_order)
                self._solve_tets(sdt, tet_order)
                self._ground()
            self._commit(sdt)

    def _predict(self, sdt):
        g = np.asarray(self.params.gravity, F)
        for i in range(len(self.x)):
            if self.w[i] == 0.0:
                self.x_star[i] = self.x[i]
                continue
            self.v[i] = self.v[i] + g * sdt
            self.x_star[i] = self.x[i] + self.v[i] * sdt

    def _solve_edges(self, sdt, order):
        inv_dt2 = F(1.0) / (sdt * sdt) if sdt > 1e-12 else F(0.0)
        comp = F(max(0.0, self.params.edge_compliance))
        alpha = comp * inv_dt2
        for ei in order:
            i0, i1 = self.edges[ei]
            w0, w1 = self.w[i0], self.w[i1]
            wsum = w0 + w1
            if wsum == 0.0:
                continue
            d = self.x_star[i0] - self.x_star[i1]
            length = F(np.sqrt(_dot3(d, d)))
            if length < 1e-12:
                continue
            c = length - self.edge_rest[ei]
            lam = self.edge_lambda[ei]
            dlam = (-c - alpha * lam) / (wsum + alpha)
            self.edge_lambda[ei] = lam + dlam
            n = d * (F(1.0) / length)
            corr = n * dlam
            self.x_star[i0] = self.x_star[i0] + corr * w0
            self.x_star[i1] = self.x_star[i1] - corr * w1

    def _solve_tets(self, sdt, order):
        inv_dt2 = F(1.0) / (sdt * sdt) if sdt > 1e-12 else F(0.0)
        comp = F(max(0.0, self.params.volume_compliance))
        alpha = comp * inv_dt2
        for ti in order:
            a, b, c_, d_ = self.tets[ti]
            wa, wb, wc, wd = self.w[a], self.w[b], self.w[c_], self.w[d_]
            if wa + wb + wc + wd == 0.0:
                continue
            pa, pb, pc, pd = (self.x_star[a], self.x_star[b],
                              self.x_star[c_], self.x_star[d_])
            ga = np.cross(pd - pb, pc - pb) * F(1.0 / 6.0)
            gb = np.cross(pc - pa, pd - pa) * F(1.0 / 6.0)
            gc = np.cross(pd - pa, pb - pa) * F(1.0 / 6.0)
            gd = np.cross(pb - pa, pc - pa) * F(1.0 / 6.0)
            wsum = (wa * _dot3(ga, ga) + wb * _dot3(gb, gb)
                    + wc * _dot3(gc, gc) + wd * _dot3(gd, gd))
            if wsum < 1e-20:
                continue
            vol = _tet_vol(pa, pb, pc, pd)
            cfn = vol - self.tet_rest[ti]
            lam = self.tet_lambda[ti]
            dlam = (-cfn - alpha * lam) / F(wsum + alpha)
            self.tet_lambda[ti] = lam + dlam
            self.x_star[a] = pa + ga * F(wa * dlam)
            self.x_star[b] = pb + gb * F(wb * dlam)
            self.x_star[c_] = pc + gc * F(wc * dlam)
            self.x_star[d_] = pd + gd * F(wd * dlam)

    # --- block-synchronous ordering (Pallas sweep backend) ---------------
    # Within a block all constraints read the same pre-block state and their
    # corrections sum (Jacobi); blocks run sequentially (Gauss-Seidel).
    # Replays kernels/sweep.py exactly.

    def step_blocks(self, dt, edge_blocks=None, tet_blocks=None,
                    scheme="scale", omega=1.0, local_iters=1,
                    symmetric=False):
        """scheme='scale': dlam *= per-lane scale (1/max within-block
        multiplicity, the round-2/3 kernels).  scheme='split': mass
        splitting -- the dlam denominator uses within-block per-vertex
        multiplicity-inflated inverse masses (sum c_i w_i |g_i|^2 + alpha)
        and the apply uses plain w (the per-copy c factors cancel when the
        equal-mass copies are averaged).  omega over-relaxes dlam.
        local_iters repeats each block's Jacobi solve k times per visit
        (block data is VMEM-resident in the kernels, so the revisits are
        nearly free).  symmetric=True alternates block sweep direction
        per solver iteration.  scheme / omega / local_iters accept a
        scalar or an (edge, tet) pair (matching step.block_scheme)."""
        # each block is an id array or an (ids, dlambda_scale) pair
        p = self.params
        ss = max(1, p.substeps)
        sdt = F(dt) / F(ss)

        def pair(v):
            return v if isinstance(v, (tuple, list)) else (v, v)

        sch_e, sch_t = pair(scheme)
        om_e, om_t = (F(v) for v in pair(omega))
        k_e, k_t = (max(1, int(v)) for v in pair(local_iters))
        for _ in range(ss):
            self._predict(sdt)
            for it in range(p.iterations):
                rev = symmetric and (it % 2 == 1)
                eb = list(edge_blocks or [])
                tb = list(tet_blocks or [])
                if rev:
                    eb.reverse()
                    tb.reverse()
                for blk in eb:
                    for _ in range(k_e):
                        self._solve_edges_block(sdt, *self._blk(blk),
                                                scheme=sch_e, omega=om_e)
                for blk in tb:
                    for _ in range(k_t):
                        self._solve_tets_block(sdt, *self._blk(blk),
                                               scheme=sch_t, omega=om_t)
                self._ground()
            self._commit(sdt)

    @staticmethod
    def _blk(blk):
        return blk if isinstance(blk, tuple) else (blk, None)

    def _block_counts(self, ids, cons):
        """Within-block multiplicity of each constraint-role vertex: counts
        over the flattened role-vertex list of this block (cached)."""
        key = (id(cons), ids.tobytes())
        cache = getattr(self, "_cnt_cache", None)
        if cache is None:
            cache = self._cnt_cache = {}
        out = cache.get(key)
        if out is None:
            verts = cons[ids]                       # (B, arity)
            uniq, inv = np.unique(verts.ravel(), return_inverse=True)
            inv = inv.ravel()
            cnt = np.bincount(inv, minlength=len(uniq))
            out = cnt[inv].reshape(verts.shape).astype(F)
            cache[key] = out
        return out

    def _solve_edges_block(self, sdt, ids, scale=None, scheme="scale",
                           omega=F(1.0)):
        inv_dt2 = F(1.0) / (sdt * sdt) if sdt > 1e-12 else F(0.0)
        alpha = F(max(0.0, self.params.edge_compliance)) * inv_dt2
        i0 = self.edges[ids, 0]
        i1 = self.edges[ids, 1]
        w0 = self.w[i0]
        w1 = self.w[i1]
        wsum = w0 + w1
        d = self.x_star[i0] - self.x_star[i1]
        length = np.sqrt((d * d).sum(-1)).astype(F)
        valid = (wsum != 0.0) & (length >= 1e-12)
        c = length - self.edge_rest[ids]
        lam = self.edge_lambda[ids]
        if scheme == "split":
            cnt = self._block_counts(ids, self.edges)
            denom = (cnt[:, 0] * w0 + cnt[:, 1] * w1).astype(F) + alpha
        else:
            denom = wsum + alpha
        dlam = np.where(valid, (-c - alpha * lam)
                        / np.where(denom == 0.0, F(1.0), denom), F(0.0))
        if scheme != "split" and scale is not None:
            dlam = (dlam * scale).astype(F)
        if omega != 1.0:
            dlam = (dlam * omega).astype(F)
        n = d / np.where(length < 1e-12, F(1.0), length)[:, None]
        corr = n * dlam[:, None]
        self.edge_lambda[ids] = lam + dlam
        np.add.at(self.x_star, i0, corr * w0[:, None])
        np.add.at(self.x_star, i1, -corr * w1[:, None])

    def _solve_tets_block(self, sdt, ids, scale=None, scheme="scale",
                          omega=F(1.0)):
        inv_dt2 = F(1.0) / (sdt * sdt) if sdt > 1e-12 else F(0.0)
        alpha = F(max(0.0, self.params.volume_compliance)) * inv_dt2
        a, b, c_, d_ = (self.tets[ids, r] for r in range(4))
        wa, wb, wc, wd = (self.w[i] for i in (a, b, c_, d_))
        pa, pb, pc, pd = (self.x_star[i] for i in (a, b, c_, d_))
        sixth = F(1.0 / 6.0)
        ga = np.cross(pd - pb, pc - pb) * sixth
        gb = np.cross(pc - pa, pd - pa) * sixth
        gc = np.cross(pd - pa, pb - pa) * sixth
        gd = np.cross(pb - pa, pc - pa) * sixth
        vol = (np.cross(pb - pa, pc - pa) * (pd - pa)).sum(-1) * sixth
        cfn = vol.astype(F) - self.tet_rest[ids]
        lam = self.tet_lambda[ids]
        if scheme == "split":
            # The kernel's streamed w tables are count-inflated under
            # split (block_counts fold into the w-fill), so BOTH its
            # wsum denominator and its 1e-20 validity test see the
            # inflated sum -- mirror that here (kernels/sweep.py tet
            # kernel `valid`), else a near-degenerate tet in the
            # ~[1e-20/c, 1e-20) window diverges between kernel and
            # replay.
            cnt = self._block_counts(ids, self.tets)
            wsum = (cnt[:, 0] * wa * (ga * ga).sum(-1)
                    + cnt[:, 1] * wb * (gb * gb).sum(-1)
                    + cnt[:, 2] * wc * (gc * gc).sum(-1)
                    + cnt[:, 3] * wd * (gd * gd).sum(-1)).astype(F)
        else:
            wsum = (wa * (ga * ga).sum(-1) + wb * (gb * gb).sum(-1)
                    + wc * (gc * gc).sum(-1)
                    + wd * (gd * gd).sum(-1)).astype(F)
        valid = ((wa + wb + wc + wd) != 0.0) & (wsum >= 1e-20)
        denom = wsum + alpha
        dlam = np.where(valid, (-cfn - alpha * lam)
                        / np.where(denom == 0.0, F(1.0), denom), F(0.0))
        if scheme != "split" and scale is not None:
            dlam = (dlam * scale).astype(F)
        if omega != 1.0:
            dlam = (dlam * omega).astype(F)
        self.tet_lambda[ids] = lam + dlam
        np.add.at(self.x_star, a, ga * (wa * dlam)[:, None])
        np.add.at(self.x_star, b, gb * (wb * dlam)[:, None])
        np.add.at(self.x_star, c_, gc * (wc * dlam)[:, None])
        np.add.at(self.x_star, d_, gd * (wd * dlam)[:, None])

    def _ground(self):
        if not self.params.ground_enabled:
            return
        y0 = F(self.params.ground_y)
        for i in range(len(self.x)):
            if self.w[i] == 0.0:
                continue
            if self.x_star[i][1] < y0:
                self.x_star[i][1] = y0

    def _commit(self, sdt):
        p = self.params
        inv_dt = F(1.0) / sdt if sdt > 1e-12 else F(0.0)
        y0 = F(p.ground_y)
        fr = F(min(1.0, max(0.0, p.friction)))
        for i in range(len(self.x)):
            if self.w[i] == 0.0:
                self.v[i] = 0.0
                self.x_star[i] = self.x[i]
                continue
            new_x = self.x_star[i].copy()
            vel = (new_x - self.x[i]) * inv_dt
            if p.ground_enabled and new_x[1] <= y0 + F(1e-6):
                vel[0] *= F(1.0) - fr
                vel[2] *= F(1.0) - fr
                if vel[1] < 0.0:
                    vel[1] = 0.0
            self.v[i] = vel
            self.x[i] = new_x


class JacobiOracle:
    """Unity in-engine CPU path with the GPU (HLSL) collision forms."""

    def __init__(self, topo, params, pinned=None, density=1.0,
                 colliders=None):
        self.params = params
        self.topo = topo
        x0 = topo.vertices.astype(F)
        self.x = x0.copy()
        self.v = np.zeros_like(x0)
        self.x_pred = x0.copy()
        self.edges = topo.edges.astype(np.int64)
        self.tets = topo.tets.astype(np.int64)
        self.edge_rest = topo.edge_rest.astype(F)
        self.tet_rest = topo.tet_rest_vol.astype(F)
        self.colliders = colliders or []

        # density-lumped mass (SoftBodySolver.cs:947-973)
        mass = np.zeros(len(x0), F)
        dens = F(max(1e-6, density))
        for t in self.tets:
            vol = abs(_tet_vol(*x0[t]))
            share = dens * F(max(1e-12, vol)) * F(0.25)
            for vi in t:
                mass[vi] += share
        if len(self.tets) == 0:
            mass[:] = 1.0  # uniform mass for tet-less (cloth) topologies
        w = np.where(mass > 0, F(1.0) / np.maximum(mass, F(1e-30)), F(0.0))
        w = w.astype(F)
        if pinned is not None:
            for i in pinned:
                w[i] = 0.0
        self.w = w

        # CSR adjacency like BuildEdgeAdjacency / BuildTetAdjacency
        self.edge_adj = [[] for _ in range(len(x0))]
        for e, (a, b) in enumerate(self.edges):
            self.edge_adj[a].append((e, b))
            self.edge_adj[b].append((e, a))
        self.tet_adj = [[] for _ in range(len(x0))]
        for t, tet in enumerate(self.tets):
            for role, vi in enumerate(tet):
                self.tet_adj[vi].append((t, role))

    def step(self, dt):
        p = self.params
        ss = max(1, p.substeps)
        sdt = F(dt) / F(ss)
        for _ in range(ss):
            self._presolve(sdt)
            for _ in range(p.iterations):
                self._solve_edges()
                self._solve_tets()
                self._collide()
            self._postsolve(sdt)

    def _presolve(self, sdt):
        g = np.asarray(self.params.gravity, F)
        for i in range(len(self.x)):
            if self.w[i] == 0.0:
                self.v[i] = 0.0
                self.x_pred[i] = self.x[i]
                continue
            self.v[i] = self.v[i] + g * sdt
            self.x_pred[i] = self.x[i] + self.v[i] * sdt

    def _solve_edges(self):
        if len(self.edges) == 0:
            return
        k = F(self.params.edge_stiffness)
        n_p = len(self.x)
        delta = np.zeros((n_p, 3), F)
        cnt = np.zeros(n_p, np.int64)
        for i in range(n_p):
            wi = self.w[i]
            if wi == 0.0:
                continue
            xi = self.x_pred[i]
            s = np.zeros(3, F)
            c = 0
            for (e, j) in self.edge_adj[i]:
                wj = self.w[j]
                wsum = wi + wj
                if wsum == 0.0:
                    continue
                d = xi - self.x_pred[j]
                len2 = np.dot(d, d)
                if len2 < 1e-18:
                    continue
                length = F(np.sqrt(len2))
                cc = length - self.edge_rest[e]
                nrm = d / length
                lam = -k * (cc / wsum)
                s += nrm * (lam * wi)
                c += 1
            delta[i] = s
            cnt[i] = c
        self._apply(delta, cnt)

    def _solve_tets(self):
        if len(self.tets) == 0:
            return
        k = F(self.params.volume_stiffness)
        n_p = len(self.x)
        delta = np.zeros((n_p, 3), F)
        cnt = np.zeros(n_p, np.int64)
        for i in range(n_p):
            if self.w[i] == 0.0:
                continue
            s = np.zeros(3, F)
            c = 0
            for (t, role) in self.tet_adj[i]:
                a, b, c_, d_ = self.tets[t]
                ws = (self.w[a], self.w[b], self.w[c_], self.w[d_])
                if sum(ws) == 0.0:
                    continue
                pa, pb, pc, pd = (self.x_pred[a], self.x_pred[b],
                                  self.x_pred[c_], self.x_pred[d_])
                ga = np.cross(pd - pb, pc - pb) / F(6.0)
                gb = np.cross(pc - pa, pd - pa) / F(6.0)
                gc = np.cross(pd - pa, pb - pa) / F(6.0)
                gd = np.cross(pb - pa, pc - pa) / F(6.0)
                wsum = (ws[0] * np.dot(ga, ga) + ws[1] * np.dot(gb, gb)
                        + ws[2] * np.dot(gc, gc) + ws[3] * np.dot(gd, gd))
                if wsum < 1e-20:
                    continue
                vol = _tet_vol(pa, pb, pc, pd)
                cc = vol - self.tet_rest[t]
                lam = -k * (cc / F(wsum))
                g = (ga, gb, gc, gd)[role]
                wi = ws[role]
                if wi == 0.0:
                    continue
                s += g * (lam * wi)
                c += 1
            delta[i] = s
            cnt[i] = c
        self._apply(delta, cnt)

    def _apply(self, delta, cnt):
        om = F(self.params.sor_omega)
        for i in range(len(self.x)):
            if cnt[i] <= 0 or self.w[i] == 0.0:
                continue
            self.x_pred[i] = self.x_pred[i] + (om / F(cnt[i])) * delta[i]

    def _collide(self):
        p = self.params
        if not (p.ground_enabled or self.colliders):
            return
        r = F(max(1e-6, p.particle_radius))
        gp = np.asarray(p.ground_point, F)
        gn = np.asarray(p.ground_normal, F)
        gn = gn / F(np.sqrt(np.dot(gn, gn)))
        for i in range(len(self.x)):
            if self.w[i] == 0.0:
                continue
            pw = self.x_pred[i].copy()
            if p.ground_enabled:
                dist = F(np.dot(gn, pw - gp))
                if dist < r:
                    pw = pw + gn * (r - dist)
            for col in self.colliders:
                hit, push = _push_out(col, pw, r)
                if hit:
                    pw = pw + push
            self.x_pred[i] = pw

    def _postsolve(self, sdt):
        inv_dt = F(1.0) / sdt if sdt > 0 else F(0.0)
        for i in range(len(self.x)):
            if self.w[i] == 0.0:
                self.x_pred[i] = self.x[i]
                self.v[i] = 0.0
                continue
            self.v[i] = (self.x_pred[i] - self.x[i]) * inv_dt
            self.x[i] = self.x_pred[i]


# ---- HLSL collision forms (SoftBodyCompute.compute:108-204) ----

def _quat_rotate(q, v):
    qv = np.asarray(q[:3], F)
    w = F(q[3])
    t = F(2.0) * np.cross(qv, v)
    return v + w * t + np.cross(qv, t)


def _push_out(col, p, r):
    ctype = col["type"]
    pos = np.asarray(col["position"], F)
    q = np.asarray(col.get("rotation", (0, 0, 0, 1)), F)
    data = np.asarray(
        list(col["data"]) + [0.0] * (3 - len(col["data"])), F)

    if ctype == 0:  # sphere
        return _push_sphere(pos, data[0], p, r)
    if ctype == 2:  # capsule
        axis = _quat_rotate(q, np.array([0, 1, 0], F))
        a = pos - axis * data[1]
        b = pos + axis * data[1]
        ab = b - a
        ab2 = np.dot(ab, ab)
        t = 0.0 if ab2 < 1e-12 else float(np.clip(np.dot(p - a, ab) / ab2, 0, 1))
        cp = a + ab * F(t)
        return _push_sphere(cp, data[0], p, r)

    # box
    qc = np.array([-q[0], -q[1], -q[2], q[3]], F)
    pl = _quat_rotate(qc, p - pos)
    he = data
    cl = np.clip(pl, -he, he)
    d = pl - cl
    dist2 = np.dot(d, d)
    if dist2 > 1e-18:
        dist = F(np.sqrt(dist2))
        if dist >= r:
            return False, np.zeros(3, F)
        push_l = (d / dist) * (r - dist)
        return True, _quat_rotate(q, push_l)
    ap = np.abs(pl)
    dx, dy, dz = he[0] - ap[0], he[1] - ap[1], he[2] - ap[2]
    if dx <= dy and dx <= dz:
        s = 1.0 if pl[0] >= 0 else -1.0
        push_l = np.array([s * (dx + r), 0, 0], F)
    elif dy <= dz:
        s = 1.0 if pl[1] >= 0 else -1.0
        push_l = np.array([0, s * (dy + r), 0], F)
    else:
        s = 1.0 if pl[2] >= 0 else -1.0
        push_l = np.array([0, 0, s * (dz + r)], F)
    return True, _quat_rotate(q, push_l)


def _push_sphere(center, radius, p, r):
    big_r = radius + r
    d = p - center
    dist2 = np.dot(d, d)
    if dist2 >= big_r * big_r:
        return False, np.zeros(3, F)
    dist = F(np.sqrt(max(dist2, 1e-18)))
    n = d / dist if dist > 1e-9 else np.array([0, 1, 0], F)
    return True, n * (big_r - dist)
