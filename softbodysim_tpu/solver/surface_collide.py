"""Vertex-triangle surface collision (soft-soft, triangle-level).

An *exceed* over the reference, which only brute-forces primitive colliders
per particle (SoftBodySolver.cs:554-561) and has no body-body collision at
all.  This complements the particle spatial hash (solver/spatial.py) with
proper surface contact: every particle is tested against nearby SURFACE
TRIANGLES (its own body's and other bodies', since World concatenated scenes
share one particle space per body -- pass the union of surface lists for
inter-body contact).

Jit-compatible, static shapes: triangle centroids hash into the same
power-of-two table as the particle hash; per particle the 27 neighbor cells
yield a fixed-capacity candidate window; closest-point-on-triangle
(Ericson's region test, vectorized) + an inverse-mass-weighted PBD contact:

    C = h - dist,   grad_p = n,   grad_ck = -bary_k n
    s = C / (w_p + sum_k w_k bary_k^2)
    dx_p = +w_p s n,   dx_ck = -w_k bary_k s n

Both sides of the contact move (two-way coupling); a particle's own
triangles are masked out by corner-id comparison.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .spatial import _cell_hash, _next_pow2, _OFFSETS


def closest_point_triangle(p, a, b, c):
    """Vectorized closest point on triangle(s) to point(s).

    All inputs (..., 3).  Returns (closest (...,3), bary (...,3)).
    Ericson, Real-Time Collision Detection 5.1.5 (branchless via where).
    """
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb_ = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom_f = jnp.where(jnp.abs(va + vb_ + vc) < 1e-20, 1.0, va + vb_ + vc)
    v_f = vb_ / denom_f
    w_f = vc / denom_f

    # start from the face interior solution, then override with the six
    # edge/vertex regions (each condition set is exclusive)
    u = 1.0 - v_f - w_f
    bary = jnp.stack([u, v_f, w_f], -1)

    # vertex regions
    reg_a = (d1 <= 0.0) & (d2 <= 0.0)
    reg_b = (d3 >= 0.0) & (d4 <= d3)
    reg_c = (d6 >= 0.0) & (d5 <= d6)
    # edge regions
    v_ab = d1 / jnp.where(jnp.abs(d1 - d3) < 1e-20, 1.0, d1 - d3)
    reg_ab = (vc <= 0.0) & (d1 >= 0.0) & (d3 <= 0.0)
    w_ac = d2 / jnp.where(jnp.abs(d2 - d6) < 1e-20, 1.0, d2 - d6)
    reg_ac = (vb_ <= 0.0) & (d2 >= 0.0) & (d6 <= 0.0)
    w_bc = ((d4 - d3)
            / jnp.where(jnp.abs((d4 - d3) + (d5 - d6)) < 1e-20, 1.0,
                        (d4 - d3) + (d5 - d6)))
    reg_bc = (va <= 0.0) & ((d4 - d3) >= 0.0) & ((d5 - d6) >= 0.0)

    def bset(u_, v_, w_):
        return jnp.stack([u_, v_, w_], -1)

    one = jnp.ones_like(v_f)
    zero = jnp.zeros_like(v_f)
    bary = jnp.where(reg_bc[..., None],
                     bset(zero, 1.0 - w_bc, w_bc), bary)
    bary = jnp.where(reg_ac[..., None], bset(1.0 - w_ac, zero, w_ac), bary)
    bary = jnp.where(reg_ab[..., None], bset(1.0 - v_ab, v_ab, zero), bary)
    bary = jnp.where(reg_c[..., None], bset(zero, zero, one), bary)
    bary = jnp.where(reg_b[..., None], bset(zero, one, zero), bary)
    bary = jnp.where(reg_a[..., None], bset(one, zero, zero), bary)

    closest = (bary[..., 0:1] * a + bary[..., 1:2] * b + bary[..., 2:3] * c)
    return closest, bary


def surface_collision_deltas(p, inv_mass, tris, thickness, cell_size,
                             max_per_cell, return_overflow: bool = False,
                             own_offset=None, own_count: int = None):
    """Per-particle AND per-triangle-corner contact deltas.

    p (N,3), inv_mass (N,), tris (T,3) surface triangles into p.
    Returns (N,3) summed deltas (vertex pushes + corner reactions).

    Own-slice mode (``own_offset``/``own_count`` set, the sharded-step
    form): the triangle hash covers ALL of ``p`` but only query vertices
    ``[own_offset, own_offset + own_count)`` are evaluated.  Returns
    ``(vertex_deltas (own_count, 3), corner_reactions (N, 3))`` -- corner
    reactions from own-vertex contacts scatter anywhere, so the caller
    psums the (N, 3) array over the mesh axis and adds its own row slice
    (each contact is owned by exactly one device: contributions land once).
    ``own_offset`` may be traced; ``own_count`` must be static.
    """
    n = p.shape[0]
    tris = jnp.asarray(tris, jnp.int32)
    nt = tris.shape[0]
    table_size = _next_pow2(2 * max(n, nt))

    a = p[tris[:, 0]]
    b = p[tris[:, 1]]
    c = p[tris[:, 2]]
    cent = (a + b + c) / 3.0

    tcells = jnp.floor(cent / cell_size).astype(jnp.int32)
    thash = _cell_hash(tcells, table_size)
    order = jnp.argsort(thash)
    sorted_hash = thash[order]

    if own_offset is None:
        pq, wq = p, inv_mass
        own_ids = jnp.arange(n)
        nq = n
    else:
        nq = int(own_count)
        off = jnp.asarray(own_offset, jnp.int32)
        pq = jax.lax.dynamic_slice_in_dim(p, off, nq, 0)
        wq = jax.lax.dynamic_slice_in_dim(inv_mass, off, nq, 0)
        own_ids = off + jnp.arange(nq, dtype=jnp.int32)

    pcells = jnp.floor(pq / cell_size).astype(jnp.int32)
    nh = _cell_hash(pcells[:, None, :] + jnp.asarray(_OFFSETS)[None],
                    table_size)
    nh = jnp.sort(nh, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((nq, 1), bool), nh[:, 1:] == nh[:, :-1]], axis=1)

    start = jnp.searchsorted(sorted_hash, nh.reshape(-1)).reshape(nq, 27)
    end = jnp.searchsorted(sorted_hash, nh.reshape(-1),
                           side="right").reshape(nq, 27)
    slot = jnp.arange(max_per_cell, dtype=jnp.int32)
    cand_pos = start[:, :, None] + slot[None, None, :]        # (Nq,27,M)
    cand_valid = (cand_pos < end[:, :, None]) & (~dup[:, :, None])
    cand = order[jnp.clip(cand_pos, 0, nt - 1)]               # tri ids

    ta = tris[cand]                                           # (Nq,27,M,3)
    own = ((ta[..., 0] == own_ids[:, None, None])
           | (ta[..., 1] == own_ids[:, None, None])
           | (ta[..., 2] == own_ids[:, None, None]))

    pa = p[ta[..., 0]]
    pb = p[ta[..., 1]]
    pc = p[ta[..., 2]]
    pi = pq[:, None, None, :]
    closest, bary = closest_point_triangle(pi, pa, pb, pc)
    d = pi - closest
    dist2 = jnp.sum(d * d, -1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-18))

    hit = cand_valid & (~own) & (dist < thickness) & (dist2 > 1e-16)
    nrm = d / dist[..., None]

    wp = wq[:, None, None]
    wa = inv_mass[ta[..., 0]]
    wb = inv_mass[ta[..., 1]]
    wc = inv_mass[ta[..., 2]]
    denom = (wp + wa * bary[..., 0] ** 2 + wb * bary[..., 1] ** 2
             + wc * bary[..., 2] ** 2)
    s = jnp.where(hit & (denom > 0.0),
                  (thickness - dist) / jnp.where(denom == 0.0, 1.0, denom),
                  0.0)

    # particle side
    vertex_deltas = jnp.sum(nrm * (s * wp)[..., None], axis=(1, 2))

    # triangle-corner reactions, scattered (off the hot loop; correctness
    # over scatter speed here)
    corners = (jnp.zeros((n, 3), p.dtype) if own_offset is not None
               else vertex_deltas)
    flat_n = nrm.reshape(-1, 3)
    flat_s = s.reshape(-1)
    for k, wk in ((0, wa), (1, wb), (2, wc)):
        contrib = -flat_n * (flat_s * (wk * bary[..., k]).reshape(-1))[:, None]
        corners = corners.at[ta[..., k].reshape(-1)].add(contrib)

    if own_offset is not None:
        if return_overflow:
            dropped = jnp.where(
                dup, 0, jnp.maximum(end - start - max_per_cell, 0))
            return vertex_deltas, corners, jnp.sum(dropped).astype(jnp.int32)
        return vertex_deltas, corners

    deltas = corners
    if not return_overflow:
        return deltas
    dropped = jnp.where(dup, 0, jnp.maximum(end - start - max_per_cell, 0))
    return deltas, jnp.sum(dropped).astype(jnp.int32)


def make_surface_collision_fn(params, tris):
    """Bind statics; returns fn(p_world, inv_mass) -> corrected positions."""
    tris = np.asarray(tris, np.int64).reshape(-1, 3)
    cell = float(params.surface_collision_cell)
    cap = int(params.surface_collision_max_per_cell)
    h = float(params.surface_thickness)

    def fn(pw, inv_mass):
        delta = surface_collision_deltas(pw, inv_mass, tris, h, cell, cap)
        return jnp.where((inv_mass > 0.0)[:, None], pw + delta, pw)

    return fn


def suggested_cell_size(vertices, tris, thickness) -> float:
    """Centroid hashing covers a contact only if the triangle's circumradius
    + thickness fits in one cell; size cells off the rest mesh."""
    v = np.asarray(vertices)
    t = np.asarray(tris, np.int64).reshape(-1, 3)
    if len(t) == 0:
        return max(2.0 * thickness, 1e-3)
    cent = v[t].mean(axis=1)
    r = np.linalg.norm(v[t] - cent[:, None, :], axis=-1).max()
    return float(r + thickness) * 1.05
