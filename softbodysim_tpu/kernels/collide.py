"""Pallas TPU kernel: fused ground + primitive-collider push-out.

The XLA path (collide/primitives.py) applies K colliders via lax.scan --
K full HBM round-trips over the particle arrays per solver iteration.  This
kernel keeps a particle block resident in VMEM and loops all colliders over
it (collider SoA staged in SMEM), writing positions once: the whole collide
stage (ground plane + K primitives, SoftBodyCompute.compute:392-433) becomes
a single bandwidth-bound pass.

Layout: positions are component-split (SoA x/y/z lanes) and padded to
(rows, 128) fp32 tiles -- the natural VPU shape; the (V, 3) <-> lanes
conversion happens at the call boundary.

Results are bitwise-equivalent in structure to the XLA path (same math, same
sequential collider order); fp differences are at most ulp-level from
instruction scheduling.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..collide.primitives import Colliders

_LANES = 128
_BLOCK_ROWS = 64  # (64, 128) f32 block = 32 KiB per array


# ---- component-vector helpers (tuples of (R, 128) arrays) ----

def _cross(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _select(m, a, b):
    return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]),
            jnp.where(m, a[2], b[2]))


def _quat_rotate(qx, qy, qz, qw, v):
    """v + qw*t + qxyz x t, t = 2 qxyz x v (SoftBodyCompute.compute:78-82)."""
    q = (qx, qy, qz)
    t = _scale(_cross(q, v), 2.0)
    return _add(v, _add(_scale(t, qw), _cross(q, t)))


def _push_sphere(center, radius, p, r):
    big_r = radius + r
    d = _sub(p, center)
    dist2 = _dot(d, d)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-18))
    inv = 1.0 / dist
    n = _select(dist > 1e-9, _scale(d, inv),
                (jnp.zeros_like(dist), jnp.ones_like(dist),
                 jnp.zeros_like(dist)))
    hit = dist2 < big_r * big_r
    mag = jnp.where(hit, big_r - dist, 0.0)
    return _scale(n, mag)


def _push_box(center, q, he, p, r):
    qx, qy, qz, qw = q
    rel = _sub(p, center)
    pl_ = _quat_rotate(-qx, -qy, -qz, qw, rel)
    cl = (jnp.clip(pl_[0], -he[0], he[0]),
          jnp.clip(pl_[1], -he[1], he[1]),
          jnp.clip(pl_[2], -he[2], he[2]))
    d = _sub(pl_, cl)
    dist2 = _dot(d, d)
    outside = dist2 > 1e-18

    dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
    mag_out = jnp.where(dist < r, r - dist, 0.0)
    push_out = _scale(d, mag_out / dist)

    apx = jnp.abs(pl_[0])
    apy = jnp.abs(pl_[1])
    apz = jnp.abs(pl_[2])
    dx = he[0] - apx
    dy = he[1] - apy
    dz = he[2] - apz
    sx = jnp.where(pl_[0] >= 0, 1.0, -1.0)
    sy = jnp.where(pl_[1] >= 0, 1.0, -1.0)
    sz = jnp.where(pl_[2] >= 0, 1.0, -1.0)
    use_x = (dx <= dy) & (dx <= dz)
    use_y = (~use_x) & (dy <= dz)
    use_z = ~(use_x | use_y)
    zero = jnp.zeros_like(dx)
    push_in = (jnp.where(use_x, sx * (dx + r), zero),
               jnp.where(use_y, sy * (dy + r), zero),
               jnp.where(use_z, sz * (dz + r), zero))

    push_l = _select(outside, push_out, push_in)
    return _quat_rotate(qx, qy, qz, qw, push_l)


def _push_capsule(center, q, radius, half_h, p, r):
    qx, qy, qz, qw = q
    zero = jnp.zeros_like(p[0])
    axis = _quat_rotate(qx, qy, qz, qw, (zero, zero + 1.0, zero))
    a = _sub(center, _scale(axis, half_h))
    ab = _scale(axis, 2.0 * half_h)
    ab2 = _dot(ab, ab)
    t = jnp.where(ab2 < 1e-12, 0.0,
                  _dot(_sub(p, a), ab) / jnp.maximum(ab2, 1e-20))
    t = jnp.clip(t, 0.0, 1.0)
    cp = _add(a, _scale(ab, t))
    return _push_sphere(cp, radius, p, r)


def _collide_kernel(ground_ref, cols_ref, px_ref, py_ref, pz_ref, w_ref,
                    ox_ref, oy_ref, oz_ref, *, num_colliders: int):
    p = (px_ref[:], py_ref[:], pz_ref[:])
    free = w_ref[:] != 0.0

    g_enabled = ground_ref[0, 0]
    g_point = (ground_ref[0, 1], ground_ref[0, 2], ground_ref[0, 3])
    g_normal = (ground_ref[0, 4], ground_ref[0, 5], ground_ref[0, 6])
    radius = ground_ref[0, 7]

    # ground plane (SoftBodyCompute.compute:403-408)
    dist = _dot(g_normal, _sub(p, g_point))
    pen = (dist < radius) & (g_enabled > 0.0)
    p = _add(p, _scale(g_normal, jnp.where(pen, radius - dist, 0.0)))

    def body(k, p):
        ctype = cols_ref[k, 0]
        center = (cols_ref[k, 1], cols_ref[k, 2], cols_ref[k, 3])
        q = (cols_ref[k, 4], cols_ref[k, 5], cols_ref[k, 6], cols_ref[k, 7])
        d0 = cols_ref[k, 8]
        d1 = cols_ref[k, 9]
        d2 = cols_ref[k, 10]
        active = cols_ref[k, 11]

        sph = _push_sphere(center, d0, p, radius)
        box = _push_box(center, q, (d0, d1, d2), p, radius)
        cap = _push_capsule(center, q, d0, d1, p, radius)
        push = _select(ctype == 0.0, sph,
                       _select(ctype == 1.0, box, cap))
        return _add(p, _scale(push, active))

    if num_colliders > 0:
        p = jax.lax.fori_loop(0, num_colliders, body, p)

    ox_ref[:] = jnp.where(free, p[0], px_ref[:])
    oy_ref[:] = jnp.where(free, p[1], py_ref[:])
    oz_ref[:] = jnp.where(free, p[2], pz_ref[:])


def pack_colliders(colliders: Optional[Colliders]):
    """(K, 12) f32 SoA pack [type, pos3, quat4, data3, active] -- traceable,
    so collider poses can change every step without recompiling (the
    reference rebuilds its collider snapshot per step,
    SoftBodyManager.RebuildColliderCache, SoftBodyManager.cs:239-261)."""
    if colliders is None or colliders.count == 0:
        return jnp.zeros((1, 12), jnp.float32)
    k = colliders.count
    return jnp.concatenate([
        jnp.asarray(colliders.type, jnp.float32).reshape(k, 1),
        jnp.asarray(colliders.position, jnp.float32).reshape(k, 3),
        jnp.asarray(colliders.rotation, jnp.float32).reshape(k, 4),
        jnp.asarray(colliders.data, jnp.float32).reshape(k, 3),
        jnp.asarray(colliders.active, jnp.float32).reshape(k, 1),
    ], axis=1)


def make_fused_collide(colliders: Optional[Colliders], *,
                       ground_enabled: bool, ground_point, ground_normal,
                       radius: float, num_particles: int,
                       interpret: bool = False):
    """Build fn(p (V,3), inv_mass (V,), colliders=None) -> (V,3) running the
    whole collide stage as one Pallas kernel.  The colliders argument (same
    count as the template) lets poses move per step without recompiling."""
    k = 0 if colliders is None else colliders.count
    default_packed = pack_colliders(colliders)

    gn = np.asarray(ground_normal, np.float64)
    gn = gn / max(1e-12, float(np.linalg.norm(gn)))
    ground = np.zeros((1, 8), np.float32)
    ground[0, 0] = 1.0 if ground_enabled else 0.0
    ground[0, 1:4] = np.asarray(ground_point, np.float32)
    ground[0, 4:7] = gn.astype(np.float32)
    ground[0, 7] = radius
    ground = jnp.asarray(ground)

    rows = -(-num_particles // _LANES)
    rows_padded = -(-rows // _BLOCK_ROWS) * _BLOCK_ROWS
    padded = rows_padded * _LANES
    grid = rows_padded // _BLOCK_ROWS

    block = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    small = pl.BlockSpec(memory_space=pltpu.SMEM)

    call = pl.pallas_call(
        functools.partial(_collide_kernel, num_colliders=k),
        grid=(grid,),
        in_specs=[small, small, block, block, block, block],
        out_specs=(block, block, block),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows_padded, _LANES), jnp.float32)
            for _ in range(3)),
        interpret=interpret,
    )

    def fn(p, inv_mass, colliders_rt: Optional[Colliders] = None):
        packed = (default_packed if colliders_rt is None
                  else pack_colliders(colliders_rt))
        pad = padded - num_particles
        comps = []
        for c in range(3):
            col = jnp.pad(p[:, c], (0, pad))
            comps.append(col.reshape(rows_padded, _LANES))
        w = jnp.pad(inv_mass, (0, pad)).reshape(rows_padded, _LANES)
        ox, oy, oz = call(ground, packed, *comps, w)
        out = jnp.stack(
            [ox.reshape(-1)[:num_particles],
             oy.reshape(-1)[:num_particles],
             oz.reshape(-1)[:num_particles]], axis=-1)
        return out

    return fn
