"""Primitive collision push-out: sphere / oriented box / capsule + ground plane.

Implements the *branchless* GPU forms of the reference's collision math
(Assets/Shaders/SoftBodyCompute.compute:108-204) rather than the branchy C#
variants -- SURVEY.md picks the HLSL forms as the TPU-idiomatic ones.  The
collider POD mirrors PrimitiveColliderData
(Assets/Scripts/Softbody/SoftBodyPrimitiveCollider.cs:8-14): type, world
position, world rotation (quaternion), and a 3-float data blob
(sphere: radius; box: half extents; capsule: radius, half height).

Colliders apply *sequentially* in registration order, exactly like the
reference's per-particle collider loop (SoftBodySolver.cs:554-561,
SoftBodyCompute.compute:410-429) -- a ``lax.scan`` over the collider axis
carrying the pushed positions.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

SPHERE = 0
BOX = 1
CAPSULE = 2


@dataclasses.dataclass(frozen=True)
class Colliders:
    """SoA collider set (a pytree; fields are (K, ...) arrays)."""

    type: jnp.ndarray        # (K,) int32
    position: jnp.ndarray    # (K, 3) f32 world position
    rotation: jnp.ndarray    # (K, 4) f32 quaternion (x, y, z, w)
    data: jnp.ndarray        # (K, 3) f32
    active: jnp.ndarray      # (K,) bool

    @property
    def count(self) -> int:
        return self.type.shape[0]

    @staticmethod
    def empty() -> "Colliders":
        return Colliders(
            type=jnp.zeros((0,), jnp.int32),
            position=jnp.zeros((0, 3), jnp.float32),
            rotation=jnp.zeros((0, 4), jnp.float32),
            data=jnp.zeros((0, 3), jnp.float32),
            active=jnp.zeros((0,), bool),
        )

    @staticmethod
    def build(items: Sequence[Optional[dict]],
              capacity: Optional[int] = None) -> "Colliders":
        """items: dicts with keys type, position, rotation (optional), data;
        ``None`` entries are tombstones (inactive slot, id kept stable).

        ``capacity`` pads the arrays with inactive slots: snapshots at the
        same capacity are shape-identical, so a registry can add/remove
        colliders below capacity without any recompilation (the dynamic
        GPU collider buffer of the reference, SoftBodySolver.cs:648-664).
        """
        k = len(items)
        cap = k if capacity is None else max(int(capacity), k)
        typ = np.zeros((cap,), np.int32)
        pos = np.zeros((cap, 3), np.float32)
        rot = np.tile(np.array([0, 0, 0, 1], np.float32), (cap, 1))
        dat = np.zeros((cap, 3), np.float32)
        act = np.zeros((cap,), bool)
        for i, it in enumerate(items):
            if it is None:
                continue
            typ[i] = it["type"]
            pos[i] = it["position"]
            if "rotation" in it:
                rot[i] = it["rotation"]
            d = np.asarray(it["data"], np.float32).ravel()
            dat[i, : d.size] = d
            act[i] = True
        return Colliders(
            type=jnp.asarray(typ), position=jnp.asarray(pos),
            rotation=jnp.asarray(rot), data=jnp.asarray(dat),
            active=jnp.asarray(act),
        )

    @staticmethod
    def sphere(center, radius) -> dict:
        return {"type": SPHERE, "position": center, "data": [radius, 0, 0]}

    @staticmethod
    def box(center, half_extents, rotation=(0, 0, 0, 1)) -> dict:
        return {"type": BOX, "position": center, "rotation": rotation,
                "data": half_extents}

    @staticmethod
    def capsule(center, radius, half_height, rotation=(0, 0, 0, 1)) -> dict:
        return {"type": CAPSULE, "position": center, "rotation": rotation,
                "data": [radius, half_height, 0]}


jax.tree_util.register_pytree_node(
    Colliders,
    lambda c: ((c.type, c.position, c.rotation, c.data, c.active), None),
    lambda _, ch: Colliders(*ch),
)


def quat_rotate(q, v):
    """Rotate v by quaternion q = (x, y, z, w): v + w*t + q.xyz x t with
    t = 2 * q.xyz x v (SoftBodyCompute.compute:78-82)."""
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_conjugate(q):
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def push_out_sphere(center, radius, p, r):
    """Sphere push-out (SoftBodyCompute.compute:108-122).  Returns (N,3)
    push vectors (zero when not penetrating)."""
    big_r = radius + r
    d = p - center
    dist2 = jnp.sum(d * d, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-18))
    n = jnp.where(
        (dist > 1e-9)[..., None], d / dist[..., None],
        jnp.array([0.0, 1.0, 0.0], jnp.float32),
    )
    push = n * (big_r - dist)[..., None]
    return jnp.where((dist2 < big_r * big_r)[..., None], push, 0.0)


def push_out_capsule(center, rotation, radius, half_height, p, r):
    """Capsule push-out: closest point on segment + sphere
    (SoftBodyCompute.compute:124-150)."""
    axis = quat_rotate(rotation, jnp.array([0.0, 1.0, 0.0], jnp.float32))
    a = center - axis * half_height
    b = center + axis * half_height
    ab = b - a
    ab2 = jnp.sum(ab * ab, axis=-1)
    t = jnp.where(ab2 < 1e-12,
                  0.0,
                  jnp.sum((p - a) * ab, axis=-1) / jnp.maximum(ab2, 1e-20))
    t = jnp.clip(t, 0.0, 1.0)
    cp = a + ab * t[..., None]
    return push_out_sphere(cp, radius, p, r)


def push_out_box(center, rotation, half_extents, p, r):
    """Oriented-box push-out (SoftBodyCompute.compute:152-204):
    outside-or-shell case via clamp + dist<r; fully-inside case via minimum
    axis distance (+r)."""
    rel = p - center
    pl = quat_rotate(quat_conjugate(rotation), rel)

    cl = jnp.clip(pl, -half_extents, half_extents)
    d = pl - cl
    dist2 = jnp.sum(d * d, axis=-1)
    outside = dist2 > 1e-18

    # outside-shell branch
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
    n_out = d / dist[..., None]
    push_out_l = n_out * (r - dist)[..., None]
    push_out_l = jnp.where((dist < r)[..., None], push_out_l, 0.0)

    # fully-inside branch: push along minimum face distance
    ap = jnp.abs(pl)
    dx = half_extents[..., 0] - ap[..., 0]
    dy = half_extents[..., 1] - ap[..., 1]
    dz = half_extents[..., 2] - ap[..., 2]
    sx = jnp.where(pl[..., 0] >= 0, 1.0, -1.0)
    sy = jnp.where(pl[..., 1] >= 0, 1.0, -1.0)
    sz = jnp.where(pl[..., 2] >= 0, 1.0, -1.0)

    use_x = (dx <= dy) & (dx <= dz)
    use_y = (~use_x) & (dy <= dz)
    use_z = ~(use_x | use_y)
    zeros = jnp.zeros_like(dx)
    push_in_l = jnp.stack(
        [
            jnp.where(use_x, sx * (dx + r), zeros),
            jnp.where(use_y, sy * (dy + r), zeros),
            jnp.where(use_z, sz * (dz + r), zeros),
        ],
        axis=-1,
    )

    push_l = jnp.where(outside[..., None], push_out_l, push_in_l)
    return quat_rotate(rotation, push_l)


def push_out_one(ctype, position, rotation, data, p, r):
    """Dispatch on collider type; returns (N, 3) pushes."""
    sphere = push_out_sphere(position, data[0], p, r)
    box = push_out_box(position, rotation, data, p, r)
    capsule = push_out_capsule(position, rotation, data[0], data[1], p, r)
    return jnp.where(
        ctype == SPHERE, sphere, jnp.where(ctype == BOX, box, capsule)
    )


def collide_particles(p, r, colliders: Colliders):
    """Apply all colliders sequentially to (N, 3) world positions, matching
    the reference's per-particle collider loop order."""
    if colliders is None or colliders.count == 0:
        return p

    def body(pw, col):
        ctype, pos, rot, data, active = col
        push = push_out_one(ctype, pos, rot, data, pw, r)
        return pw + jnp.where(active, 1.0, 0.0) * push, None

    p, _ = jax.lax.scan(
        body, p,
        (colliders.type, colliders.position, colliders.rotation,
         colliders.data, colliders.active),
    )
    return p


def project_ground_plane(p, r, point, normal):
    """Arbitrary ground plane push (SoftBodySolver.cs:548-551 /
    SoftBodyCompute.compute:403-408): dist = n.(p - p0); if dist < r push
    along n by (r - dist)."""
    dist = jnp.sum(normal * (p - point), axis=-1)
    push = normal * (r - dist)[..., None]
    return jnp.where((dist < r)[..., None], p + push, p)
