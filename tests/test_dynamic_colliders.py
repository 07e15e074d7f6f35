"""Dynamic collider registry: add/remove mid-run without recompilation.

Parity target: the reference's runtime collider registration
(SoftBodyManager.RegisterPrimitiveCollider, SoftBodyManager.cs:122-156)
backed by a pow2-grown GPU buffer uploaded per step
(SoftBodySolver.cs:648-664).  Here the snapshot is padded to a pow2
capacity with an active mask; within capacity every add/remove/update is
a same-shape runtime argument -- no re-jit (verified by counting
Body.bind calls, the only recompile entry point).
"""

import numpy as np
import pytest

from softbodysim_tpu import SolverParams
from softbodysim_tpu.api.world import Body, World
from softbodysim_tpu.collide.primitives import Colliders
from softbodysim_tpu.core import meshes

pytestmark = pytest.mark.quick

DT = 1.0 / 60.0


def _world_with_ball(center=(0.0, 2.0, 0.0)):
    topo = meshes.tet_ball(1, radius=0.3, center=center)
    w = World()
    body = w.register(Body(topo, SolverParams(
        dialect="jacobi", substeps=1, iterations=4, ground_enabled=False)))
    return w, body


def test_add_within_capacity_does_not_rebind():
    w, body = _world_with_ball()
    binds = []
    orig_bind = Body.bind
    try:
        Body.bind = lambda self, c: binds.append(1) or orig_bind(self, c)
        first = w.add_collider(Colliders.sphere((0, 0.5, 0), 0.4))
        assert binds == [1]          # capacity growth 0 -> 8: one rebind
        assert w.collider_capacity == 8
        for i in range(7):
            w.add_collider(Colliders.sphere((10 + i, 0, 0), 0.1))
        assert binds == [1]          # 7 more adds, still within capacity
        w.remove_collider(first)
        w.update_collider(first + 1, Colliders.sphere((20, 0, 0), 0.1))
        assert binds == [1]
        # tombstone reuse keeps capacity; the NEXT add overflows -> double
        assert w.add_collider(Colliders.sphere((30, 0, 0), 0.1)) == first
        assert w.collider_capacity == 8 and binds == [1]
        w.add_collider(Colliders.sphere((40, 0, 0), 0.1))
        assert w.collider_capacity == 16
        assert binds == [1, 1]
    finally:
        Body.bind = orig_bind


def test_tombstone_slot_is_reused():
    w, _ = _world_with_ball()
    a = w.add_collider(Colliders.sphere((0, 0, 0), 0.1))
    b = w.add_collider(Colliders.sphere((1, 0, 0), 0.1))
    w.remove_collider(a)
    c = w.add_collider(Colliders.sphere((2, 0, 0), 0.1))
    assert c == a                      # tombstone reused, ids stable
    assert b == a + 1


def test_add_remove_changes_physics_mid_run():
    """A sphere collider added mid-run holds the falling ball up; removing
    it lets the ball fall again -- all through the same compiled step."""
    w, body = _world_with_ball(center=(0.0, 1.0, 0.0))
    for _ in range(30):
        w.step(DT)
    y_free = body.positions()[:, 1].min()
    assert y_free < 0.0                # no ground, no collider: falling

    # fresh world with the collider present from the start of the fall
    w, body = _world_with_ball(center=(0.0, 1.0, 0.0))
    cid = w.add_collider(Colliders.sphere((0.0, -1.0, 0.0), 0.8))
    for _ in range(90):
        w.step(DT)
    held = body.positions()[:, 1].min()
    assert held > -0.35                # resting on the sphere

    w.remove_collider(cid)             # same shapes, no rebind
    for _ in range(40):
        w.step(DT)
    assert body.positions()[:, 1].min() < held - 0.3   # falling again
