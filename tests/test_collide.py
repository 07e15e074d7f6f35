"""Pure collision math vs the HLSL-form oracle (SoftBodyCompute.compute:108-204)."""

import numpy as np
import jax.numpy as jnp

from softbodysim_tpu.collide.primitives import (
    Colliders, collide_particles, project_ground_plane, push_out_one,
    quat_rotate)

from oracle import _push_out

ROT = (0.1826, 0.3651, 0.5477, 0.7303)  # ~normalized quaternion


def _compare(item, n=4000, seed=0, atol=5e-7):
    rng = np.random.default_rng(seed)
    p = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    r = np.float32(0.02)
    cols = Colliders.build([item])
    got = np.asarray(push_out_one(
        cols.type[0], cols.position[0], cols.rotation[0], cols.data[0],
        jnp.asarray(p), r))
    want = np.zeros_like(p)
    for i in range(n):
        hit, push = _push_out(item, p[i], r)
        if hit:
            want[i] = push
    np.testing.assert_allclose(got, want, atol=atol)


def test_sphere_push_out():
    _compare(Colliders.sphere((0.0, 0.2, -0.1), 0.35))


def test_box_push_out_rotated():
    _compare(Colliders.box((0.1, 0.2, -0.1), (0.2, 0.3, 0.15), rotation=ROT))


def test_capsule_push_out_rotated():
    _compare(Colliders.capsule((-0.2, 0.3, 0.1), 0.15, 0.25, rotation=ROT))


def test_colliders_apply_sequentially():
    """Two overlapping colliders must apply in registration order
    (SoftBodySolver.cs:554-561): the result differs from either alone."""
    a = Colliders.sphere((0.0, 0.0, 0.0), 0.5)
    b = Colliders.sphere((0.6, 0.0, 0.0), 0.5)
    p = jnp.asarray(np.array([[0.3, 0.0, 0.0]], np.float32))
    both = collide_particles(p, 0.0, Colliders.build([a, b]))
    swapped = collide_particles(p, 0.0, Colliders.build([b, a]))
    # sequential semantics: order matters for overlapping colliders
    assert not np.allclose(np.asarray(both), np.asarray(swapped))


def test_ground_plane_arbitrary_normal():
    n = np.array([1.0, 1.0, 0.0], np.float32)
    n /= np.linalg.norm(n)
    p = jnp.asarray(np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 0.0]], np.float32))
    out = np.asarray(project_ground_plane(
        p, 0.1, jnp.zeros(3, jnp.float32), jnp.asarray(n)))
    d = out @ n
    assert d[0] >= 0.1 - 1e-6          # pushed up to radius
    np.testing.assert_allclose(out[1], [1.0, 1.0, 0.0])  # untouched


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    th = 0.7
    q = np.array([*(np.sin(th / 2) * axis), np.cos(th / 2)], np.float32)
    v = rng.normal(size=(10, 3)).astype(np.float32)
    got = np.asarray(quat_rotate(jnp.asarray(q), jnp.asarray(v)))

    c, s = np.cos(th), np.sin(th)
    k = axis
    want = (v * c + np.cross(np.tile(k, (10, 1)), v) * s
            + np.outer(v @ k, k) * (1 - c))
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-5)
