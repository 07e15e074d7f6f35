"""Pallas kernels (interpret mode on CPU) vs the XLA reference paths."""

import numpy as np
import jax
import jax.numpy as jnp

from softbodysim_tpu.collide.primitives import (
    Colliders, collide_particles, project_ground_plane)
from softbodysim_tpu.kernels.collide import make_fused_collide

ROT = (0.1826, 0.3651, 0.5477, 0.7303)


def _xla_reference(p, w, cols, r, gp, gn):
    pw = project_ground_plane(jnp.asarray(p), r, jnp.asarray(gp),
                              jnp.asarray(gn))
    pw = collide_particles(pw, r, cols)
    return np.where((w != 0)[:, None], np.asarray(pw), p)


def _run(items, v=777, seed=3, ground=True):
    rng = np.random.default_rng(seed)
    p = rng.uniform(-1, 1, (v, 3)).astype(np.float32)
    w = rng.uniform(0, 2, (v,)).astype(np.float32)
    w[::5] = 0.0
    cols = Colliders.build(items) if items else None
    r = 0.03
    gp = np.zeros(3, np.float32)
    gn = np.array([0.0, 1.0, 0.0], np.float32)

    fn = make_fused_collide(cols, ground_enabled=ground, ground_point=gp,
                            ground_normal=gn, radius=r, num_particles=v,
                            interpret=True)
    got = np.asarray(fn(jnp.asarray(p), jnp.asarray(w)))

    if ground:
        want = _xla_reference(p, w, cols, r, gp, gn)
    else:
        pw = collide_particles(jnp.asarray(p), r, cols) if cols else p
        want = np.where((w != 0)[:, None], np.asarray(pw), p)
    np.testing.assert_allclose(got, want, atol=5e-7)


def test_fused_all_primitive_types():
    _run([
        Colliders.sphere((0.0, 0.2, 0.0), 0.4),
        Colliders.box((0.5, 0.0, -0.3), (0.3, 0.2, 0.25), rotation=ROT),
        Colliders.capsule((-0.5, 0.1, 0.3), 0.2, 0.3, rotation=ROT),
    ])


def test_fused_ground_only():
    _run([], ground=True)


def test_fused_many_colliders():
    items = [Colliders.sphere((0.1 * i - 0.5, 0.0, 0.0), 0.15)
             for i in range(10)]
    _run(items)


def test_fused_no_ground():
    _run([Colliders.sphere((0.0, 0.0, 0.0), 0.5)], ground=False)


def test_fused_unaligned_particle_count():
    # V not a multiple of 128*block: padding path
    _run([Colliders.sphere((0.0, 0.0, 0.0), 0.5)], v=129)
    _run([Colliders.sphere((0.0, 0.0, 0.0), 0.5)], v=8193)


def test_jacobi_solver_with_pallas_matches_xla():
    """Force use_pallas='on' (interpret on CPU) and compare whole-sim
    trajectories against use_pallas='off'."""
    from softbodysim_tpu import Engine, SolverParams
    from softbodysim_tpu.core import meshes
    import softbodysim_tpu.kernels.collide as kc

    # monkeypatch-free: interpret is selected inside make_fused_collide only
    # via arg; patch the factory default through a wrapper
    orig = kc.make_fused_collide

    def interp_factory(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    kc.make_fused_collide = interp_factory
    try:
        topo = meshes.tet_cube(2, 2, 2, size=0.5, center=(0.0, 0.8, 0.0))
        items = [Colliders.sphere((0.0, 0.2, 0.0), 0.25)]
        cols = Colliders.build(items)
        p_on = SolverParams(dialect="jacobi", substeps=2, iterations=4,
                            use_pallas="on")
        p_off = p_on.replace(use_pallas="off")
        a = Engine(topo, p_on, colliders=cols)
        b = Engine(topo, p_off, colliders=cols)
        for _ in range(30):
            a.step(1 / 60)
            b.step(1 / 60)
        # trajectories with collider contact amplify ulp-level kernel
        # differences; the pure collide math parity is 5e-7 (tests above)
        np.testing.assert_allclose(a.positions(), b.positions(), atol=2e-4)
    finally:
        kc.make_fused_collide = orig
