"""Moving colliders + dynamic body transforms (per-step snapshots without
recompilation -- SoftBodyManager.RebuildColliderCache /
CacheStepDataMainThread parity)."""

import numpy as np
import pytest

from softbodysim_tpu import Colliders, Engine, SolverParams
from softbodysim_tpu.core import meshes

DT = 1.0 / 60.0


def test_moving_sphere_pushes_body():
    """A sphere sweeping through a resting ball must displace it; pose
    updates must not recompile (checked via jit cache misses)."""
    import jax

    topo = meshes.tet_ball(1, 0.2, (0.0, 0.22, 0.0))
    items = [Colliders.sphere((-2.0, 0.25, 0.0), 0.3)]
    params = SolverParams(dialect="jacobi", substeps=2, iterations=6,
                          particle_radius=0.02, gravity=(0, -10.0, 0),
                          use_pallas="off")
    eng = Engine(topo, params, colliders=Colliders.build(items))
    for _ in range(30):  # settle
        eng.step(DT)
    x_before = eng.positions().mean(axis=0)

    compiles_before = eng._step._cache_size()
    # sweep the sphere through the ball
    for k in range(60):
        cx = -2.0 + 4.0 * k / 60.0
        eng.update_colliders(
            Colliders.build([Colliders.sphere((cx, 0.25, 0.0), 0.3)]))
        eng.step(DT)
    assert eng._step._cache_size() == compiles_before  # no recompiles

    x_after = eng.positions().mean(axis=0)
    moved = np.linalg.norm(x_after - x_before)
    assert moved > 0.1, f"ball should have been shoved, moved={moved}"
    assert np.isfinite(eng.positions()).all()


def test_moving_collider_xpbd():
    topo = meshes.tet_cube(2, 2, 2, size=0.4, center=(0.0, 0.21, 0.0))
    items = [Colliders.box((-2.0, 0.2, 0.0), (0.25, 0.25, 0.25))]
    params = SolverParams(dialect="xpbd", substeps=2, iterations=6)
    eng = Engine(topo, params, colliders=Colliders.build(items))
    for _ in range(30):
        eng.step(DT)
    x0 = eng.positions().mean(axis=0)
    for k in range(60):
        cx = -2.0 + 4.0 * k / 60.0
        eng.update_colliders(
            Colliders.build([Colliders.box((cx, 0.2, 0.0),
                                           (0.25, 0.25, 0.25))]))
        eng.step(DT)
    assert np.linalg.norm(eng.positions().mean(axis=0) - x0) > 0.1


def test_runtime_colliders_without_template_rejected():
    topo = meshes.single_tet()
    eng = Engine(topo, SolverParams(dialect="xpbd"))
    with pytest.raises(ValueError):
        eng.step(DT, colliders_rt=Colliders.build(
            [Colliders.sphere((0, 0, 0), 1.0)]))


def test_dynamic_body_transform():
    """Body simulated in local space with a per-step moving transform:
    gravity follows the transform (transformed into local frame) and
    world-space ground collision stays consistent."""
    from softbodysim_tpu.solver import make_jacobi_step
    from softbodysim_tpu.core.state import init_state
    import jax
    import numpy as np

    topo = meshes.tet_cube(2, 2, 2, size=0.4, center=(0.0, 0.0, 0.0))
    params = SolverParams(dialect="jacobi", substeps=1, iterations=4,
                          particle_radius=0.02, use_pallas="off")

    eye = np.eye(4, dtype=np.float32)
    step = jax.jit(make_jacobi_step(topo, params, local_to_world=eye,
                                    world_to_local=eye))
    state = init_state(topo, inv_mass_mode="density")

    # body frame raised 1m: world ground at y=0 is local y=-1
    l2w = eye.copy(); l2w[1, 3] = 1.0
    w2l = eye.copy(); w2l[1, 3] = -1.0
    for _ in range(240):
        state = step(state, DT, local_to_world_rt=l2w,
                     world_to_local_rt=w2l)
    x = np.asarray(state.x)
    # rests at local y ~= -1 + radius
    assert abs(x[:, 1].min() - (-0.98)) < 2e-2
