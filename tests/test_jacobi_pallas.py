"""Jacobi-dialect Pallas pass kernels (kernels/jacobi.py) vs the NumPy
oracle and the XLA gather backend.

Unlike the XPBD sweeps there is no ordering approximation: the Pallas
passes must match the other jacobi backends up to fp32 summation order.

Step counts are deliberately small: interpret-mode pallas runs a Python
TPU simulator per grid step per scan iteration (~seconds per sim step),
and parity drift only shrinks with fewer steps.  Bodies start near
contact so ground/collider projection is still exercised."""

import numpy as np

from softbodysim_tpu import Colliders, Engine, SolverParams
from softbodysim_tpu.core import meshes

from oracle import JacobiOracle

DT = 1.0 / 60.0


def _params(**kw):
    base = dict(dialect="jacobi", substeps=2, iterations=6,
                edge_stiffness=0.9, volume_stiffness=0.98, sor_omega=1.4,
                particle_radius=0.02, gravity=(0.0, -10.0, 0.0),
                jacobi_backend="pallas", use_pallas="off")
    base.update(kw)
    return SolverParams(**base)


def test_cube_drop_matches_oracle():
    topo = meshes.tet_cube(3, 3, 3, size=0.5, center=(0.0, 0.3, 0.0))
    params = _params()
    eng = Engine(topo, params)
    oracle = JacobiOracle(topo, params)
    for _ in range(30):
        eng.step(DT)
        oracle.step(DT)
    # ground contact happened (cube started 0.05 above it)
    assert oracle.x[:, 1].min() < 0.1
    np.testing.assert_allclose(eng.positions(), oracle.x, atol=2e-4)


def test_agrees_with_gather_backend():
    """Default params AND per-step stiffness overrides agree with the
    gather backend -- overrides are traced scalars, so both phases reuse
    ONE compiled pallas program (interpret compiles are ~1 min each)."""
    topo = meshes.tet_ball(1, 0.3, (0.0, 0.35, 0.0))
    a = Engine(topo, _params())
    b = Engine(topo, _params(jacobi_backend="gather"))
    for _ in range(16):
        a.step(DT)
        b.step(DT)
    np.testing.assert_allclose(a.positions(), b.positions(), atol=2e-5)
    np.testing.assert_allclose(a.velocities(), b.velocities(), atol=2e-3)
    ov = dict(edge_stiffness=0.5, volume_stiffness=0.7, sor_omega=1.1)
    for _ in range(8):
        a.step(DT, **ov)
        b.step(DT, **ov)
    np.testing.assert_allclose(a.positions(), b.positions(), atol=3e-5)


def test_pinned_cloth_edges_only():
    topo, pinned = meshes.cloth_patch(9, 9)
    params = _params(ground_enabled=False)
    a = Engine(topo, params, pinned=pinned)
    b = Engine(topo, _params(jacobi_backend="gather", ground_enabled=False),
               pinned=pinned)
    for _ in range(16):
        a.step(DT)
        b.step(DT)
    p = a.positions()
    np.testing.assert_allclose(p[pinned], topo.vertices[pinned], atol=1e-6)
    np.testing.assert_allclose(p, b.positions(), atol=2e-5)


def test_colliders_and_runtime_poses():
    topo = meshes.tet_cube(3, 3, 3, size=0.4, center=(0.0, 0.55, 0.0))
    items = [Colliders.sphere((0.0, 0.2, 0.0), 0.25)]
    cols = Colliders.build(items)
    params = _params()
    eng = Engine(topo, params, colliders=cols)
    oracle = JacobiOracle(topo, params, colliders=items)
    for _ in range(20):
        eng.step(DT)
        oracle.step(DT)
    # the sphere collider holds the cube up: free fall over 20 steps would
    # put the bottom near -0.2, resting on the sphere keeps it ~0.45
    assert 0.2 < oracle.x[:, 1].min() < 0.55
    np.testing.assert_allclose(eng.positions(), oracle.x, atol=2e-4)
    # runtime collider poses recompile nothing and keep matching
    moved = [Colliders.sphere((0.05, 0.2, 0.0), 0.25)]
    eng.update_colliders(Colliders.build(moved))
    oracle2 = JacobiOracle(topo, params, colliders=moved)
    oracle2.x = oracle.x.copy()
    oracle2.v = oracle.v.copy()
    for _ in range(8):
        eng.step(DT)
        oracle2.step(DT)
    np.testing.assert_allclose(eng.positions(), oracle2.x, atol=2e-4)


def test_step_n_equals_repeated_step():
    topo = meshes.tet_cube(3, 3, 3, size=0.5, center=(0.0, 0.8, 0.0))
    from softbodysim_tpu.core.state import init_state
    from softbodysim_tpu.solver import make_step

    step = make_step(topo, _params())
    s_loop = init_state(topo)
    for _ in range(8):
        s_loop = step(s_loop, DT)
    s_n = step.step_n(init_state(topo), DT, 8)
    np.testing.assert_allclose(np.asarray(s_n.x), np.asarray(s_loop.x),
                               atol=1e-6)


def test_pallas_rejects_unsupported_features():
    import numpy as np
    import pytest

    topo = meshes.tet_cube(2, 2, 2)
    from softbodysim_tpu.solver import make_step

    # local-space transforms are still gather-only on the pallas backend
    with pytest.raises(ValueError):
        make_step(topo, _params(), local_to_world=np.eye(4),
                  world_to_local=np.eye(4))


def test_merged_scene_matches_separate_bodies():
    """Disjoint-union execution (Scene.build_merged) is exactly per-body
    physics: no constraint crosses a body boundary."""
    from softbodysim_tpu.api.scenes import Scene
    from softbodysim_tpu.core.topology import merge_topologies

    t1 = meshes.tet_cube(2, 2, 2, size=0.4, center=(-0.6, 0.3, 0.0))
    t2 = meshes.tet_ball(1, 0.25, (0.6, 0.35, 0.0))
    params = _params()
    scene = Scene(name="mini", colliders=[],
                  bodies=[("a", t1, params, {}), ("b", t2, params, {})])
    eng, voffs = scene.build_merged()
    sep = [Engine(t1, params), Engine(t2, params)]
    for _ in range(16):
        eng.step(DT)
        for s in sep:
            s.step(DT)
    merged_pos = eng.positions()
    np.testing.assert_allclose(merged_pos[voffs[0]:voffs[1]],
                               sep[0].positions(), atol=2e-5)
    np.testing.assert_allclose(merged_pos[voffs[1]:voffs[2]],
                               sep[1].positions(), atol=2e-5)


def test_merged_rejects_mixed_params():
    import pytest
    from softbodysim_tpu.api.scenes import Scene

    t = meshes.tet_cube(2, 2, 2)
    scene = Scene(name="bad", colliders=[], bodies=[
        ("a", t, _params(), {}), ("b", t, _params(sor_omega=1.0), {})])
    with pytest.raises(ValueError):
        scene.build_merged()


def test_merged_mixed_stiffness_pallas():
    """Per-constraint stiffness tables in the pass kernels (PERK path)
    match separate engines with each body's own stiffness."""
    from softbodysim_tpu.api.scenes import Scene

    t1 = meshes.tet_cube(2, 2, 2, size=0.4, center=(-0.6, 0.3, 0.0))
    t2 = meshes.tet_cube(2, 2, 2, size=0.4, center=(0.6, 0.3, 0.0))
    pa = _params(edge_stiffness=0.9, volume_stiffness=0.98)
    pb = _params(edge_stiffness=0.3, volume_stiffness=0.5)
    scene = Scene(name="mixedp", colliders=[],
                  bodies=[("stiff", t1, pa, {}), ("soft", t2, pb, {})])
    eng, voffs = scene.build_merged()          # pallas PERK kernels
    sep = [Engine(t1, pa), Engine(t2, pb)]
    for _ in range(12):
        eng.step(DT)
        for s in sep:
            s.step(DT)
    pos = eng.positions()
    np.testing.assert_allclose(pos[voffs[0]:voffs[1]], sep[0].positions(),
                               atol=2e-5)
    np.testing.assert_allclose(pos[voffs[1]:voffs[2]], sep[1].positions(),
                               atol=2e-5)


def test_engine_run_chunking_matches_step_loop():
    """Engine.run's chunk+remainder execution (RUN_CHUNK bursts through
    step_n, singles for the tail) is step-for-step identical to .step."""
    topo = meshes.tet_cube(3, 3, 3, size=0.5, center=(0.0, 0.4, 0.0))
    a = Engine(topo, _params())
    b = Engine(topo, _params())
    a.RUN_CHUNK = 4                      # per-instance: cheap compiles
    a.run(9, DT)                         # 2 chunks + 1 single
    for _ in range(9):
        b.step(DT)
    np.testing.assert_allclose(a.positions(), b.positions(), atol=1e-6)


def test_self_collision_matches_gather_backend():
    """Spatial-hash self-collision runs between the Pallas passes on the
    permuted row layout (dead lanes statically isolated) and matches the
    XLA gather backend.  particle_radius > lattice spacing so bonded
    neighbors overlap and the stage fires from step one; max_per_cell
    covers every possible hash bucket on BOTH layouts (V=64 public,
    vpad=128 permuted incl. dead lanes) so the hit sets are identical and
    only fp32 summation order differs."""
    topo = meshes.tet_cube(3, 3, 3, size=0.5, center=(0.0, 0.3, 0.0))
    kw = dict(particle_radius=0.15, self_collision=True,
              self_collision_cell=0.3, self_collision_max_per_cell=128)
    a = Engine(topo, _params(**kw))
    b = Engine(topo, _params(jacobi_backend="gather", **kw))
    c = Engine(topo, _params(jacobi_backend="gather",
                             particle_radius=0.15))   # stage-off control
    for _ in range(12):
        a.step(DT)
        b.step(DT)
        c.step(DT)
    # the stage did something (min_dist 2*0.15 > lattice spacing 0.167 =>
    # immediate neighbor push-out), and both backends agree on what
    assert np.abs(b.positions() - c.positions()).max() > 1e-3
    np.testing.assert_allclose(a.positions(), b.positions(), atol=2e-5)
    np.testing.assert_allclose(a.velocities(), b.velocities(), atol=2e-3)


def test_surface_collision_matches_gather_backend():
    """Vertex-triangle surface collision runs between the Pallas passes on
    the permuted row layout (triangle corner ids remapped old->row, dead
    lanes parked far away) and matches the XLA gather backend.  Stiffness
    is zeroed so the constraint passes are exact no-ops: overlapping-ball
    contact is CHAOTIC (measured: the gather and segment XLA backends
    drift apart to 2e-2 in 6 steps from fp32 summation order alone), so
    the pin isolates predict -> surface -> commit, where only the surface
    stage's own summation order differs between layouts (~1e-7/call).
    The balls overlap within surface_thickness at t=0 so the stage fires
    immediately; max_per_cell covers every hash bucket on both layouts so
    the hit sets are identical."""
    from softbodysim_tpu.core.adjacency import combine_topologies

    b1 = meshes.tet_ball(1, 0.25, (0.0, 0.5, 0.0))
    b2 = meshes.tet_ball(1, 0.25, (0.42, 0.5, 0.0))
    merged, _ = combine_topologies([b1, b2])
    kw = dict(surface_collision=True, surface_thickness=0.06,
              surface_collision_max_per_cell=256,
              edge_stiffness=0.0, volume_stiffness=0.0,
              substeps=1, iterations=2,
              gravity=(0.0, 0.0, 0.0), ground_enabled=False)
    a = Engine(merged, _params(**kw))
    b = Engine(merged, _params(jacobi_backend="gather", **kw))
    c = Engine(merged, _params(
        jacobi_backend="gather", edge_stiffness=0.0, volume_stiffness=0.0,
        substeps=1, iterations=2, gravity=(0.0, 0.0, 0.0),
        ground_enabled=False))                        # stage-off control
    for _ in range(2):
        a.step(DT)
        b.step(DT)
        c.step(DT)
    assert np.abs(b.positions() - c.positions()).max() > 1e-4  # stage fired
    np.testing.assert_allclose(a.positions(), b.positions(), atol=2e-5)
    np.testing.assert_allclose(a.velocities(), b.velocities(), atol=2e-3)
