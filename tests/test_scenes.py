"""Reference scene presets (SampleScene / 4fumoTest / ExtremeTest /
BatchTest analogs)."""

import numpy as np
import pytest

from softbodysim_tpu.api.scenes import (
    batch_test, extreme_test, four_body_test, sample_scene)


def test_sample_scene_runs():
    scene = sample_scene()
    assert len(scene.bodies) == 1
    world = scene.build_world()
    for _ in range(20):
        world.step()
    pos = world.positions()["fumo"]
    assert np.isfinite(pos).all()


def test_four_body_layout():
    scene = four_body_test()
    assert len(scene.bodies) == 4
    # distinct drop positions
    centers = [t.vertices.mean(axis=0) for _, t, _, _ in scene.bodies]
    d01 = np.linalg.norm(centers[0] - centers[1])
    assert d01 > 0.5


def test_extreme_test_composition():
    scene = extreme_test()
    assert len(scene.bodies) == 24
    names = [n for n, _, _, _ in scene.bodies]
    assert sum(n.startswith("ball") for n in names) == 16
    assert sum(n.startswith("cirno") for n in names) == 8
    p = scene.bodies[0][2]
    assert p.edge_stiffness == pytest.approx(0.5)
    assert p.volume_stiffness == pytest.approx(1.0)


def test_grouped_scene_engine_runs():
    """Grouped (per-family vmapped) execution of ExtremeTest's shape."""
    import numpy as np

    scene = extreme_test()
    eng = scene.build_grouped()
    for _ in range(10):
        eng.step(1 / 60)
    eng.block()
    out = eng.positions()
    assert len(out) == 24
    for name, pos in out:
        assert np.isfinite(pos).all()


def test_grouped_matches_world_prefix():
    """Grouped and per-body execution agree pre-contact (same solver)."""
    import numpy as np

    scene = four_body_test()
    grouped = scene.build_grouped()
    world = scene.build_world()
    for _ in range(8):
        grouped.step(1 / 60)
        world.step()
    gpos = dict(grouped.positions())
    for i, (name, pos) in enumerate(world.positions().items()):
        np.testing.assert_allclose(gpos[f"fumo#{i}"], pos, atol=1e-4)


def test_batch_test_composition():
    scene = batch_test()
    assert len(scene.bodies) == 20
    total_particles = sum(t.num_particles for _, t, _, _ in scene.bodies)
    # with reference assets: 10*162 + 10*8613 ~= 87k particles (SURVEY:
    # "~90k particles scene-wide"); procedural fallback is smaller
    assert total_particles > 10_000


def test_extreme_test_merged_runs():
    """ExtremeTest as ONE merged mesh (the TPU scene fast path) -- gather
    backend keeps this CPU-quick; the pallas variant is covered by
    test_jacobi_pallas.py::test_merged_scene_matches_separate_bodies."""
    import numpy as np

    scene = extreme_test()
    eng, voffs = scene.build_merged(backend="gather")
    assert len(voffs) == len(scene.bodies) + 1
    eng.run(8, 1 / 60)
    pos = eng.positions()
    assert np.isfinite(pos).all()
    assert pos.shape[0] == voffs[-1]


def test_merged_carries_per_body_pinned():
    """Per-body pinned indices offset into the merged vertex space."""
    import numpy as np
    from softbodysim_tpu.api.scenes import Scene, _params
    from softbodysim_tpu.core import meshes

    t1 = meshes.tet_cube(2, 2, 2, size=0.4, center=(-0.6, 1.0, 0.0))
    t2 = meshes.tet_cube(2, 2, 2, size=0.4, center=(0.6, 1.0, 0.0))
    p = _params()
    scene = Scene(name="pin", colliders=[], bodies=[
        ("free", t1, p, {}), ("pinned", t2, p, {"pinned": [0, 1]})])
    eng, voffs = scene.build_merged(backend="gather")
    eng.run(8, 1 / 60)
    pos = eng.positions()
    held = pos[voffs[1]:voffs[1] + 2]
    np.testing.assert_allclose(held, t2.vertices[:2], atol=1e-6)
    assert pos[:voffs[1], 1].min() < t1.vertices[:, 1].min() - 1e-3


def test_merged_mixed_stiffness_matches_separate():
    """Bodies with different stiffness merge via per-constraint tables
    (the reference's per-SoftBodySolver tunables)."""
    import numpy as np
    from softbodysim_tpu import Engine
    from softbodysim_tpu.api.scenes import Scene, _params
    from softbodysim_tpu.core import meshes

    t1 = meshes.tet_cube(2, 2, 2, size=0.4, center=(-0.6, 0.5, 0.0))
    t2 = meshes.tet_cube(2, 2, 2, size=0.4, center=(0.6, 0.5, 0.0))
    pa = _params(edge=0.9, vol=0.98)
    pb = _params(edge=0.3, vol=0.5)
    scene = Scene(name="mixed", colliders=[],
                  bodies=[("stiff", t1, pa, {}), ("soft", t2, pb, {})])
    eng, voffs = scene.build_merged(backend="gather")
    sep = [Engine(t1, pa.replace(jacobi_backend="gather")),
           Engine(t2, pb.replace(jacobi_backend="gather"))]
    for _ in range(20):
        eng.step(1 / 60)
        for s in sep:
            s.step(1 / 60)
    pos = eng.positions()
    np.testing.assert_allclose(pos[voffs[0]:voffs[1]], sep[0].positions(),
                               atol=2e-5)
    np.testing.assert_allclose(pos[voffs[1]:voffs[2]], sep[1].positions(),
                               atol=2e-5)


def test_merged_rejects_nonstiffness_param_mix():
    import pytest
    from softbodysim_tpu.api.scenes import Scene, _params
    from softbodysim_tpu.core import meshes

    t = meshes.tet_cube(2, 2, 2)
    scene = Scene(name="bad", colliders=[], bodies=[
        ("a", t, _params(), {}), ("b", t, _params(omega=1.0), {})])
    with pytest.raises(ValueError):
        scene.build_merged()


def test_partitioned_mixed_dialect_matches_separate():
    """A mixed-dialect all-unique-mesh world partitions into exactly TWO
    merged programs (one per dialect; stiffness differences merge as
    per-constraint tables) and each body tracks its solo engine."""
    import numpy as np
    from softbodysim_tpu import Engine, SolverParams
    from softbodysim_tpu.api.scenes import Scene, _params
    from softbodysim_tpu.core import meshes

    tj1 = meshes.tet_cube(2, 2, 2, size=0.4, center=(-0.9, 0.6, 0.0))
    tj2 = meshes.tet_cube(3, 2, 2, size=0.4, center=(0.0, 0.6, 0.0))
    tx1 = meshes.tet_cube(2, 3, 2, size=0.4, center=(0.9, 0.6, 0.0))
    pj1 = _params(edge=0.9, vol=0.98)
    pj2 = _params(edge=0.3, vol=0.5)
    px = SolverParams(dialect="xpbd", substeps=2, iterations=6)
    scene = Scene(name="mix", colliders=[], bodies=[
        ("j1", tj1, pj1, {}), ("x1", tx1, px, {}), ("j2", tj2, pj2, {})])
    part = scene.build_partitioned(backend="gather")
    assert part.num_programs == 2
    solos = {
        "j1": Engine(tj1, pj1.replace(jacobi_backend="gather")),
        "j2": Engine(tj2, pj2.replace(jacobi_backend="gather")),
        "x1": Engine(tx1, px.replace(xpbd_backend="gather")),
    }
    for _ in range(15):
        part.step(1 / 60)
        for s in solos.values():
            s.step(1 / 60)
    pos = part.positions()
    assert set(pos) == {"j1", "j2", "x1"}
    for nm, solo in solos.items():
        np.testing.assert_allclose(pos[nm], solo.positions(), atol=2e-5)


def test_partitioned_solo_kwargs_body():
    """Bodies with per-body options beyond density/pinned become singleton
    engines with exact per-body semantics."""
    from softbodysim_tpu.api.scenes import Scene, _params
    from softbodysim_tpu.core import meshes

    t1 = meshes.tet_cube(2, 2, 2, size=0.4, center=(-0.6, 0.6, 0.0))
    t2 = meshes.tet_cube(2, 2, 2, size=0.4, center=(0.6, 0.6, 0.0))
    p = _params()
    scene = Scene(name="solo", colliders=[], bodies=[
        ("plain", t1, p, {}),
        ("pinned_top", t2, p, {"pin_top_layer": True})])
    part = scene.build_partitioned(backend="gather")
    assert part.num_programs == 2
    part.run(10, 1 / 60)
    pos = part.positions()
    # the pin_top_layer body's top layer held still
    top = t2.vertices[:, 1] >= t2.vertices[:, 1].max() - 1e-6
    import numpy as np
    np.testing.assert_allclose(pos["pinned_top"][top],
                               t2.vertices[top], atol=1e-6)
    assert pos["plain"][:, 1].min() < t1.vertices[:, 1].min() - 1e-3
