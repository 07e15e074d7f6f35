"""Native (C++) topology lib vs NumPy fallbacks: results must be identical,
and the voxel tetrahedralizer must produce valid closed topology."""

import numpy as np
import pytest

from softbodysim_tpu.core import meshes
from softbodysim_tpu.core.native import (
    available, native_build_topology, native_greedy_color, native_voxelize)
from softbodysim_tpu.core.tetrahedralize import (
    tetrahedralize, topology_from_mesh, voxelize_numpy)
from softbodysim_tpu.core.topology import (
    build_edges_and_surface, build_topology, greedy_color)

needs_native = pytest.mark.skipif(
    not available(), reason="native lib not built")


@needs_native
def test_native_matches_python_topology():
    topo_src = meshes.tet_cube(3, 3, 3)
    v, t = topo_src.vertices, topo_src.tets.astype(np.int64)
    edges_py, tris_py = build_edges_and_surface(v, t)
    edges_n, tris_n, ecol_n, tcol_n = native_build_topology(v, t)

    np.testing.assert_array_equal(edges_n, edges_py)
    np.testing.assert_array_equal(tris_n, tris_py)
    np.testing.assert_array_equal(ecol_n, greedy_color(edges_py, len(v)))
    np.testing.assert_array_equal(tcol_n, greedy_color(t, len(v)))


@needs_native
def test_native_greedy_color_matches():
    topo = meshes.tet_ball(1, 0.5)
    cols = native_greedy_color(topo.edges, topo.num_particles)
    np.testing.assert_array_equal(
        cols, greedy_color(topo.edges, topo.num_particles))


@needs_native
def test_native_voxelize_matches_numpy():
    verts, faces = meshes.icosphere(2)
    nat = native_voxelize(verts, faces, 0.25)
    py_v, py_t = voxelize_numpy(verts, faces, 0.25)
    assert nat is not None
    nv, nt = nat
    assert len(nv) == len(py_v)
    assert len(nt) == len(py_t)

    def canon(v):
        v = np.round(np.asarray(v, np.float64), 5)
        return v[np.lexsort((v[:, 2], v[:, 1], v[:, 0]))]

    np.testing.assert_allclose(canon(nv), canon(py_v), atol=1e-5)

    def total_vol(v, t):
        p = np.asarray(v)[np.asarray(t, np.int64)]
        vols = np.einsum(
            "ti,ti->t",
            np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]),
            p[:, 3] - p[:, 0]) / 6.0
        return float(np.abs(vols).sum())

    assert total_vol(nv, nt) == pytest.approx(total_vol(py_v, py_t), rel=1e-6)


def test_voxelize_numpy_cube_volume():
    """Voxelizing an axis-aligned cube recovers ~its volume."""
    # closed unit cube surface
    topo = meshes.tet_cube(1, 1, 1)
    v, t = voxelize_numpy(topo.vertices, topo.surface_tris, 0.125)
    assert len(t) > 0
    p = v[t.astype(np.int64)]
    vols = np.einsum(
        "ti,ti->t",
        np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]),
        p[:, 3] - p[:, 0]) / 6.0
    total = float(np.abs(vols).sum())
    assert total == pytest.approx(1.0, rel=0.2)


def test_topology_from_mesh_pipeline_simulates():
    """Full mesh->tets->Topology->simulate pipeline (the TryCreateFromMesh
    capability)."""
    from softbodysim_tpu import Engine, SolverParams

    verts, faces = meshes.icosphere(2)
    verts = verts * 0.4 + np.array([0, 0.8, 0], np.float32)
    topo = topology_from_mesh(verts, faces, resolution=8)
    assert topo.num_tets > 50
    # positive orientation after build_topology
    p = topo.vertices[topo.tets.astype(np.int64)]
    vols = np.einsum(
        "ti,ti->t",
        np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]),
        p[:, 3] - p[:, 0]) / 6.0
    assert (vols > 0).all()

    eng = Engine(topo, SolverParams(dialect="xpbd", substeps=2, iterations=4))
    eng.run(30, 1.0 / 60.0)
    pos = eng.positions()
    assert np.isfinite(pos).all()
    assert pos[:, 1].min() >= -1e-4


def test_tetrahedralize_default_cell():
    verts, faces = meshes.icosphere(1)
    v, t = tetrahedralize(verts, faces, resolution=6)
    assert len(t) > 0
    assert t.max() < len(v)


def test_native_super_packer_matches_python():
    """native/softtopo.cpp::st_pack_super must produce bit-identical plans
    to the Python packer (same stable order, same greedy scan)."""
    import numpy as np
    from softbodysim_tpu.core import meshes
    from softbodysim_tpu.core.native import available
    from softbodysim_tpu.kernels import sweep as sw

    if not available():
        import pytest
        pytest.skip("native lib unavailable")

    from softbodysim_tpu.core.adjacency import combine_topologies

    ball = meshes.tet_ball(2)
    merged, _ = combine_topologies(
        [meshes.tet_ball(1, 0.2, (0.0, 0.5, 0.0)),
         meshes.tet_cube(5, 5, 5, center=(1.0, 0.5, 0.0))])
    for topo in (ball, merged):
        for cons, rest, lcap in ((topo.edges, topo.edge_rest, 2),
                                 (topo.tets, topo.tet_rest_vol, 3)):
            for order_mode in (0, 1):
                for scap in (8, 12):
                    a = sw.pack_superblocks(
                        cons.astype(np.int64), rest,
                        -(-topo.num_particles // 128), slots_cap=scap,
                        layer_cap=lcap, use_native=True,
                        order_mode=order_mode)
                    b = sw.pack_superblocks(
                        cons.astype(np.int64), rest,
                        -(-topo.num_particles // 128), slots_cap=scap,
                        layer_cap=lcap, use_native=False,
                        order_mode=order_mode)
                    for f in ("slots", "rel", "inv", "rest", "perm",
                              "pos_of", "scale"):
                        assert np.array_equal(getattr(a, f),
                                              getattr(b, f)), f
                    assert (a.num_super, a.dmax) == (b.num_super, b.dmax)


@needs_native
def test_native_orient_bit_identical():
    """native st_orient must match orient_tets_positive exactly, including
    zero-volume tets (degenerate: shared corner ids) staying unswapped."""
    from softbodysim_tpu.core.native import native_orient

    rng = np.random.default_rng(0)
    for trial in range(3):
        nv = 400
        v = rng.standard_normal((nv, 3)).astype(np.float32)
        t = rng.integers(0, nv, (5000, 4))
        t[::7, 1] = t[::7, 0]  # exact-zero volumes
        # scalar-faithful NumPy reference (the fallback path's arithmetic)
        tt = np.asarray(t, np.int64).copy()
        p = v[tt]
        vol = np.einsum(
            "ti,ti->t",
            np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]),
            p[:, 3] - p[:, 0]) / 6.0
        neg = vol < 0.0
        b = tt[neg, 1].copy()
        tt[neg, 1] = tt[neg, 2]
        tt[neg, 2] = b
        got = native_orient(v, t)
        assert got is not None
        np.testing.assert_array_equal(got.astype(np.int64), tt)


@needs_native
def test_native_build_random_soup_matches_python():
    """Flat-table dedup vs NumPy on an adversarial tet soup: duplicate tets
    (interior-face counts > 2) and heavy vertex reuse."""
    from softbodysim_tpu.core.topology import orient_tets_positive

    rng = np.random.default_rng(1)
    nv = 300
    v = rng.standard_normal((nv, 3)).astype(np.float32)
    t = rng.integers(0, nv, (2000, 4))
    t[100:110] = t[0]  # duplicated tets
    t = orient_tets_positive(v, t)
    edges_py, tris_py = build_edges_and_surface(v, t)
    edges_n, tris_n, ecol_n, tcol_n = native_build_topology(v, t)
    np.testing.assert_array_equal(edges_n, edges_py)
    np.testing.assert_array_equal(tris_n, tris_py)
    np.testing.assert_array_equal(ecol_n, greedy_color(edges_py, len(v)))
    np.testing.assert_array_equal(tcol_n, greedy_color(t, len(v)))


def test_tet_cube_vectorized_generation():
    """The vectorized tet_cube cell decomposition must match the scalar
    reference loop (parity pattern, cell order) for asymmetric grids."""
    from softbodysim_tpu.core.topology import orient_tets_positive

    nx, ny, nz = 3, 2, 4

    def vid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    even = [(0, 1, 2, 4), (1, 3, 2, 7), (1, 4, 5, 7), (2, 4, 7, 6),
            (1, 2, 4, 7)]
    odd = [(0, 1, 3, 5), (0, 3, 2, 6), (0, 5, 4, 6), (3, 5, 6, 7),
           (0, 3, 5, 6)]
    tets = []
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                c = [vid(i, j, k), vid(i, j, k + 1), vid(i, j + 1, k),
                     vid(i, j + 1, k + 1), vid(i + 1, j, k),
                     vid(i + 1, j, k + 1), vid(i + 1, j + 1, k),
                     vid(i + 1, j + 1, k + 1)]
                pat = even if (i + j + k) % 2 == 0 else odd
                for p in pat:
                    tets.append([c[p[0]], c[p[1]], c[p[2]], c[p[3]]])

    topo = meshes.tet_cube(nx, ny, nz)
    want = orient_tets_positive(topo.vertices, np.asarray(tets, np.int64))
    np.testing.assert_array_equal(topo.tets.astype(np.int64), want)


def test_native_permute_blocks_bit_identical():
    """st_permute_rows == numpy fancy-index gather, any dtype/row shape
    (the regroup_plan table-permute fast path)."""
    from softbodysim_tpu.core import native

    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    for shape, dtype in (((37, 11 * 13), np.int32),
                         ((16, 257), np.float32),
                         ((8, 1), np.int64)):
        a = (rng.standard_normal(shape) * 100).astype(dtype)
        order = rng.permutation(shape[0])
        out = native.native_permute_blocks(a, order)
        np.testing.assert_array_equal(out, a[order])
