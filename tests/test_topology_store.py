"""Topology persistence (.tet.npz) + the tetra CLI workflow."""

import numpy as np

from softbodysim_tpu import Engine, SolverParams
from softbodysim_tpu.core import meshes
from softbodysim_tpu.io import load_topology, save_topology, write_obj


def test_roundtrip_preserves_everything(tmp_path):
    topo = meshes.tet_ball(1, 0.3, (0.0, 0.5, 0.0))
    path = str(tmp_path / "ball.tet.npz")
    save_topology(path, topo)
    out = load_topology(path)
    np.testing.assert_array_equal(out.vertices, topo.vertices)
    np.testing.assert_array_equal(out.tets, topo.tets)
    np.testing.assert_array_equal(out.edges, topo.edges)
    np.testing.assert_array_equal(out.surface_tris, topo.surface_tris)
    np.testing.assert_allclose(out.edge_rest, topo.edge_rest)
    np.testing.assert_allclose(out.tet_rest_vol, topo.tet_rest_vol)
    # colorings rebuilt identically (same deterministic greedy scan)
    np.testing.assert_array_equal(out.edge_colors.order,
                                  topo.edge_colors.order)


def test_obj_to_asset_to_sim_workflow(tmp_path):
    """The full SoftBodyTetMeshAsset-generation analog: OBJ -> tetra CLI ->
    load -> simulate."""
    from softbodysim_tpu.__main__ import main as cli

    verts, faces = meshes.icosphere(2)
    verts = verts * 0.4 + np.array([0, 0.8, 0], np.float32)
    obj_path = str(tmp_path / "ball.obj")
    write_obj(obj_path, verts, faces)

    asset_path = str(tmp_path / "ball.tet.npz")
    cli(["tetra", obj_path, "-o", asset_path, "--resolution", "8"])

    topo = load_topology(asset_path)
    assert topo.num_tets > 50
    eng = Engine(topo, SolverParams(dialect="xpbd", substeps=1,
                                    iterations=4))
    eng.run(20, 1.0 / 60.0)
    assert np.isfinite(eng.positions()).all()
