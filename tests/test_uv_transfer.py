"""UV transfer by quantized-position matching (ApplySourceMeshAttributes
semantics)."""

import numpy as np

from softbodysim_tpu.core import meshes
from softbodysim_tpu.render import transfer_uvs, write_obj_with_uvs


def test_identity_fast_path():
    pos = np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32)
    uvs = np.random.default_rng(1).random((10, 2)).astype(np.float32)
    out = transfer_uvs(pos, uvs, pos)
    np.testing.assert_array_equal(out, uvs)


def test_subset_and_permutation_match():
    rng = np.random.default_rng(2)
    src_pos = rng.normal(size=(20, 3)).astype(np.float32)
    src_uvs = rng.random((20, 2)).astype(np.float32)
    perm = rng.permutation(20)[:12]
    dst_pos = src_pos[perm]
    out = transfer_uvs(src_pos, src_uvs, dst_pos)
    np.testing.assert_allclose(out, src_uvs[perm])


def test_unmatched_get_zero():
    src_pos = np.zeros((1, 3), np.float32)
    src_uvs = np.ones((1, 2), np.float32)
    dst = np.array([[0, 0, 0], [5, 5, 5]], np.float32)
    out = transfer_uvs(src_pos, src_uvs, dst)
    np.testing.assert_array_equal(out[0], [1, 1])
    np.testing.assert_array_equal(out[1], [0, 0])


def test_sim_mesh_uv_pipeline(tmp_path):
    """icosphere render mesh -> tet ball surface keeps matching UVs."""
    verts, faces = meshes.icosphere(1)
    # fake spherical UVs on the render mesh
    uvs = np.stack([
        0.5 + np.arctan2(verts[:, 2], verts[:, 0]) / (2 * np.pi),
        0.5 + np.arcsin(np.clip(verts[:, 1], -1, 1)) / np.pi], axis=1
    ).astype(np.float32)

    topo = meshes.tet_ball(1, 1.0)  # surface verts == icosphere verts
    out = transfer_uvs(verts, uvs, topo.vertices)
    surface = np.unique(topo.surface_tris)
    # all surface vertices matched (same positions)
    nonzero = np.abs(out[surface]).sum(axis=1) > 0
    assert nonzero.mean() > 0.95

    path = str(tmp_path / "ball.obj")
    write_obj_with_uvs(path, topo.vertices, topo.surface_tris, out)
    text = open(path).read()
    assert text.count("vt ") == topo.num_particles
    assert "f 1/1" in text or "f " in text
