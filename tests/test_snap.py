"""Surface-conforming snap for the voxel tetrahedralizer.

The reference's tetrahedralizer plugin produces body-fitted tets whose
boundary IS the render surface (Tetrahedralizer.cs:131-220, consumed at
SoftBodyTetMeshAsset.cs:25-81).  snap_to_surface closes the voxel
tetrahedralizer's conformity gap: boundary vertices are projected onto the
input surface (iterative relax-and-project with a tet-quality clamp) and a
first-order normal offset matches the enclosed volume.  Round-2 VERDICT
"Missing #1" / next-round item #5: volume error <2% on the four reference
meshes, solver stability preserved.
"""

import glob
import os

import numpy as np
import pytest

from softbodysim_tpu.core import meshes
from softbodysim_tpu.core.tetrahedralize import (
    closest_point_on_triangles, mesh_volume, project_to_surface,
    snap_to_surface, tetrahedralize, tets_volume, topology_from_mesh)

GEN = "/root/reference/Assets/SoftBody/Generated"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(GEN), reason="reference assets not mounted")


def _tet_vols(x, t):
    p = np.asarray(x, np.float64)[t]
    return np.einsum(
        "ti,ti->t", np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]),
        p[:, 3] - p[:, 0]) / 6.0


# ---------------------------------------------------------------- projection

def test_projection_matches_bruteforce():
    """The pruned closest-point query is exact vs the all-triangles form."""
    sv, st = meshes.icosphere(3)
    sv64 = sv.astype(np.float64)
    p0, p1, p2 = sv64[st[:, 0]], sv64[st[:, 1]], sv64[st[:, 2]]
    rng = np.random.default_rng(7)
    pts = rng.uniform(-1.4, 1.4, (200, 3))
    got = project_to_surface(pts, sv, st)
    cand = closest_point_on_triangles(pts, p0, p1, p2)
    d2 = np.sum((cand - pts[:, None]) ** 2, axis=2)
    want = cand[np.arange(len(pts)), np.argmin(d2, axis=1)]
    dg = np.linalg.norm(got - pts, axis=1)
    dw = np.linalg.norm(want - pts, axis=1)
    np.testing.assert_allclose(dg, dw, atol=1e-12)


def test_projection_lands_on_unit_sphere():
    sv, st = meshes.icosphere(4)
    pts = np.array([[3.0, 0, 0], [0, -2.0, 0], [0.1, 0.2, 5.0]])
    proj = project_to_surface(pts, sv, st)
    r = np.linalg.norm(proj, axis=1)
    assert (np.abs(r - 1.0) < 0.01).all()


# -------------------------------------------------------------- volume error

def test_sphere_volume_error_under_2pct():
    sv, st = meshes.icosphere(3)
    ref = mesh_volume(sv, st)
    for res in (8, 12):
        v, t = tetrahedralize(sv, st, resolution=res)
        v2 = snap_to_surface(v, t, sv, st)
        err = abs(tets_volume(v2, t) - ref) / ref
        assert err < 0.02, (res, err)


def test_boundary_lands_on_surface():
    """Post-snap boundary vertices sit within a small fraction of a cell
    of the true surface (the volume-match offset is the only residual)."""
    from softbodysim_tpu.core.topology import build_edges_and_surface

    sv, st = meshes.icosphere(3)
    v, t = tetrahedralize(sv, st, resolution=12)
    v2 = snap_to_surface(v, t, sv, st)
    _, btris = build_edges_and_surface(v2, t)
    bset = np.unique(btris.reshape(-1))
    d = np.linalg.norm(
        project_to_surface(v2[bset], sv, st) - v2[bset], axis=1)
    cell = 2.0 / 12
    assert d.mean() < 0.05 * cell
    assert d.max() < 0.25 * cell


@needs_reference
@pytest.mark.parametrize("pattern,res", [
    ("Bunny-LowPoly_Tet 1", 16),
    ("Icosphere_Tet", 12),
    ("Icosphere.001_Tet", 12),
    ("default_Tet 10", 16),
])
def test_reference_mesh_volume_error_under_2pct(pattern, res):
    """VERDICT round-2 item #5 acceptance: <2% enclosed-volume error on the
    four reference mesh families (surfaces taken from the reference's own
    generated assets)."""
    from softbodysim_tpu.io.unity_assets import parse_tet_asset

    path = sorted(glob.glob(f"{GEN}/{pattern}.asset"))[0]
    d = parse_tet_asset(path)
    sv = d["vertices"]
    st = d["surfaceTriIds"].reshape(-1, 3)
    ref = mesh_volume(sv, st)
    if ref < 0:
        st = st[:, ::-1]
        ref = -ref
    v, t = tetrahedralize(sv, st, resolution=res)
    v2 = snap_to_surface(v, t, sv, st)
    err = abs(tets_volume(v2, t) - ref) / ref
    assert err < 0.02, err


# ------------------------------------------------------------- quality clamp

def test_no_inverted_or_degenerate_tets():
    sv, st = meshes.icosphere(3)
    v, t = tetrahedralize(sv, st, resolution=10)
    vols0 = _tet_vols(v, t)
    v2 = snap_to_surface(v, t, sv, st, quality_min=0.05)
    vols = _tet_vols(v2, t)
    # same sign and at least the floor fraction of the original volume
    ratio = vols / vols0
    assert (ratio > 0.049).all()


def test_quality_clamp_on_thin_slab():
    """A one-cell-thick slab makes every vertex a boundary vertex; a naive
    full projection would flatten tets.  The clamp must keep them alive."""
    # thin box: 4 x 0.3 x 4 so the voxelization is a single cell layer
    box_v = np.array([
        [0, 0, 0], [4, 0, 0], [4, 0.3, 0], [0, 0.3, 0],
        [0, 0, 4], [4, 0, 4], [4, 0.3, 4], [0, 0.3, 4],
    ], np.float32)
    box_f = np.array([
        [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
        [0, 1, 5], [0, 5, 4], [3, 6, 2], [3, 7, 6],
        [0, 4, 7], [0, 7, 3], [1, 2, 6], [1, 6, 5],
    ])
    v, t = tetrahedralize(box_v, box_f, cell=0.29)
    assert len(t) > 0
    vols0 = _tet_vols(v, t)
    v2 = snap_to_surface(v, t, box_v, box_f)
    vols = _tet_vols(v2, t)
    assert (vols / vols0 > 0.049).all()
    assert np.isfinite(v2).all()


# -------------------------------------------------------- end-to-end solver

def test_snapped_mesh_simulates_stably():
    """Drop a snapped ball on the ground: energy dissipates, no NaNs, rests
    at the ground plane (same stability contract as the voxel-hull tests)."""
    from softbodysim_tpu.api.engine import Engine
    from softbodysim_tpu.core.state import SolverParams

    sv, st = meshes.icosphere(2)
    topo = topology_from_mesh(
        sv + np.array([0, 1.5, 0], np.float32), st, resolution=6)
    params = SolverParams(substeps=2, iterations=4,
                          ground_enabled=True, ground_y=0.0)
    eng = Engine(topo, params)
    for _ in range(120):
        eng.step(1 / 60)
    pos = np.asarray(eng.positions())
    assert np.isfinite(pos).all()
    assert pos[:, 1].min() > -0.05       # not through the floor
    assert pos[:, 1].max() < 2.6         # not exploding


def test_snap_flag_off_keeps_voxel_hull():
    sv, st = meshes.icosphere(2)
    t_raw = topology_from_mesh(sv, st, resolution=8, snap=False)
    t_snap = topology_from_mesh(sv, st, resolution=8)
    assert t_raw.num_tets == t_snap.num_tets
    # raw keeps lattice positions (all multiples of cell from the origin
    # corner); snapped boundary moved
    assert not np.allclose(t_raw.vertices, t_snap.vertices)
    r_raw = np.linalg.norm(t_raw.vertices, axis=1).max()
    r_snap = np.linalg.norm(t_snap.vertices, axis=1).max()
    assert r_snap <= r_raw + 1e-5
