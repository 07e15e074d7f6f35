"""Unity SoftBodyTetMeshAsset loader vs the reference's shipped assets."""

import os

import numpy as np
import pytest

from softbodysim_tpu.io.unity_assets import load_tet_asset, parse_tet_asset

GEN = "/root/reference/Assets/SoftBody/Generated"

needs_reference = pytest.mark.skipif(
    not os.path.isdir(GEN), reason="reference assets not mounted")


@needs_reference
def test_icosphere_counts_match_survey():
    t = load_tet_asset(os.path.join(GEN, "Icosphere_Tet.asset"))
    # SURVEY.md: Icosphere V=162, T=425, E=746
    assert t.num_particles == 162
    assert t.num_tets == 425
    assert t.num_edges == 746
    assert len(t.surface_tris) == 320  # icosphere subdiv-2 surface


@needs_reference
def test_bunny_counts_match_survey():
    t = load_tet_asset(os.path.join(GEN, "Bunny-LowPoly_Tet 1.asset"))
    # SURVEY.md: Bunny-LowPoly V=276, T=798, E=1297
    assert (t.num_particles, t.num_tets, t.num_edges) == (276, 798, 1297)


@needs_reference
def test_asset_simulates():
    from softbodysim_tpu import Engine, SolverParams

    t = load_tet_asset(os.path.join(GEN, "Icosphere_Tet.asset"))
    eng = Engine(t, SolverParams(dialect="xpbd", substeps=1, iterations=4))
    eng.run(20, 1.0 / 60.0)
    assert np.isfinite(eng.positions()).all()


@needs_reference
def test_parse_entire_asset_corpus():
    """All 157 shipped .asset files parse with consistent index bounds
    (runs in ~1.5 s; the parser is pure line scanning)."""
    import glob

    files = sorted(glob.glob(os.path.join(GEN, "*.asset")))
    assert len(files) >= 100
    for f in files:
        raw = parse_tet_asset(f)
        nv = len(raw["vertices"])
        assert nv > 0 and raw["tetIds"].size > 0
        assert raw["tetIds"].max() < nv
        assert raw["edgeIds"].max() < nv
        assert raw["surfaceTriIds"].max() < nv


@needs_reference
def test_raw_parse_shapes():
    raw = parse_tet_asset(os.path.join(GEN, "Icosphere_Tet.asset"))
    assert raw["tetIds"].size % 4 == 0
    assert raw["edgeIds"].size % 2 == 0
    assert raw["surfaceTriIds"].size % 3 == 0
    assert raw["tetIds"].max() < len(raw["vertices"])
