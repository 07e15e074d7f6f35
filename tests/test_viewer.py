"""Animation export: playable single-file WebGL viewer (L8 artifact)."""

import os

import numpy as np

from softbodysim_tpu import Engine, SolverParams
from softbodysim_tpu.core import meshes
from softbodysim_tpu.render.viewer import AnimationRecorder, export_html


def test_export_html_roundtrip(tmp_path):
    topo = meshes.tet_ball(subdivisions=1, radius=0.3, center=(0, 0.8, 0))
    eng = Engine(topo, SolverParams(dialect="xpbd", substeps=1, iterations=2))
    rec = AnimationRecorder()
    rec.add_body(topo.surface_tris, eng.positions)
    for _ in range(5):
        eng.step(1 / 60)
        rec.capture()
    out = str(tmp_path / "anim.html")
    rec.export(out, fps=60, title="test")
    html = open(out).read()
    assert "webgl2" in html
    assert f"NV={topo.num_particles}" in html
    assert "NF=5" in html
    # embedded buffer decodes back to the captured frames
    import base64, re
    b64 = re.search(r'Float32Array\(decode\("([^"]+)"\)\)', html).group(1)
    arr = np.frombuffer(base64.b64decode(b64), np.float32).reshape(
        5, topo.num_particles, 3)
    np.testing.assert_allclose(arr[-1], eng.positions(), atol=1e-6)


def test_multi_body_concat(tmp_path):
    t1 = meshes.tet_ball(subdivisions=1, radius=0.2, center=(0, 0.5, 0))
    t2 = meshes.tet_ball(subdivisions=1, radius=0.2, center=(0.6, 0.5, 0))
    e1 = Engine(t1, SolverParams(dialect="xpbd", substeps=1, iterations=1))
    e2 = Engine(t2, SolverParams(dialect="xpbd", substeps=1, iterations=1))
    rec = AnimationRecorder()
    rec.add_body(t1.surface_tris, e1.positions)
    rec.add_body(t2.surface_tris, e2.positions)
    for _ in range(3):
        e1.step(1 / 60)
        e2.step(1 / 60)
        rec.capture()
    out = rec.export(str(tmp_path / "two.html"))
    assert os.path.getsize(out) > 1000
    nv = t1.num_particles + t2.num_particles
    assert f"NV={nv}" in open(out).read()


def test_obj_sequence_export(tmp_path):
    frames = np.random.default_rng(0).standard_normal((3, 4, 3)) \
        .astype(np.float32)
    tris = np.array([[0, 1, 2], [0, 2, 3]])
    rec = AnimationRecorder()
    it = iter(list(frames))
    rec.add_body(tris, lambda: frames[0])
    rec._frames = list(frames)          # bypass capture for a direct check
    out = rec.export(str(tmp_path / "a.html"), obj_dir=str(tmp_path / "objs"))
    assert os.path.exists(out)
    assert sorted(os.listdir(tmp_path / "objs")) == [
        "frame_00000.obj", "frame_00001.obj", "frame_00002.obj"]


def test_export_html_lit_textured(tmp_path):
    """Lit path (VERDICT r3 #7): UVs + texture + per-frame normals embed;
    mirrors SoftBodyGpuRenderLit.shader:58-97."""
    from softbodysim_tpu.render.viewer import checker_texture, export_html_lit

    topo = meshes.tet_ball(subdivisions=1, radius=0.3, center=(0, 0.8, 0))
    eng = Engine(topo, SolverParams(dialect="xpbd", substeps=1, iterations=2))
    frames = []
    for _ in range(3):
        eng.step(1 / 60)
        frames.append(eng.positions())
    frames = np.stack(frames)
    uvs = np.random.default_rng(0).random((topo.num_particles, 2)) \
        .astype(np.float32)
    tex = checker_texture(64, 4)
    out = export_html_lit(str(tmp_path / "lit.html"), frames,
                          topo.surface_tris, uvs, texture=tex)
    html = open(out).read()
    assert "Blinn-Phong" in html and "TW=64" in html
    # embedded uv + texture buffers decode back exactly
    import base64, re
    m = re.search(r'uv=new Float32Array\(decode\("([^"]+)"\)\)', html)
    arr = np.frombuffer(base64.b64decode(m.group(1)), np.float32)
    np.testing.assert_array_equal(arr.reshape(-1, 2), uvs)
    m = re.search(r'tex=new Uint8Array\(decode\("([^"]+)"\)\)', html)
    t = np.frombuffer(base64.b64decode(m.group(1)), np.uint8)
    np.testing.assert_array_equal(t, tex.reshape(-1))


def test_recorder_lit_dispatch(tmp_path):
    """AnimationRecorder exports the lit viewer when every body has UVs."""
    topo = meshes.tet_ball(subdivisions=1, radius=0.3, center=(0, 0.6, 0))
    eng = Engine(topo, SolverParams(dialect="xpbd", substeps=1, iterations=1))
    rec = AnimationRecorder()
    rec.add_body(topo.surface_tris, eng.positions,
                 uvs=np.zeros((topo.num_particles, 2)))
    rec.capture()
    out = rec.export(str(tmp_path / "l.html"))
    assert "Blinn-Phong" in open(out).read()


def test_load_obj_uv_parses_reference_fumo():
    from softbodysim_tpu.core.meshes import load_obj_uv

    path = "/root/reference/Assets/Models/cirno_low.obj"
    import os
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference checkout unavailable")
    v, f, uv = load_obj_uv(path)
    assert len(v) == 5050 and len(f) == 10000
    assert uv.shape == (5050, 2)
    assert (uv.min() >= -1e-6) and (uv.max() <= 1.0 + 1e-6)
    assert (np.abs(uv).sum(1) > 0).mean() > 0.95   # UVs actually assigned
