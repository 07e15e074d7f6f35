"""Checkpoint/resume, OBJ export, rollout export, vertex normals."""

import os

import numpy as np

from softbodysim_tpu import Engine, SolverParams
from softbodysim_tpu.core import meshes
from softbodysim_tpu.io import (
    ObjSequenceWriter, load_rollout, load_state, params_from_metadata,
    save_rollout, save_state, write_obj)
from softbodysim_tpu.render import make_normals_fn, vertex_normals

DT = 1.0 / 60.0


def test_checkpoint_resume_exact(tmp_path):
    """Resume must be bit-exact: run 40 steps == run 20, save, load, run 20.
    This also exercises lambda persistence across the checkpoint."""
    topo = meshes.tet_cube(2, 2, 2, center=(0.0, 0.6, 0.0))
    params = SolverParams(dialect="xpbd", substeps=2, iterations=6)

    a = Engine(topo, params)
    for _ in range(40):
        a.step(DT)

    b = Engine(topo, params)
    for _ in range(20):
        b.step(DT)
    ckpt = str(tmp_path / "state.npz")
    save_state(ckpt, b.state, params=params, metadata={"step": 20})

    c = Engine(topo, params)
    c.state, meta = load_state(ckpt)
    assert meta["step"] == 20
    for _ in range(20):
        c.step(DT)

    np.testing.assert_array_equal(a.positions(), c.positions())
    np.testing.assert_array_equal(
        np.asarray(a.state.edge_lambda), np.asarray(c.state.edge_lambda))


def test_params_roundtrip(tmp_path):
    topo = meshes.single_tet()
    params = SolverParams(dialect="jacobi", substeps=3, sor_omega=1.7)
    eng = Engine(topo, params)
    ckpt = str(tmp_path / "s.npz")
    save_state(ckpt, eng.state, params=params)
    _, meta = load_state(ckpt)
    p2 = params_from_metadata(meta)
    assert p2.substeps == 3 and p2.sor_omega == 1.7 and p2.dialect == "jacobi"


def test_write_obj_and_sequence(tmp_path):
    topo = meshes.tet_cube(2, 2, 2)
    path = str(tmp_path / "m.obj")
    write_obj(path, topo.vertices, topo.surface_tris)
    lines = open(path).read().splitlines()
    nv = sum(1 for l in lines if l.startswith("v "))
    nf = sum(1 for l in lines if l.startswith("f "))
    assert nv == topo.num_particles
    assert nf == len(topo.surface_tris)

    w = ObjSequenceWriter(str(tmp_path / "seq"), triangles=topo.surface_tris)
    for _ in range(3):
        w.append(topo.vertices)
    assert len(os.listdir(tmp_path / "seq")) == 3


def test_rollout_roundtrip(tmp_path):
    topo = meshes.single_tet()
    eng = Engine(topo, SolverParams())
    frames = []
    for _ in range(5):
        eng.step(DT)
        frames.append(eng.positions())
    path = str(tmp_path / "roll.npz")
    save_rollout(path, frames, dt=np.float32(DT))
    out = load_rollout(path)
    assert out["positions"].shape == (5, 4, 3)
    np.testing.assert_allclose(out["positions"][-1], frames[-1])


def test_vertex_normals_cube():
    """On the rest cube, corner vertex normals must point diagonally out,
    face-center vertices along the axis."""
    topo = meshes.tet_cube(2, 2, 2, size=2.0)
    import jax.numpy as jnp

    n = np.asarray(vertex_normals(
        jnp.asarray(topo.vertices), jnp.asarray(topo.surface_tris)))
    # unit length everywhere
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)
    # outwardness: normal dot (v - center) > 0 for all surface vertices
    on_surface = np.unique(topo.surface_tris)
    d = np.einsum("ij,ij->i", n[on_surface], topo.vertices[on_surface])
    assert (d > 0).all()
    # interior-only vertices got the (0,1,0) fallback? cube 2x2x2 has a center
    interior = np.setdiff1d(np.arange(topo.num_particles), on_surface)
    if len(interior):
        np.testing.assert_allclose(n[interior], [[0.0, 1.0, 0.0]] * len(interior))


def test_make_normals_fn_jitted():
    topo = meshes.tet_ball(1, 0.5)
    import jax.numpy as jnp

    fn = make_normals_fn(topo)
    n = np.asarray(fn(jnp.asarray(topo.vertices)))
    # sphere: normals ~ radial direction for surface vertices
    on_surface = np.unique(topo.surface_tris)
    v = topo.vertices[on_surface]
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    cos = np.einsum("ij,ij->i", n[on_surface], v)
    assert cos.min() > 0.9
