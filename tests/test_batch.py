"""Batched (vmapped) scenes: equivalence with per-scene stepping and
randomized-stiffness datagen (BASELINE config #5)."""

import numpy as np
import jax

from softbodysim_tpu import Engine, SolverParams
from softbodysim_tpu.core import meshes
from softbodysim_tpu.parallel import (
    BatchedEngine, init_batch_state, make_batched_step, sample_stiffness)

DT = 1.0 / 60.0


def test_batched_equals_single():
    topo = meshes.tet_cube(2, 2, 2, center=(0.0, 0.5, 0.0))
    params = SolverParams(dialect="xpbd", substeps=2, iterations=4)

    beng = BatchedEngine(topo, params, batch=3)
    seng = Engine(topo, params)
    for _ in range(30):
        beng.step(DT)
        seng.step(DT)
    bpos = beng.positions()
    spos = seng.positions()
    for b in range(3):
        # vmapped and single programs reassociate fp slightly differently
        np.testing.assert_allclose(bpos[b], spos, atol=5e-6)


def test_randomized_stiffness_diversifies():
    topo = meshes.tet_cube(2, 2, 2, center=(0.0, 0.4, 0.0))
    params = SolverParams(dialect="jacobi", substeps=2, iterations=4)
    batch = 8
    key = jax.random.PRNGKey(7)
    ks = sample_stiffness(key, batch, 0.2, 1.0)
    kv = np.full((batch,), 0.98, np.float32)

    eng = BatchedEngine(topo, params, batch=batch, randomized_stiffness=True)
    for _ in range(40):
        eng.step(DT, ks, kv)
    pos = eng.positions()
    assert np.isfinite(pos).all()
    # different stiffness -> different shapes
    spread = np.abs(pos - pos[:1]).max(axis=(1, 2))
    assert (spread[1:] > 1e-4).all()


def test_pos_jitter_batch_init():
    topo = meshes.tet_cube(2, 2, 2)
    st = init_batch_state(topo, 4, pos_jitter=0.01,
                          key=jax.random.PRNGKey(0))
    x = np.asarray(st.x)
    assert x.shape == (4, topo.num_particles, 3)
    assert not np.allclose(x[0], x[1])
    # x_star must match jittered x
    np.testing.assert_allclose(np.asarray(st.x_star), x)


def test_large_batch_steps():
    """A 512-scene vmapped batch steps and stays finite (datagen shape)."""
    topo = meshes.tet_ball(subdivisions=1, radius=0.3, center=(0, 0.6, 0))
    params = SolverParams(dialect="jacobi", substeps=2, iterations=4)
    eng = BatchedEngine(topo, params, batch=512, pos_jitter=0.005)
    for _ in range(5):
        eng.step(DT)
    assert np.isfinite(eng.positions()).all()
