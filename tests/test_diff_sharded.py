"""Reverse-mode autodiff through the SHARDED steps (VERDICT r3 #2).

Probe results (tools/probe_sharded_grad.py, 8-device CPU mesh): jacobi
mesh-sharded and vertex-sharded reverse programs compile and match the
single-device rollout gradient at ~2e-6 relative; the xpbd sharded
reverse programs hit the XLA transpose pathology (round 3f).  These
tests pin the working surface: gradient parity for both jacobi sharded
modes and an end-to-end sharded diff.fit.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softbodysim_tpu import SolverParams, diff
from softbodysim_tpu.core import meshes
from softbodysim_tpu.core.state import init_state
from softbodysim_tpu.parallel import (
    make_mesh, make_mesh_sharded_step, make_sharded_step)

DT = 1.0 / 60.0
NSTEPS = 4


@pytest.fixture(scope="module")
def topo():
    return meshes.tet_cube(3, 3, 3, size=0.5, center=(0.0, 0.5, 0.0))


def _params():
    return SolverParams(dialect="jacobi", substeps=1, iterations=3,
                        jacobi_backend="segment", use_pallas="off")


def _loss_fn(step_fn, state0):
    def run(x0):
        st = dataclasses.replace(state0, x=x0, x_star=x0)

        def body(s, _):
            return step_fn(s, DT), None

        st, _ = jax.lax.scan(body, st, None, length=NSTEPS)
        return jnp.sum(st.x * st.x)

    return run


def _ref_grad(topo):
    from softbodysim_tpu.solver import make_step

    state0 = init_state(topo)
    g = jax.jit(jax.grad(_loss_fn(make_step(topo, _params()), state0)))
    return np.asarray(g(state0.x))


def test_mesh_sharded_grad_matches_single(topo):
    ref = _ref_grad(topo)
    mesh = make_mesh((1, 8))
    sstep = make_mesh_sharded_step(topo, _params(), mesh)

    def one(st, dt):
        batched = jax.tree_util.tree_map(lambda a: a[None], st)
        return jax.tree_util.tree_map(lambda a: a[0],
                                      sstep(batched, dt))

    state0 = init_state(topo)
    g = jax.jit(jax.grad(_loss_fn(one, state0)))(state0.x)
    np.testing.assert_allclose(np.asarray(g), ref,
                               atol=1e-3 * max(1.0, np.abs(ref).max()))


def test_vertex_sharded_grad_matches_single(topo):
    ref = _ref_grad(topo)
    mesh = make_mesh((8,), axis_names=("model",))
    sstep = make_sharded_step(topo, _params(), mesh, axis="model")
    state0 = init_state(topo)
    g = jax.jit(jax.grad(_loss_fn(sstep, state0)))(state0.x)
    np.testing.assert_allclose(np.asarray(g), ref,
                               atol=1e-3 * max(1.0, np.abs(ref).max()))


def test_sharded_fit_recovers_stiffness():
    """End-to-end: diff.fit(mesh=...) recovers a misfit edge stiffness
    from a sharded batched rollout.  Hanging cube (pinned top, gravity
    sag) so the trajectory is strongly stiffness-sensitive -- a free
    drop's trajectory difference is sub-f32-MSE (test_diff.py uses the
    same scenario)."""
    htopo = meshes.tet_cube(3, 3, 3, size=0.4)
    top = np.where(htopo.vertices[:, 1]
                   >= htopo.vertices[:, 1].max() - 1e-6)[0]
    true = SolverParams(dialect="jacobi", substeps=2, iterations=2,
                        ground_enabled=False, edge_stiffness=0.5,
                        jacobi_backend="segment", use_pallas="off")
    mesh = make_mesh((8, 1))
    B = 8
    base = init_state(htopo, pinned=top, inv_mass_mode="density")
    state0 = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), base)
    truth_roll = diff.make_rollout(htopo, true, dt=DT, nsteps=12,
                                   mesh=mesh)
    target = np.asarray(truth_roll(state0))

    res = diff.fit(htopo, true.replace(edge_stiffness=0.15), target,
                   dt=DT, fit_params=("edge_stiffness",), state0=state0,
                   steps=60, learning_rate=0.25, mesh=mesh)
    assert res.losses[-1] < 0.05 * res.losses[0]
    import math
    assert abs(math.log(res.params["edge_stiffness"] / 0.5)) \
        < math.log(1.25)


def test_xpbd_sharded_rollout_grad_via_custom_vjp(topo):
    """xpbd sharded rollout: distributed forward, single-device scatter
    backward (diff._sharded_xpbd_custom_vjp).  Gradient must match the
    single-device rollout gradient; the pathological sharded reverse
    program is never compiled."""
    params = SolverParams(dialect="xpbd", substeps=1, iterations=3,
                          xpbd_backend="scatter", use_pallas="off")
    n = 3

    ref_roll = diff.make_rollout(topo, params, dt=DT, nsteps=n)
    state0 = init_state(topo)

    def ref_loss(x0):
        st = dataclasses.replace(state0, x=x0, x_star=x0)
        return jnp.sum(jnp.square(ref_roll(st)))

    ref = np.asarray(jax.jit(jax.grad(ref_loss))(state0.x))

    mesh = make_mesh((1, 8))
    sh_roll = diff.make_rollout(topo, params, dt=DT, nsteps=n, mesh=mesh)
    b0 = jax.tree_util.tree_map(lambda a: a[None], state0)

    def sh_loss(x0):
        st = dataclasses.replace(b0, x=x0[None], x_star=x0[None])
        return jnp.sum(jnp.square(sh_roll(st)))

    g = np.asarray(jax.jit(jax.grad(sh_loss))(state0.x))
    np.testing.assert_allclose(g, ref,
                               atol=1e-3 * max(1.0, np.abs(ref).max()))
