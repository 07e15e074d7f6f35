"""Stage-split device profiling -- the reference's stage taxonomy on TPU.

The reference times predict/solve/commit/pack (C++, Sim.cpp:289-300) and
Cache/Pre/Solve/Post/Upload/Norm (Unity, SoftBodyManager.cs:205-236).  A
fused jitted step cannot be split from the outside, so this module builds
*separately jitted* stage functions and times them with block_until_ready
fences -- accurate stage attribution at the cost of fusion across stages
(report totals from the fused step, stage shares from here).

For kernel-level truth use ``trace()`` which wraps jax.profiler for XLA/
Pallas traces viewable in xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core.state import SimState, SolverParams
from ..solver.xpbd import (
    commit, edge_color_sweep, predict, project_ground, tet_color_sweep)


def profile_xpbd_stages(topology, params: SolverParams, state: SimState,
                        dt: float = 1.0 / 60.0, repeats: int = 20
                        ) -> Dict[str, float]:
    """Per-stage average milliseconds for the XPBD dialect, stage taxonomy
    matching Sim.cpp: predict / solve_edges / solve_tets / ground / commit.
    """
    edges = jnp.asarray(topology.edges, jnp.int32)
    edge_rest = jnp.asarray(topology.edge_rest, jnp.float32)
    tets = jnp.asarray(topology.tets, jnp.int32)
    tet_rest = jnp.asarray(topology.tet_rest_vol, jnp.float32)
    e_idx = jnp.asarray(topology.edge_colors.idx, jnp.int32)
    e_mask = jnp.asarray(topology.edge_colors.mask)
    t_idx = jnp.asarray(topology.tet_colors.idx, jnp.int32)
    t_mask = jnp.asarray(topology.tet_colors.mask)
    gravity = jnp.asarray(params.gravity, jnp.float32)

    sdt = jnp.float32(dt / max(1, params.substeps))
    inv_dt2 = float(1.0 / (float(sdt) * float(sdt)))
    e_alpha = jnp.float32(max(0.0, params.edge_compliance) * inv_dt2)
    t_alpha = jnp.float32(max(0.0, params.volume_compliance) * inv_dt2)

    @jax.jit
    def f_predict(st):
        return predict(st, gravity, sdt)

    @jax.jit
    def f_edges(x_star, lam, w):
        def body(c, grp):
            xs, l = c
            return edge_color_sweep(xs, l, w, edges, edge_rest, grp[0],
                                    grp[1], e_alpha), None
        (x_star, lam), _ = jax.lax.scan(body, (x_star, lam), (e_idx, e_mask))
        return x_star, lam

    @jax.jit
    def f_tets(x_star, lam, w):
        def body(c, grp):
            xs, l = c
            return tet_color_sweep(xs, l, w, tets, tet_rest, grp[0], grp[1],
                                   t_alpha), None
        (x_star, lam), _ = jax.lax.scan(body, (x_star, lam), (t_idx, t_mask))
        return x_star, lam

    @jax.jit
    def f_ground(x_star, w):
        return project_ground(x_star, w, params.ground_y)

    @jax.jit
    def f_commit(st):
        return commit(st, params, sdt)

    def timed(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / repeats * 1000.0

    w = state.inv_mass
    st1 = f_predict(state)
    return {
        "predict_ms": timed(f_predict, state),
        "solve_edges_ms": timed(f_edges, st1.x_star, st1.edge_lambda, w),
        "solve_tets_ms": timed(f_tets, st1.x_star, st1.tet_lambda, w),
        "ground_ms": timed(f_ground, st1.x_star, w),
        "commit_ms": timed(f_commit, st1),
    }


def profile_jacobi_stages(topology, params: SolverParams, state: SimState,
                          dt: float = 1.0 / 60.0, repeats: int = 20
                          ) -> Dict[str, float]:
    """Per-stage average ms for the jacobi dialect -- the Unity manager's
    Pre/Solve(Edges|Volumes|Collide)/Post taxonomy
    (SoftBodyManager.cs:205-236)."""
    from ..solver.jacobi import (apply_delta, edge_jacobi_deltas,
                                 tet_jacobi_deltas)
    from ..collide.primitives import project_ground_plane

    edges = jnp.asarray(topology.edges, jnp.int32)
    edge_rest = jnp.asarray(topology.edge_rest, jnp.float32)
    tets = jnp.asarray(topology.tets, jnp.int32)
    tet_rest = jnp.asarray(topology.tet_rest_vol, jnp.float32)
    nv = topology.num_particles
    grav = jnp.asarray(params.gravity, jnp.float32)
    sdt = jnp.float32(dt / max(1, params.substeps))

    @jax.jit
    def f_pre(st):
        pinned = (st.inv_mass == 0.0)[:, None]
        v = jnp.where(pinned, 0.0, st.v + grav * sdt)
        return jnp.where(pinned, st.x, st.x + v * sdt)

    @jax.jit
    def f_edges(x, w):
        d, c = edge_jacobi_deltas(x, w, edges, edge_rest,
                                  params.edge_stiffness, nv)
        return apply_delta(x, w, d, c, params.sor_omega)

    @jax.jit
    def f_tets(x, w):
        d, c = tet_jacobi_deltas(x, w, tets, tet_rest,
                                 params.volume_stiffness, nv)
        return apply_delta(x, w, d, c, params.sor_omega)

    @jax.jit
    def f_collide(x):
        return project_ground_plane(
            x, params.particle_radius,
            jnp.asarray(params.ground_point, jnp.float32),
            jnp.asarray(params.ground_normal, jnp.float32))

    @jax.jit
    def f_post(st, x_pred):
        pinned = (st.inv_mass == 0.0)[:, None]
        inv_dt = 1.0 / sdt
        v = jnp.where(pinned, 0.0, (x_pred - st.x) * inv_dt)
        return jnp.where(pinned, st.x, x_pred), v

    def timed(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / repeats * 1000.0

    x_pred = f_pre(state)
    w = state.inv_mass
    return {
        "pre_ms": timed(f_pre, state),
        "solve_edges_ms": timed(f_edges, x_pred, w),
        "solve_volumes_ms": timed(f_tets, x_pred, w),
        "collide_ms": timed(f_collide, x_pred),
        "post_ms": timed(f_post, state, x_pred),
    }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/softbodysim_trace"):
    """XLA/Pallas profiler trace context (open with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def trace_summary(log_dir: str, top: int = 20):
    """Aggregate device-op durations from a jax.profiler trace directory
    (written by ``trace()``): returns [(total_us, op_name)] sorted by
    time -- the 'where did the step go' view without tensorboard."""
    import collections
    import glob
    import gzip
    import json

    agg = collections.Counter()
    for fn in glob.glob(log_dir + "/**/*.trace.json.gz", recursive=True):
        with gzip.open(fn, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                agg[ev.get("name", "?")] += ev["dur"]
    return [(dur, name) for name, dur in agg.most_common(top)]


def step_rate(step_fn, state, dt, steps: int = 50,
              warmup: int = 3) -> Dict[str, float]:
    """End-to-end steps/sec for any jitted step fn (the FPS counter)."""
    for _ in range(warmup):
        state = step_fn(state, dt)
    jax.block_until_ready(state.x)
    t0 = time.perf_counter()
    for _ in range(steps):
        state = step_fn(state, dt)
    jax.block_until_ready(state.x)
    elapsed = time.perf_counter() - t0
    return {"steps_per_sec": steps / elapsed,
            "ms_per_step": elapsed / steps * 1000.0}
