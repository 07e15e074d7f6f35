"""Differentiable simulation: ``jax.grad`` through the solver.

A capability the reference (C#/HLSL/C++ — SoftBodySolver.cs, Sim.cpp)
cannot express, falling straight out of this framework's TPU-first
functional design: every solver stage is a pure jax function composed
under ``lax.scan``, so an N-step rollout is reverse-differentiable
end-to-end.  Use cases:

- **Material estimation / system identification**: recover
  compliance/stiffness from an observed trajectory (``fit``).
- **Initial-condition optimization**: trajectory shaping by
  differentiating through ``make_rollout`` w.r.t. the initial state.
- **Scene tuning**: gradients w.r.t. any traced override the step
  exposes (per-dialect material scalars, SOR omega).

Backends: only the XLA solver paths differentiate (xpbd
"gather"/"scatter", jacobi "gather"/"segment").  The Pallas kernels are
forward-only — input/output-aliased scatter kernels define no VJP — so
``make_rollout`` forces a differentiable backend (and the XLA collider
path) regardless of what the params request.

Memory: reverse-mode through N steps stores O(N · state) residuals.
Each step is wrapped in ``jax.checkpoint`` (rematerialization) by
default, the standard TPU recipe trading recompute FLOPs for HBM so
long rollouts fit; pass ``remat=False`` for short rollouts where the
residuals fit anyway.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .core.state import SimState, SolverParams, init_state
from .solver import make_step

# Traced material overrides each dialect's step accepts (solver/xpbd.py
# step(); solver/jacobi.py step()) — the fittable parameter surface.
# "gravity_override" (xpbd, a (3,) vector) is accepted by make_rollout but
# not by fit(), whose scalar log-space machinery doesn't apply to signed
# vectors — differentiate through make_rollout directly for it.
FITTABLE: Dict[str, Tuple[str, ...]] = {
    "xpbd": ("edge_compliance", "volume_compliance", "friction"),
    "jacobi": ("edge_stiffness", "volume_stiffness", "sor_omega"),
}
_ROLLOUT_ONLY: Dict[str, Tuple[str, ...]] = {
    "xpbd": ("gravity_override",),
    "jacobi": (),
}


def differentiable_params(params: SolverParams) -> SolverParams:
    """Return ``params`` with every forward-only (Pallas) path replaced by
    its differentiable XLA twin.  Physics is identical for the jacobi
    dialect and for xpbd up to constraint ordering (colored-GS instead of
    the block-synchronous Pallas dialect).

    Backend choice: "scatter" (xpbd) / "segment" (jacobi) unless the
    caller explicitly picked another XLA backend.  The gather backends
    produce identical gradients but their reverse-mode programs compile
    ~15x slower on XLA:CPU (measured: 213 s vs 15 s for one substep on
    one core) — scatter's transpose is a cheap gather, gather's is the
    scatter XLA struggles with."""
    kw = {}
    if params.dialect == "xpbd" and params.xpbd_backend not in (
            "gather", "scatter"):
        kw["xpbd_backend"] = "scatter"
    if params.dialect == "jacobi" and params.jacobi_backend not in (
            "gather", "segment"):
        kw["jacobi_backend"] = "segment"
    if params.use_pallas != "off":
        kw["use_pallas"] = "off"
    return params.replace(**kw) if kw else params


def make_rollout(topology, params: SolverParams, *, dt: float, nsteps: int,
                 colliders=None, remat: bool = True, mesh=None,
                 data_axis: str = "data", model_axis: str = "model"):
    """Build ``rollout(state0, overrides=None) -> (nsteps, V, 3)``: the
    position trajectory of ``nsteps`` solver steps, differentiable w.r.t.
    both ``state0`` and the traced material ``overrides`` dict (keys from
    ``FITTABLE[params.dialect]``).

    ``mesh`` (a jax.sharding.Mesh with ``data_axis``/``model_axis``):
    DISTRIBUTED differentiable rollout -- the step is the constraint-
    sharded multi-chip path (parallel/sharding.make_mesh_sharded_step
    for jacobi, make_xpbd_sharded_step behind a custom-vjp for xpbd --
    see _sharded_xpbd_custom_vjp), state0 is batched with a leading
    scene axis sharded over ``data_axis``, and the returned trajectory
    is (nsteps, B, V, 3).  For jacobi, reverse-mode flows through the
    psum collectives directly at ~1e-6 gradient parity; for xpbd the
    backward linearizes the single-device scatter twin (same function;
    traced material overrides are jacobi-only under a mesh).  Tests:
    tests/test_diff_sharded.py."""
    p = differentiable_params(params)
    allowed = FITTABLE[p.dialect] + _ROLLOUT_ONLY[p.dialect]
    if mesh is not None:
        if p.dialect == "jacobi":
            from .parallel.sharding import make_mesh_sharded_step

            allowed = FITTABLE["jacobi"]      # the traced-scalar surface
            step = make_mesh_sharded_step(topology, p, mesh,
                                          colliders=colliders,
                                          data_axis=data_axis,
                                          model_axis=model_axis)
        else:
            # xpbd: the sharded steps' reverse-mode programs hit an XLA
            # transpose pathology (round 3f / round 4 probes: the colored
            # gather chain transposes into a scatter form XLA:CPU takes
            # 10+ min to compile inside shard_map).  custom-vjp fallback:
            # the sharded step computes the SAME function as the
            # single-device colored-GS step (tests assert 1e-5), so the
            # backward pass may legally linearize the single-device
            # scatter-backend twin (whose transpose is a cheap gather) --
            # distributed forward, single-device backward.
            allowed = ()                      # traced overrides: not yet
            step = _sharded_xpbd_custom_vjp(topology, p, mesh,
                                            colliders, data_axis,
                                            model_axis, dt)
    else:
        step = make_step(topology, p, colliders=colliders)

    def one(state: SimState, overrides) -> SimState:
        return step(state, dt, **overrides)

    one_ck = jax.checkpoint(one) if remat else one

    def rollout(state0: SimState, overrides=None):
        ov = dict(overrides or {})
        bad = set(ov) - set(allowed)
        if bad:
            raise ValueError(
                f"overrides {sorted(bad)} not fittable for dialect "
                f"{p.dialect!r}; allowed: {allowed}")

        def body(st, _):
            st2 = one_ck(st, ov)
            return st2, st2.x

        _, xs = jax.lax.scan(body, state0, None, length=nsteps)
        return xs

    return rollout


def _sharded_xpbd_custom_vjp(topology, p: SolverParams, mesh, colliders,
                             data_axis, model_axis, dt):
    """Distributed xpbd forward with a single-device backward.

    The constraint-sharded xpbd step (parallel/sharding.
    make_xpbd_sharded_step) computes the same function as the
    single-device colored-GS step at public state boundaries
    (tests/test_sharding.py asserts 1e-5), but its reverse-mode program
    hits the XLA transpose pathology (round 3f; reconfirmed round 4:
    XLA:CPU's slow-compile alarm fires and compilation runs 10+ min).
    So: custom_vjp with the sharded program as forward and the
    linearization of the single-device SCATTER-backend twin (transpose =
    cheap gather, ~15 s compile) as backward.  Gradients match the
    single-device rollout to fp32 reassociation tolerance; the backward
    recomputes one single-device forward per step (the usual remat
    trade)."""
    from .parallel.sharding import make_xpbd_sharded_step

    sharded = make_xpbd_sharded_step(topology, p, mesh,
                                     colliders=colliders,
                                     data_axis=data_axis,
                                     model_axis=model_axis)
    single = make_step(topology, p.replace(xpbd_backend="scatter"),
                       colliders=colliders)
    vm_single = jax.vmap(lambda s: single(s, dt))

    @jax.custom_vjp
    def one(state):
        return sharded(state, dt)

    def fwd(state):
        return sharded(state, dt), state

    def bwd(state_saved, ct):
        _, vjp_fn = jax.vjp(vm_single, state_saved)
        return vjp_fn(ct)

    one.defvjp(fwd, bwd)
    return lambda state, _dt, **_ov: one(state)


def make_trajectory_loss(topology, params: SolverParams, target, *,
                         dt: float, state0: Optional[SimState] = None,
                         pinned=None, colliders=None, remat: bool = True,
                         observed=None, mesh=None):
    """Build ``loss(overrides) -> scalar``: mean squared position error of
    a rollout against ``target``.  Differentiable; feed to ``jax.grad`` /
    any optax optimizer (``fit`` does).

    ``observed``: optional (K,) vertex indices — real captures see only
    markers or the surface, not interior vertices.  With it, ``target``
    is (nsteps, K, 3) and the loss compares only those rows (e.g.
    ``observed=topology.surface_tris`` flattened-unique for surface-only
    system identification)."""
    target = jnp.asarray(target, jnp.float32)
    if observed is not None:
        obs_np = np.unique(np.asarray(observed, np.int64).reshape(-1))
        if len(obs_np) and (obs_np[0] < 0
                            or obs_np[-1] >= topology.num_particles):
            # JAX would silently CLAMP out-of-bounds gathers -> the loss
            # would compare wrong vertices and fit() converge to garbage
            raise ValueError(
                f"observed ids must be in [0, {topology.num_particles}); "
                f"got range [{obs_np[0]}, {obs_np[-1]}]")
        observed = jnp.asarray(obs_np, jnp.int32)
        want = (int(observed.shape[0]), 3)
    else:
        want = (topology.num_particles, 3)
    if mesh is not None:
        # sharded rollouts are scene-batched: target (nsteps, B, V|K, 3)
        if target.ndim != 4 or target.shape[2:] != want:
            raise ValueError(
                f"sharded target must be (nsteps, B, {want[0]}, 3), "
                f"got {target.shape}")
        if state0 is None:
            raise ValueError("sharded loss needs an explicit batched "
                             "state0 (shard it over the data axis)")
    elif target.ndim != 3 or target.shape[1:] != want:
        raise ValueError(
            f"target must be (nsteps, {want[0]}, 3), got {target.shape}")
    rollout = make_rollout(topology, params, dt=dt,
                           nsteps=int(target.shape[0]),
                           colliders=colliders, remat=remat, mesh=mesh)
    if state0 is None:
        state0 = init_state(topology, pinned=pinned)

    def loss(overrides) -> jax.Array:
        traj = rollout(state0, overrides)
        if observed is not None:
            traj = (traj[:, :, observed] if mesh is not None
                    else traj[:, observed])
        return jnp.mean(jnp.square(traj - target))

    return loss


class FitResult(NamedTuple):
    params: Dict[str, float]     # fitted values, physical space
    losses: np.ndarray           # loss before each update + final loss
    converged: bool              # final loss <= tol * initial loss


def fit(topology, params: SolverParams, target, *, dt: float,
        fit_params: Sequence[str] = ("edge_compliance",),
        init: Optional[Dict[str, float]] = None,
        state0: Optional[SimState] = None, pinned=None, colliders=None,
        steps: int = 100, learning_rate: float = 0.2, optimizer=None,
        log_space: bool = True, remat: bool = True,
        tol: float = 1e-2, observed=None, mesh=None) -> FitResult:
    """Recover material parameters from an observed trajectory.

    Minimizes mean squared position error of an ``nsteps``-long rollout
    against ``target`` — (nsteps, V, 3), or (nsteps, K, 3) with
    ``observed`` (K,) vertex ids when only markers/surface are captured —
    over the named ``fit_params``
    (subset of ``FITTABLE[params.dialect]``), starting from ``init``
    values (default: the values in ``params``).  ``log_space=True``
    optimizes ``log(p)`` so positivity is structural and the step size is
    scale-free — compliance spans decades.  Optimizer: optax adam at
    ``learning_rate`` unless an optax transform is passed.
    """
    import optax

    names = tuple(fit_params)
    allowed = FITTABLE[params.dialect]
    bad = set(names) - set(allowed)
    if bad:
        raise ValueError(f"fit_params {sorted(bad)} not fittable for "
                         f"dialect {params.dialect!r}; allowed: {allowed}")
    loss_of_ov = make_trajectory_loss(
        topology, params, target, dt=dt, state0=state0, pinned=pinned,
        colliders=colliders, remat=remat, observed=observed, mesh=mesh)

    start = {n: float((init or {}).get(n, getattr(params, n)))
             for n in names}
    if log_space:
        theta0 = {n: jnp.float32(math.log(max(v, 1e-12)))
                  for n, v in start.items()}

        def to_physical(theta):
            return {n: jnp.exp(t) for n, t in theta.items()}
    else:
        theta0 = {n: jnp.float32(v) for n, v in start.items()}

        def to_physical(theta):
            return dict(theta)

    # Default optimizer: adam under an exponential lr decay (lr -> lr/20
    # over the run) — near the minimum the f32 trajectory-MSE gradient is
    # noise-dominated and a fixed step oscillates with ~lr amplitude in
    # log space; the decay collapses that oscillation onto the minimum.
    opt = optimizer if optimizer is not None else optax.adam(
        optax.exponential_decay(learning_rate, steps, 0.05))

    # Normalize by the starting loss: trajectory MSE can be absolutely
    # tiny (nearby trajectories differ by micrometers -> MSE ~1e-10), and
    # adam's eps (1e-8) would swamp sqrt(v) and shrink every update to a
    # crawl.  Relative loss makes the optimizer scale-free; the returned
    # curve stays in raw (physical) units.
    # one jitted forward shared by the loss0 and final-loss evaluations
    # (an un-jitted rollout would re-trace the whole program each time)
    loss_fwd = jax.jit(lambda th: loss_of_ov(to_physical(th)))
    loss0 = float(loss_fwd(theta0))
    inv_scale = 1.0 / max(loss0, 1e-30)

    @jax.jit
    def opt_step(theta, opt_state):
        val, grads = jax.value_and_grad(
            lambda th: loss_of_ov(to_physical(th)) * inv_scale)(theta)
        updates, opt_state = opt.update(grads, opt_state, theta)
        return optax.apply_updates(theta, updates), opt_state, val

    theta, opt_state = theta0, opt.init(theta0)
    losses = []
    for _ in range(steps):
        theta, opt_state, val = opt_step(theta, opt_state)
        losses.append(float(val) * loss0)
    # value_and_grad reports the loss BEFORE each update, so evaluate the
    # final theta once more: losses[-1] and `converged` must describe the
    # parameters actually returned.
    losses.append(float(loss_fwd(theta)))
    fitted = {n: float(v) for n, v in to_physical(theta).items()}
    losses_np = np.asarray(losses, np.float64)
    converged = bool(losses_np[-1] <= tol * max(losses_np[0], 1e-30))
    return FitResult(params=fitted, losses=losses_np, converged=converged)
