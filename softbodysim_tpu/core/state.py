"""Simulation state and solver parameters.

TPU-native redesign of the reference's SoA state:
  - C++ server state ``PBDState`` (reference: CProgram/include/PBDServer.h:163-180)
  - Unity in-engine solver arrays (reference: Assets/Scripts/Softbody/SoftBodySolver.cs:54-73)

Everything is a pytree of fp32 JAX arrays so the whole state flows through
``jax.jit`` / ``lax.scan`` / ``jax.vmap`` / ``shard_map`` and can be checkpointed
as a plain dict of arrays.
"""

from __future__ import annotations

import dataclasses

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _pytree_dataclass(cls):
    """Register a dataclass as a JAX pytree (all fields are children)."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, name) for name in fields), None

    def unflatten(_, children):
        return cls(**dict(zip(fields, children)))

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


def _static_dataclass(cls):
    """Register a frozen dataclass whose fields are all static (aux data)."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return (), tuple(getattr(obj, name) for name in fields)

    def unflatten(aux, _):
        return cls(**dict(zip(fields, aux)))

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytree_dataclass
class SimState:
    """Dynamic per-step state: mirrors PBDState's dynamic arrays.

    x         : (V, 3) committed positions
    v         : (V, 3) velocities
    x_star    : (V, 3) predicted positions (the solve target)
    inv_mass  : (V,)   inverse masses; 0 == pinned
    edge_lambda: (E,)  accumulated XPBD Lagrange multipliers (distance)
    tet_lambda : (T,)  accumulated XPBD Lagrange multipliers (volume)

    NOTE: per the reference, lambdas are zeroed ONLY at init (build_rest,
    CProgram/src/Sim.cpp:81-95) -- never per substep. We preserve that.
    """

    x: Any
    v: Any
    x_star: Any
    inv_mass: Any
    edge_lambda: Any
    tet_lambda: Any

    @property
    def num_particles(self) -> int:
        return self.x.shape[-2]


@_static_dataclass
class SolverParams:
    """Static solver configuration.

    Mirrors the C++ ``SolverParams`` (PBDServer.h:147-161) plus the Unity
    in-engine solver's Jacobi/SOR knobs (SoftBodySolver.cs:27-43).  These are
    static (hashable) so a change re-specializes the jitted step; physical
    scalars that benchmarks sweep (stiffness) also exist as traced overrides
    in the batched API.

    dialect:
      'xpbd'   -- server contract: compliance + lambda accumulation,
                  Gauss-Seidel via graph-colored sweeps (Sim.cpp:100-173).
      'jacobi' -- in-engine contract: stiffness-weighted Jacobi averaging with
                  SOR omega, no lambda (SoftBodySolver.cs:395-527).
    """

    substeps: int = 2
    iterations: int = 6
    dialect: str = "xpbd"

    # --- xpbd dialect (server) ---
    edge_compliance: float = 5e-4
    volume_compliance: float = 0.0
    friction: float = 0.2          # ground friction at commit (Sim.cpp:197-222)

    # --- jacobi dialect (in-engine) ---
    edge_stiffness: float = 0.9
    volume_stiffness: float = 0.98
    sor_omega: float = 1.4
    particle_radius: float = 0.02

    gravity: tuple = (0.0, -9.81, 0.0)

    ground_enabled: bool = True
    ground_y: float = 0.0
    # jacobi dialect supports an arbitrary ground plane (point + normal),
    # matching SoftBodySolver.cs:255-271; xpbd dialect uses the axis-aligned
    # y-clamp exactly as Sim.cpp:187-195.
    ground_point: tuple = (0.0, 0.0, 0.0)
    ground_normal: tuple = (0.0, 1.0, 0.0)

    # Pallas fused collide kernel: "auto" (on for non-CPU backends),
    # "on", or "off".  ~5x the XLA lax.scan collider path on TPU v5e.
    use_pallas: str = "auto"

    # Jacobi constraint backend: "segment" (segment_sum scatter; MXU
    # one-hot matmul regime, fast for small V), "gather" (padded-adjacency
    # per-particle walk, the reference GPU-kernel formulation; fast for
    # large V), or "auto" (pick by particle count).
    jacobi_backend: str = "auto"

    # XPBD sweep backend: "scatter" (padded color groups under lax.scan
    # with scatter-adds), "gather" (color-major constraint layout:
    # contiguous lambda slices + per-color correction-table row gathers),
    # or "pallas" (VMEM-resident particle table + lane-shuffle sweeps,
    # kernels/sweep.py -- the big-single-scene fast path; ordering is
    # block-synchronous rather than colored-GS).  "auto" == gather.
    xpbd_backend: str = "auto"

    # Block-synchronous sweep scheme (xpbd_backend="pallas" only): how the
    # within-block Jacobi solve is stabilized.  "scale": legacy 1/max-
    # multiplicity dlambda damping (round-2/3 kernels).  "split": mass
    # splitting -- the dlambda denominator inflates each inverse mass by
    # its within-block multiplicity (sum c_i w_i |g_i|^2 + alpha) and the
    # apply uses plain w; strictly less damped than "scale" (weighted-mean
    # multiplicity <= max) while still overshoot-free.  "auto" resolves to
    # the tuned split defaults (omega (1.5, 2.2) -- settled residual
    # 0.92x/0.80x of serial GS at north-star scale at identical steps/s,
    # PLAN.md round 4a) on single-device steps, "scale" on the
    # window-sharded path.  Scalar, or an (edge, tet) pair.
    xpbd_block_scheme: Any = "auto"
    # dlambda over-relaxation on the block path (1.0 = off); applied on
    # top of either scheme.  Scalar, or an (edge, tet) pair.
    xpbd_block_omega: Any = 1.0
    # within-block re-iterations per block visit (block data is VMEM-
    # resident, so revisits cost only gathers + VPU compute, no
    # streaming).  Scalar, or an (edge, tet) pair.  The tuned 'auto'
    # defaults use NO revisits for either family (k=(1,1)): at scale the
    # tet family reaches 0.80x serial residual from split + omega=2.2
    # alone, and a tet revisit costs ~1.54x runtime (PLAN.md round 4a).
    xpbd_block_local_iters: Any = 1

    # x-table precision on the Pallas sweep backend: "float32" (default)
    # or "bfloat16".  The opt-in halves the VMEM-resident particle table
    # and measured +12.6% step rate at 1M particles (pure bandwidth) --
    # BUT absolute bf16 positions carry an 8-bit mantissa, so the option
    # is only physically valid when the scene spans less than ~100 edge
    # rest-lengths per axis (position ulp << rest length); beyond that
    # the rounding noise rivals the edge strain and the constraint solve
    # jams (measured at 1M: the body visibly stops falling -- PLAN.md
    # round 4d).  For flat capacity at FULL precision use the scoped-
    # VMEM budget lift instead (automatic since round 4d: flat f32 to
    # ~1.47M particles).  Off by default; tolerance-checked workloads
    # within the envelope only.  Flat path only.
    xpbd_x_dtype: str = "float32"

    # Chebyshev semi-iterative acceleration for the jacobi dialect (Wang
    # 2015): accelerates constraint convergence dramatically on large
    # grids (e.g. 64x64 cloth) where plain Jacobi propagates ~1 cell per
    # iteration.  New capability over the reference (which has no
    # acceleration beyond SOR omega).
    # Defaults tuned on 48x48 cloth: rho 0.95 / delay 4 cuts transient
    # strain ~4x vs plain Jacobi at identical cost; rho >= 0.99 with few
    # delay iterations can DIVERGE (over-acceleration on top of SOR).
    chebyshev: bool = False
    chebyshev_rho: float = 0.95      # spectral radius estimate
    chebyshev_delay: int = 4         # plain iterations before accelerating

    # spatial-hash self/inter-body collision (new capability; reference has
    # only brute-force primitive colliders, SoftBodySolver.cs:554-561)
    self_collision: bool = False
    self_collision_cell: float = 0.1
    # hash-bucket candidate capacity; 0 = autosize at solver build time
    # (2x the rest-position bucket occupancy, floor 8 -- spatial.py)
    self_collision_max_per_cell: int = 8

    # triangle-level vertex-triangle surface collision (exceed item; the
    # reference has no body-body collision at all).  cell 0.0 = autosize
    # from the rest surface (solver/surface_collide.suggested_cell_size)
    surface_collision: bool = False
    surface_thickness: float = 0.02
    surface_collision_cell: float = 0.0
    surface_collision_max_per_cell: int = 8

    def replace(self, **kw) -> "SolverParams":
        return dataclasses.replace(self, **kw)


def init_state(topology, pinned=None, *, inv_mass_mode: str = "tet",
               density: float = 1.0, pin_top_layer: bool = False,
               pin_top_epsilon: float = 1e-4) -> SimState:
    """Build a fresh SimState from a Topology (== MSG_INIT semantics,
    reference Server.cpp:30-113: zero velocities, x_star = x, lambdas = 0,
    inverse masses from tet volumes, pinned rows forced to zero).

    inv_mass_mode:
      'tet'     -- server variant: each tet with |vol|>1e-12 adds 4/|vol| of
                   *inverse* mass to each corner (Sim.cpp:63-79).
      'density' -- in-engine variant: lumped mass m += density*|vol|/4 per
                   corner, inv_mass = 1/m (SoftBodySolver.cs:947-973).
    """
    x0 = np.asarray(topology.vertices, np.float32)
    v_count = x0.shape[0]
    tets = np.asarray(topology.tets, np.int64)

    w = np.zeros(v_count, np.float32)
    if not tets.size:
        # tet-less topology (e.g. cloth): uniform unit mass per particle --
        # the reference has no cloth; mass lumping there is tet-driven only.
        w = np.ones(v_count, np.float32)
    if tets.size:
        a, b, c, d = tets[:, 0], tets[:, 1], tets[:, 2], tets[:, 3]
        vol = _tet_signed_volume_np(x0[a], x0[b], x0[c], x0[d])
        avol = np.abs(vol)
        if inv_mass_mode == "tet":
            contrib = np.where(avol > 1e-12, 4.0 / np.maximum(avol, 1e-30), 0.0)
            contrib = contrib.astype(np.float32)
            np.add.at(w, a, contrib)
            np.add.at(w, b, contrib)
            np.add.at(w, c, contrib)
            np.add.at(w, d, contrib)
        elif inv_mass_mode == "density":
            dens = max(1e-6, float(density))
            mass = np.zeros(v_count, np.float32)
            share = (dens * np.maximum(1e-12, avol) * 0.25).astype(np.float32)
            np.add.at(mass, a, share)
            np.add.at(mass, b, share)
            np.add.at(mass, c, share)
            np.add.at(mass, d, share)
            w = np.where(mass > 0.0, 1.0 / np.maximum(mass, 1e-30), 0.0)
            w = w.astype(np.float32)
        else:
            raise ValueError(f"unknown inv_mass_mode {inv_mass_mode!r}")

    if pin_top_layer and v_count:
        # SoftBodySolver.cs:975-981
        top_y = float(x0[:, 1].max())
        w[np.abs(x0[:, 1] - top_y) <= pin_top_epsilon] = 0.0

    if pinned is not None:
        pinned = np.asarray(pinned, np.int64)
        pinned = pinned[(pinned >= 0) & (pinned < v_count)]
        w[pinned] = 0.0

    e_count = topology.edges.shape[0]
    t_count = tets.shape[0]
    return SimState(
        x=jnp.asarray(x0),
        v=jnp.zeros((v_count, 3), jnp.float32),
        x_star=jnp.asarray(x0),
        inv_mass=jnp.asarray(w),
        edge_lambda=jnp.zeros((e_count,), jnp.float32),
        tet_lambda=jnp.zeros((t_count,), jnp.float32),
    )


def _tet_signed_volume_np(p0, p1, p2, p3):
    """dot(cross(p1-p0, p2-p0), p3-p0)/6 (PBDServer.h:140-145)."""
    return np.einsum(
        "...i,...i->...",
        np.cross(p1 - p0, p2 - p0),
        p3 - p0,
    ) / 6.0


def tet_signed_volume(p0, p1, p2, p3):
    """JAX tet signed volume, fp32 (PBDServer.h:140-145)."""
    return jnp.sum(jnp.cross(p1 - p0, p2 - p0) * (p3 - p0), axis=-1) / 6.0
