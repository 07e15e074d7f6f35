"""The reference's four benchmark scenes as framework presets.

Scene configs from SURVEY.md section 4 (scenes are the reference's only
"test suite"):

  sample_scene  1 body, MT mode, substeps 2 x iters 6; solver tuning
                edgeStiffness .7, volumeStiffness 1, omega 1.4, density .2,
                radius .01                (SampleScene.unity:1139-1147,1208-1215)
  four_body     4 bodies, GPU mode, dt 1/60       (4fumoTest.unity:1483-1491)
  extreme_test  24 bodies (16 balls + 8 heavier), GPU mode, per-body
                edgeStiffness .5, volumeStiffness 1
                                          (ExtremeTest.unity:163-170,3213-3221)
  batch_test    20 bodies (10 small balls + 10 x the 8.6k-vertex 'default'
                mesh), GPU mode                  (BatchTest.unity:2912-2920)

Bodies use the reference's own pre-tetrahedralized Unity assets when the
reference tree is mounted (io/unity_assets.py), else procedural stand-ins of
matching scale.  All scenes use the jacobi dialect (the GPU-backend
contract) with gravity (0,-10,0) like the scenes' manager blocks.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import numpy as np

from ..core.state import SolverParams
from ..core.topology import Topology
from ..core import meshes
from ..collide.primitives import Colliders
from .world import Body, World

REFERENCE_GEN = "/root/reference/Assets/SoftBody/Generated"


@dataclasses.dataclass
class Scene:
    name: str
    bodies: List[Tuple[str, Topology, SolverParams, dict]]
    colliders: List[dict]
    substeps: int = 2
    iterations: int = 6
    groups: Optional[list] = None   # List[parallel.groups.Group]

    def build_world(self, fixed_dt: float = 1.0 / 60.0) -> World:
        world = World(fixed_dt=fixed_dt)
        for item in self.colliders:
            world.add_collider(item)
        for name, topo, params, kw in self.bodies:
            world.register(Body(topo, params, name=name, **kw))
        return world

    def build_grouped(self):
        """TPU-native execution: one vmapped program per mesh family
        (parallel/groups.py) -- the fast path for many small bodies."""
        from ..parallel.groups import GroupedSceneEngine

        if not self.groups:
            raise ValueError(f"scene {self.name} defines no groups")
        cols = Colliders.build(self.colliders) if self.colliders else None
        return GroupedSceneEngine(self.groups, colliders=cols)

    def build_merged(self, backend: str = "pallas"):
        """TPU-native execution for HEAVY scenes: every body becomes a
        vertex range of ONE merged sim mesh (core/topology.py::
        merge_topologies) stepped by the single-scene Pallas passes
        (kernels/jacobi.py for the jacobi dialect; kernels/sweep.py for
        xpbd).  Constraints never cross body boundaries, so this is
        exactly the per-body physics; at BatchTest scale (~88k particles)
        it beats grouped vmap ~10x because the whole scene is one
        VMEM-resident particle table.

        Bodies may differ in edge/volume stiffness (the reference's
        per-SoftBodySolver tunables become per-constraint stiffness
        tables); all OTHER SolverParams fields must be uniform.  Returns
        (engine, vertex_offsets).
        """
        from ..core.topology import merge_topologies
        from .engine import Engine

        if not self.bodies:
            raise ValueError(f"scene {self.name} has no bodies")
        # Merged execution consumes only these per-body kwargs; anything
        # else (pin_top_layer, inv_mass_mode, ...) would be silently
        # dropped and change physics vs per-body Engines -- fail loudly.
        for name, _, _, kw in self.bodies:
            extra = set(kw) - {"density", "pinned"}
            if extra:
                raise ValueError(
                    f"build_merged: body {name!r} has unsupported per-body "
                    f"options {sorted(extra)} (merged execution honors only "
                    "density/pinned; use build_world for the rest)")
        params0 = self.bodies[0][2]
        # per-body material tunables merge as per-constraint tables:
        # stiffness for jacobi, compliance for xpbd
        kf = (("edge_stiffness", "volume_stiffness")
              if params0.dialect == "jacobi"
              else ("edge_compliance", "volume_compliance"))

        def norm(p):
            return p.replace(**{kf[0]: 0.0, kf[1]: 0.0})

        norm0 = norm(params0)
        if any(norm(p) != norm0 for _, _, p, _ in self.bodies):
            raise ValueError(
                "build_merged requires uniform SolverParams (apart from "
                f"{kf[0]}/{kf[1]}, which merge per-constraint)")
        mixed_k = any(
            getattr(p, kf[0]) != getattr(params0, kf[0])
            or getattr(p, kf[1]) != getattr(params0, kf[1])
            for _, _, p, _ in self.bodies)
        densities = {kw.get("density", 1.0) for _, _, _, kw in self.bodies}
        if len(densities) != 1:
            raise ValueError("build_merged requires uniform density")
        merged, voffs = merge_topologies([t for _, t, _, _ in self.bodies])
        pinned = []
        for b, (_, _, _, kw) in enumerate(self.bodies):
            if kw.get("pinned") is not None:
                pinned.extend(
                    int(i) + int(voffs[b])
                    for i in np.atleast_1d(kw["pinned"]).tolist())
        cols = Colliders.build(self.colliders) if self.colliders else None
        if params0.dialect == "jacobi":
            params = params0.replace(jacobi_backend=backend)
            kw_names = ("edge_k", "tet_k")
        else:
            params = params0.replace(xpbd_backend=backend)
            kw_names = ("edge_c", "tet_c")
        solver_kw = {}
        if mixed_k:
            solver_kw[kw_names[0]] = np.concatenate([
                np.full(t.num_edges, getattr(p, kf[0]), np.float32)
                for _, t, p, _ in self.bodies])
            solver_kw[kw_names[1]] = np.concatenate([
                np.full(t.num_tets, getattr(p, kf[1]), np.float32)
                for _, t, p, _ in self.bodies])
        eng = Engine(merged, params, colliders=cols,
                     density=densities.pop(),
                     pinned=np.asarray(pinned, np.int64) if pinned else None,
                     **solver_kw)
        return eng, voffs

    def build_partitioned(self, backend: str = "pallas"
                          ) -> "PartitionedSceneEngine":
        """Heterogeneous worlds without the per-body slow lane: partition
        bodies into the FEWEST merged programs.

        ``build_merged`` requires one uniform parameter set (apart from
        stiffness) across the whole scene; a mixed-dialect or otherwise
        parameter-mixed world previously fell back to the per-body World
        loop (N dispatches of N small programs -- the ~20x slow lane of
        PLAN.md round 1's strategy table).  Here bodies are grouped by
        merge-compatibility -- dialect + all SolverParams fields except the
        per-constraint-mergeable material stiffness/compliance, plus
        density -- and each group becomes ONE merged mesh on the
        single-scene fast path (two dialects => two programs, regardless
        of body count or mesh uniqueness).  Bodies with per-body options
        beyond density/pinned run as singleton engines, preserving exact
        per-body semantics.

        Reference analog: SoftBodyManager steps every body separately
        (SoftBodyManager.cs:217-233); this is the TPU-native replacement
        for scenes the single merged program cannot express.
        """
        if not self.bodies:
            raise ValueError(f"scene {self.name} has no bodies")
        cols = Colliders.build(self.colliders) if self.colliders else None

        def matkeys(p: SolverParams):
            return (("edge_stiffness", "volume_stiffness")
                    if p.dialect == "jacobi"
                    else ("edge_compliance", "volume_compliance"))

        def norm(p: SolverParams):
            kf = matkeys(p)
            return p.replace(**{kf[0]: 0.0, kf[1]: 0.0})

        # Greedy stable partition: first-fit by (normalized params,
        # density) equality; kwargs beyond density/pinned force a
        # singleton partition.
        parts: List[dict] = []
        for body in self.bodies:
            name, topo, params, kw = body
            solo = bool(set(kw) - {"density", "pinned"})
            if not solo:
                key = (norm(params), kw.get("density", 1.0))
                hit = next((q for q in parts
                            if not q["solo"] and q["key"] == key), None)
                if hit is not None:
                    hit["bodies"].append(body)
                    continue
                parts.append({"solo": False, "key": key, "bodies": [body]})
            else:
                parts.append({"solo": True, "key": None, "bodies": [body]})

        from .engine import Engine

        entries = []
        for q in parts:
            bodies = q["bodies"]
            if q["solo"] or len(bodies) == 1:
                name, topo, params, kw = bodies[0]
                bk = ("jacobi_backend" if params.dialect == "jacobi"
                      else "xpbd_backend")
                eng = Engine(topo, params.replace(**{bk: backend}),
                             colliders=cols, **kw)
                entries.append((eng, [name], None))
            else:
                sub = Scene(name=f"{self.name}/part{len(entries)}",
                            bodies=bodies, colliders=self.colliders,
                            substeps=self.substeps,
                            iterations=self.iterations)
                eng, voffs = sub.build_merged(backend=backend)
                entries.append((eng, [b[0] for b in bodies], voffs))
        return PartitionedSceneEngine(entries)


class PartitionedSceneEngine:
    """A scene as a small set of merged engines (see build_partitioned).

    step() dispatches every partition's jitted program before blocking on
    any of them, so XLA overlaps partitions on-device the way the grouped
    engine overlaps families."""

    def __init__(self, entries):
        # entries: [(engine, [body names], voffs-or-None)]
        self.entries = entries

    @property
    def num_programs(self) -> int:
        return len(self.entries)

    def step(self, dt: float = 1.0 / 60.0) -> "PartitionedSceneEngine":
        for eng, _, _ in self.entries:
            eng.step(dt)
        return self

    def run(self, n: int, dt: float = 1.0 / 60.0):
        """Partitions don't interact, so each engine advances its full n
        steps as async burst dispatches (Engine.run's RUN_CHUNK multi-step
        programs) before any block -- minimal host dispatch overhead."""
        for eng, _, _ in self.entries:
            eng.run(n, dt)
        return self.block()

    def block(self) -> "PartitionedSceneEngine":
        for eng, _, _ in self.entries:
            eng.block()
        return self

    def positions(self):
        """{body name: (V,3) world positions} across all partitions."""
        out = {}
        for eng, names, voffs in self.entries:
            pos = eng.positions()
            if voffs is None:
                out[names[0]] = pos
            else:
                for i, nm in enumerate(names):
                    out[nm] = pos[voffs[i]:voffs[i + 1]]
        return out


def _asset(name: str) -> Optional[Topology]:
    from ..io.unity_assets import load_tet_asset

    path = os.path.join(REFERENCE_GEN, name)
    if os.path.exists(path):
        return load_tet_asset(path)
    return None


def _bunny(center, scale: float = 1.0) -> Topology:
    t = _asset("Bunny-LowPoly_Tet 1.asset")
    if t is None:
        t = meshes.tet_ball(2, 0.3, (0, 0, 0))
    return _recenter(t, center, scale)


def _ball_small(center, scale: float = 1.0) -> Topology:
    t = _asset("Icosphere_Tet.asset")
    if t is None:
        t = meshes.tet_ball(2, 0.25, (0, 0, 0))
    return _recenter(t, center, scale)


def _ball_large(center, scale: float = 1.0) -> Topology:
    t = _asset("Icosphere.001_Tet.asset")
    if t is None:
        t = meshes.tet_ball(3, 0.4, (0, 0, 0))
    return _recenter(t, center, scale)


def _default_mesh(center, scale: float = 1.0) -> Topology:
    t = _asset("default_Tet 10.asset")
    if t is None:
        t = meshes.tet_cube(12, 12, 12, 0.8, (0, 0, 0))
    return _recenter(t, center, scale)


def _recenter(t: Topology, center, scale: float = 1.0) -> Topology:
    from ..core.topology import build_topology

    c = t.vertices.mean(axis=0)
    verts = (t.vertices - c) * np.float32(scale) + np.asarray(
        center, np.float32)
    return build_topology(verts, t.tets.astype(np.int64), edges=t.edges,
                          surface_tris=t.surface_tris, orient=False)


def _params(edge=0.9, vol=0.98, omega=1.4, radius=0.02, substeps=2, iters=6):
    return SolverParams(
        dialect="jacobi", substeps=substeps, iterations=iters,
        edge_stiffness=edge, volume_stiffness=vol, sor_omega=omega,
        particle_radius=radius, gravity=(0.0, -10.0, 0.0))


def _grid_positions(n: int, spacing: float = 0.9, height: float = 1.2):
    side = int(np.ceil(np.sqrt(n)))
    out = []
    for i in range(n):
        r, c = divmod(i, side)
        out.append(((c - side / 2) * spacing, height + 0.5 * (i % 3),
                    (r - side / 2) * spacing))
    return out


def _make_groups(specs):
    """specs: [(name, base_topo, offsets, params, density)]"""
    from ..parallel.groups import Group

    return [Group(t, offs, p, name=n, density=d)
            for n, t, offs, p, d in specs]


def sample_scene() -> Scene:
    p = _params(edge=0.7, vol=1.0, omega=1.4, radius=0.01)
    base = _bunny((0.0, 0.0, 0.0))
    return Scene(
        name="SampleScene",
        bodies=[("fumo", _bunny((0.0, 1.0, 0.0)), p, {"density": 0.2})],
        colliders=[Colliders.box((0.0, 0.1, 0.0), (0.6, 0.1, 0.6))],
        groups=_make_groups([("fumo", base, [(0.0, 1.0, 0.0)], p, 0.2)]),
    )


def four_body_test() -> Scene:
    p = _params()
    positions = _grid_positions(4, spacing=1.0)
    bodies = [
        (f"fumo{i}", _bunny(pos), p, {})
        for i, pos in enumerate(positions)
    ]
    base = _bunny((0.0, 0.0, 0.0))
    return Scene(
        name="4fumoTest", bodies=bodies,
        colliders=[Colliders.box((0.0, 0.1, 0.0), (1.5, 0.1, 1.5))],
        groups=_make_groups([("fumo", base, positions, p, 1.0)]))


def extreme_test() -> Scene:
    p = _params(edge=0.5, vol=1.0)
    positions = _grid_positions(24, spacing=0.8, height=1.5)
    bodies = []
    for i, pos in enumerate(positions):
        if i < 16:
            bodies.append((f"ball{i}", _ball_small(pos), p, {}))
        else:
            bodies.append((f"cirno{i}", _bunny(pos), p, {}))
    return Scene(
        name="ExtremeTest", bodies=bodies,
        colliders=[Colliders.box((0.0, 0.1, 0.0), (2.5, 0.1, 2.5))],
        groups=_make_groups([
            ("ball", _ball_small((0, 0, 0)), positions[:16], p, 1.0),
            ("cirno", _bunny((0, 0, 0)), positions[16:], p, 1.0),
        ]))


def batch_test() -> Scene:
    """20 bodies: 10 icospheres + 10 "default" heavies (V=8613 each).

    Per-solver tunings and instance scales from BatchTest.unity: every
    solver uses edgeStiffness .493, volumeStiffness .98, sorOmega 1.4,
    particleRadius .01, density 1 (BatchTest.unity:992-999); balls are
    scaled x2, the default meshes x0.61614 (5) and x1.23228 (5).  The raw
    default asset spans ~22-30 units, so scaled bodies span ~14-37 units
    and drop from y 10-18 like the reference layout -- dropping unscaled
    bodies from y=2 starts them interpenetrating the ground and explodes
    on every backend/the oracle alike.
    """
    p = _params(edge=0.493, vol=0.98, radius=0.01)
    ball_pos = _grid_positions(10, spacing=5.0, height=6.0)
    small_pos = [(-30.0 + 16.0 * i, 12.0, -25.0) for i in range(5)]
    large_pos = [(-40.0 + 22.0 * i, 26.0, 25.0) for i in range(5)]
    bodies = []
    for i, pos in enumerate(ball_pos):
        bodies.append((f"ball{i}", _ball_small(pos, scale=2.0), p, {}))
    for i, pos in enumerate(small_pos):
        bodies.append((f"big{i}", _default_mesh(pos, scale=0.61614), p, {}))
    for i, pos in enumerate(large_pos):
        bodies.append(
            (f"big{i + 5}", _default_mesh(pos, scale=1.23228), p, {}))
    return Scene(
        name="BatchTest", bodies=bodies, colliders=[],
        groups=_make_groups([
            ("ball", _ball_small((0, 0, 0), scale=2.0), ball_pos, p, 1.0),
            ("big_s", _default_mesh((0, 0, 0), scale=0.61614), small_pos,
             p, 1.0),
            ("big_l", _default_mesh((0, 0, 0), scale=1.23228), large_pos,
             p, 1.0),
        ]))


ALL_SCENES = {
    "sample": sample_scene,
    "4fumo": four_body_test,
    "extreme": extreme_test,
    "batch": batch_test,
}
