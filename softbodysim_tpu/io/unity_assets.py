"""Loader for Unity-serialized SoftBodyTetMeshAsset files.

The reference ships 314 pre-tetrahedralized assets under
Assets/SoftBody/Generated/ (SoftBodyTetMeshAsset: vertices + tetIds +
edgeIds + surfaceTriIds, SoftBodyTetMeshAsset.cs:10-13).  Unity serializes
the Vector3 list as YAML ``{x:, y:, z:}`` dicts and the int arrays as
little-endian u32 hex blobs; this standalone parser needs no Unity and no
YAML library.

Lets users of the reference bring their exact sim meshes across::

    topo = load_tet_asset("Bunny-LowPoly_Tet 1.asset")
    eng = Engine(topo, SolverParams())
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from ..core.topology import Topology, build_topology

_VEC_RE = re.compile(
    r"\{x:\s*([-\d.eE+]+),\s*y:\s*([-\d.eE+]+),\s*z:\s*([-\d.eE+]+)\}")


def parse_tet_asset(path: str) -> Dict[str, np.ndarray]:
    """Raw arrays from a .asset file: vertices (V,3) f32, tetIds (4T,),
    edgeIds (2E,), surfaceTriIds (3S,) i32."""
    verts = []
    blobs: Dict[str, str] = {}
    current_list = None
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        for line in f:
            stripped = line.strip()
            if stripped.startswith("vertices:"):
                current_list = "vertices"
                continue
            m = re.match(r"(tetIds|edgeIds|surfaceTriIds):\s*([0-9a-fA-F]*)",
                         stripped)
            if m:
                current_list = None
                blobs[m.group(1)] = m.group(2)
                continue
            if current_list == "vertices":
                vm = _VEC_RE.search(stripped)
                if stripped.startswith("-") and vm:
                    verts.append([float(vm.group(1)), float(vm.group(2)),
                                  float(vm.group(3))])
                elif not stripped.startswith("-"):
                    current_list = None

    out = {"vertices": np.asarray(verts, np.float32)}
    for key in ("tetIds", "edgeIds", "surfaceTriIds"):
        hexstr = blobs.get(key, "")
        if hexstr:
            raw = bytes.fromhex(hexstr)
            out[key] = np.frombuffer(raw, "<u4").astype(np.int32)
        else:
            out[key] = np.zeros((0,), np.int32)
    return out


def load_tet_asset(path: str, orient: bool = False) -> Topology:
    """Asset -> Topology.  The stored arrays are kept authoritative (edges
    and surface come from the file, as the in-engine solver uses them,
    SoftBodySolver.cs:983-997); orient=False preserves the stored tet
    winding (assets are already positively oriented by TryCreateFromMesh,
    SoftBodyTetMeshAsset.cs:47-49)."""
    raw = parse_tet_asset(path)
    if raw["vertices"].size == 0 or raw["tetIds"].size == 0:
        raise ValueError(f"{path}: not a valid SoftBodyTetMeshAsset")
    return build_topology(
        raw["vertices"],
        raw["tetIds"].reshape(-1, 4),
        edges=raw["edgeIds"].reshape(-1, 2),
        surface_tris=raw["surfaceTriIds"].reshape(-1, 3),
        orient=orient,
    )
