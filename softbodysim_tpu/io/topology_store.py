"""Topology persistence -- the pre-generated tet asset workflow.

The reference tetrahedralizes once in-editor and ships 314 `.asset` files
(SoftBodyTetMeshAsset.cs:57-75, Assets/SoftBody/Generated/).  Equivalent
here: tetrahedralize once (CLI `python -m softbodysim_tpu tetra in.obj -o
out.tet.npz`), load instantly at runtime.  The file stores the SoA arrays;
colorings and rest quantities are rebuilt on load (cheap, native-
accelerated) so files stay small and forward-compatible.
"""

from __future__ import annotations

import numpy as np

from ..core.topology import Topology, build_topology

FORMAT = 1


def save_topology(path: str, topo: Topology):
    np.savez_compressed(
        path,
        format=np.int32(FORMAT),
        vertices=topo.vertices,
        tets=topo.tets,
        edges=topo.edges,
        surface_tris=topo.surface_tris,
    )


def load_topology(path: str) -> Topology:
    with np.load(path) as z:
        if int(z.get("format", 1)) > FORMAT:
            raise ValueError("topology file newer than supported")
        return build_topology(
            z["vertices"], z["tets"].astype(np.int64),
            edges=z["edges"].astype(np.int64),
            surface_tris=z["surface_tris"].astype(np.int64),
            orient=False,   # stored tets are already oriented
        )
