#!/bin/sh
# Two-process PBD1 session: TPU-backed server + remote client over TCP --
# the reference's Unity <-> PBDServer topology (PBD1 wire protocol,
# byte-compatible).
#
# Note for the dev-tunnel environment: only one process may own the TPU, so
# the server gets it and the client runs on CPU.
set -e
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
PORT="${1:-7791}"

python -m softbodysim_tpu.api.server --port "$PORT" --mode parallel &
SERVER_PID=$!
sleep 8

JAX_PLATFORMS=cpu PYTHONPATH="$ROOT:$PYTHONPATH" python - "$PORT" <<'EOF'
import sys
import numpy as np
from softbodysim_tpu.api.client import PBDClient
from softbodysim_tpu.api.protocol import WireParams
from softbodysim_tpu.core import meshes

port = int(sys.argv[1])
topo = meshes.tet_cube(3, 3, 3, size=0.6, center=(0, 0.8, 0))
with PBDClient(port=port) as cli:
    cli.init(topo.vertices, topo.edges, topo.tets,
             params=WireParams(substeps=2, iterations=6))
    for _ in range(90):
        pos = cli.step(1 / 60)
    print("client: final min_y=%.4f  finite=%s" %
          (pos[:, 1].min(), np.isfinite(pos).all()))
EOF

wait $SERVER_PID 2>/dev/null || true
