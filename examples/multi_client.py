"""Multi-session serving: one server, N concurrent PBD1 clients.

The reference PBDServer is single-client (Net.cpp:57-102): one process
per simulation.  In ``--multi`` mode this server gives every connection
its own engine, and device work from concurrent sessions pipelines
through JAX's async dispatch — one TPU serving N independent
simulations over the unmodified PBD1 wire protocol.

Run: python examples/multi_client.py   (CPU or TPU)
"""

import os as _os
import sys as _sys
import threading

_sys.path.insert(0, _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), ".."))

import numpy as np

from softbodysim_tpu.api.client import PBDClient
from softbodysim_tpu.api.protocol import WireParams
from softbodysim_tpu.api.server import PBDServer
from softbodysim_tpu.core import meshes

N_CLIENTS, N_STEPS, DT = 3, 30, 1 / 60


def client_session(port, tag, center_y, results):
    topo = meshes.tet_ball(1, 0.25, (0.0, center_y, 0.0))
    with PBDClient(port=port, timeout=600.0) as cli:
        cli.init(topo.vertices, topo.edges, topo.tets,
                 params=WireParams(substeps=2, iterations=4))
        for _ in range(N_STEPS):
            pos = cli.step(DT)
        results[tag] = pos
        print(f"client {tag}: {N_STEPS} steps, "
              f"min_y={pos[:, 1].min():.3f}")


def main():
    srv = PBDServer(port=0, verbose=False)
    srv.start_background(multi=True).wait_ready()
    print(f"multi-session server on port {srv.port}")

    results = {}
    threads = [
        threading.Thread(target=client_session,
                         args=(srv.port, i, 0.8 + 0.3 * i, results))
        for i in range(N_CLIENTS)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    srv.stop()

    assert len(results) == N_CLIENTS
    for tag, pos in sorted(results.items()):
        assert np.isfinite(pos).all()
    print(f"{N_CLIENTS} concurrent sessions served; all trajectories finite")


if __name__ == "__main__":
    main()
