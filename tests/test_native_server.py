"""Native (C++) PBD1 comm-loop server vs the Python client."""

import numpy as np
import pytest

from softbodysim_tpu import Engine, SolverParams
from softbodysim_tpu.api.client import PBDClient
from softbodysim_tpu.api.protocol import WireParams
from softbodysim_tpu.api.native_server import NativePBDServer, available
from softbodysim_tpu.core import meshes

needs_lib = pytest.mark.skipif(not available(),
                               reason="libpbdnet.so unavailable")

DT = 1.0 / 60.0


@needs_lib
def test_native_server_session_matches_local():
    topo = meshes.tet_cube(2, 2, 2, size=0.5, center=(0.0, 0.7, 0.0))
    srv = NativePBDServer(port=0, verbose=False).start_background()
    srv.wait_ready()
    with PBDClient(port=srv.port) as cli:
        cli.init(topo.vertices, topo.edges, topo.tets,
                 params=WireParams(substeps=2, iterations=6))
        local = Engine(topo, SolverParams(dialect="xpbd", substeps=2,
                                          iterations=6),
                       inv_mass_mode="tet")
        for _ in range(10):
            remote = cli.step(DT)
            local.step(DT)
        np.testing.assert_allclose(remote, local.positions(), atol=1e-6)


@needs_lib
def test_native_server_rejects_garbage():
    import socket
    import time

    srv = NativePBDServer(port=0, verbose=False).start_background()
    srv.wait_ready()
    s = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
    s.sendall(b"NOTPBD1GARBAGE")
    s.settimeout(3)
    try:
        assert s.recv(64) == b""
    except (ConnectionResetError, socket.timeout):
        pass
    s.close()
    deadline = time.time() + 5
    while srv._thread.is_alive() and time.time() < deadline:
        time.sleep(0.05)
    assert not srv._thread.is_alive()
