"""PBD1 client -- the PBDRemoteWorld counterpart.

Implements the client half of the wire protocol
(Assets/Scripts/Softbody/PBDRemoteWorld.cs:187-349): connect with NoDelay,
send one INIT carrying the full SoA topology, then lock-step
STEP(dt) -> POSITIONS round trips with one request in flight, and a
best-effort SHUTDOWN on close.
"""

from __future__ import annotations

import socket
from typing import Optional

import numpy as np

from . import protocol
from .protocol import InitMessage, WireParams


class PBDClient:
    def __init__(self, host: str = "127.0.0.1", port: int = 7777,
                 timeout: float = 30.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self.num_particles = 0

    def init(self, x0: np.ndarray, edges: np.ndarray, tets: np.ndarray,
             params: Optional[WireParams] = None,
             pinned: Optional[np.ndarray] = None):
        msg = InitMessage(
            params=params or WireParams(),
            pinned=np.asarray(
                pinned if pinned is not None else [], np.uint32),
            x0=np.asarray(x0, np.float32).reshape(-1, 3),
            edges=np.asarray(edges, np.uint32).reshape(-1, 2),
            tets=np.asarray(tets, np.uint32).reshape(-1, 4),
        )
        self.num_particles = len(msg.x0)
        self.sock.sendall(protocol.pack_init(msg))

    def step(self, dt: float) -> np.ndarray:
        """Lock-step request/response: returns (V, 3) world positions."""
        self.sock.sendall(protocol.pack_step(dt))
        msg = protocol.read_message(self.sock)
        if msg is None:
            raise ConnectionError("server closed during STEP")
        msg_type, payload = msg
        if msg_type != protocol.MSG_POSITIONS:
            raise ConnectionError(f"unexpected reply type {msg_type}")
        return np.frombuffer(payload, "<f4").reshape(-1, 3).copy()

    def close(self):
        try:
            self.sock.sendall(protocol.pack_shutdown())
        except OSError:
            pass
        self.sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
