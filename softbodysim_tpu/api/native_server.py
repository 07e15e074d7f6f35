"""Native (C++) PBD1 server front-end.

The comm loop, framing, and sockets run in C++ (native/pbdnet.cpp --
the reference's Net.cpp/Server.cpp layers), while INIT/STEP dispatch into
the JAX engine through ctypes callbacks.  This is the architecture parity
point for the reference's native runtime: C++ owns the wire, XLA owns the
compute.

    python -m softbodysim_tpu.api.native_server --port 7777
    # or: PBDServer(...)  (pure-Python fallback, api/server.py)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from ..core.state import SolverParams
from ..core.topology import build_topology
from . import protocol
from .engine import Engine

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libpbdnet.so")
_SRC = os.path.normpath(os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "pbdnet.cpp"))

_INIT_CB = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                            ctypes.c_uint64)
_STEP_CB = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_float,
                            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                            ctypes.POINTER(ctypes.c_uint64))
_READY_CB = ctypes.CFUNCTYPE(None, ctypes.c_int)


def _get_lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        if not os.path.exists(_SRC):
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o",
                 _LIB_PATH, _SRC],
                check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.sb_serve.restype = ctypes.c_int
    lib.sb_serve.argtypes = [ctypes.c_int, _INIT_CB, _STEP_CB, _READY_CB,
                             ctypes.c_int]
    return lib


def available() -> bool:
    return _get_lib() is not None


class NativePBDServer:
    """Single-client PBD1 server with a native comm loop."""

    def __init__(self, port: int = 7777, verbose: bool = True):
        self.port = port
        self.verbose = verbose
        self.engine: Optional[Engine] = None
        self._positions_buf = None  # keep the reply buffer alive
        self._ready = threading.Event()
        self._thread: Optional[threading.Thread] = None
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("libpbdnet.so unavailable (no compiler?); "
                               "use api.server.PBDServer instead")
        self._lib = lib
        # keep callback objects referenced for the server's lifetime
        self._cb_init = _INIT_CB(self._on_init)
        self._cb_step = _STEP_CB(self._on_step)
        self._cb_ready = _READY_CB(self._on_ready)

    # -- callbacks (invoked from the C++ comm thread; ctypes grabs the GIL)
    def _on_ready(self, port: int):
        self.port = port
        self._ready.set()

    def _on_init(self, payload_ptr, size: int) -> int:
        try:
            payload = ctypes.string_at(payload_ptr, size)
            init = protocol.unpack_init(payload)
            wp = init.params
            params = SolverParams(
                dialect="xpbd",
                substeps=max(1, wp.substeps),
                iterations=max(1, wp.iterations),
                edge_compliance=wp.edge_compliance,
                volume_compliance=wp.volume_compliance,
                gravity=tuple(wp.gravity),
                ground_enabled=bool(wp.ground_enabled),
                ground_y=wp.ground_y,
                friction=wp.friction)
            topo = build_topology(
                init.x0, init.tets.astype(np.int64),
                edges=init.edges.astype(np.int64),
                surface_tris=np.zeros((0, 3), np.int64), orient=False)
            self.engine = Engine(topo, params, pinned=init.pinned,
                                 inv_mass_mode="tet")
            if self.verbose:
                print(f"[pbdnet] Init: V={len(init.x0)} E={len(init.edges)} "
                      f"T={len(init.tets)}", flush=True)
            return 0
        except Exception as e:  # malformed INIT ends the session
            if self.verbose:
                print(f"[pbdnet] bad INIT: {e}", flush=True)
            return 1

    def _on_step(self, dt: float, out_pos, out_count) -> int:
        try:
            if self.engine is None:
                out_count[0] = 0
                out_pos[0] = ctypes.cast(
                    None, ctypes.POINTER(ctypes.c_float))
                return 0
            self.engine.step(float(dt))
            pos = np.ascontiguousarray(self.engine.positions(), np.float32)
            self._positions_buf = pos  # pin until next callback
            out_pos[0] = pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            out_count[0] = pos.size
            return 0
        except Exception as e:
            if self.verbose:
                print(f"[pbdnet] step failed: {e}", flush=True)
            return 1

    # -- lifecycle
    def serve_one(self):
        """Blocking: C++ accept + comm loop; returns on session end."""
        self._lib.sb_serve(self.port, self._cb_init, self._cb_step,
                           self._cb_ready, 1 if self.verbose else 0)

    def start_background(self) -> "NativePBDServer":
        self._thread = threading.Thread(target=self.serve_one, daemon=True)
        self._thread.start()
        return self

    def wait_ready(self, timeout: float = 10.0) -> "NativePBDServer":
        self._ready.wait(timeout)
        return self


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="PBD1 server with native (C++) comm loop")
    ap.add_argument("--port", type=int, default=7777)
    args = ap.parse_args(argv)
    NativePBDServer(port=args.port).serve_one()


if __name__ == "__main__":
    main()
