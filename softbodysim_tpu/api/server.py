"""PBD1 TCP server backed by the TPU engine.

Drop-in replacement for the reference's C++ PBDServer (CProgram/):
single-client, lock-step MSG_INIT -> (MSG_STEP -> MSG_POSITIONS)* ->
MSG_SHUTDOWN (Server.cpp:20-149), with the same CLI surface as main.cpp:18-25
(``--port P --mode serial|parallel [--threads N]``).  The serial/parallel
stepper choice of the reference is meaningless here -- XLA data-parallelism
replaces the thread pool -- so both modes map to the same jitted engine (the
flag is accepted and logged for compatibility).

The 1 Hz stats line mirrors Sim.cpp:412-417.
"""

from __future__ import annotations

import argparse
import socket
import threading
import time
from typing import Optional

import numpy as np

from ..core.state import SolverParams
from ..core.topology import build_topology
from ..perf.timing import StepStats
from . import protocol
from .engine import Engine


class PBDServer:
    def __init__(self, host: str = "127.0.0.1", port: int = 7777,
                 mode: str = "serial", verbose: bool = True,
                 pipeline: bool = False, view: bool = False,
                 view_port: int = 8900):
        self.host = host
        self.port = port
        self.mode = mode
        self.verbose = verbose
        # Pipelined mode (extension over the reference's lock-step protocol,
        # Server.cpp:115-137): the reply to STEP k carries the positions of
        # step k-1, so device compute of step k overlaps the network round
        # trip and the client's frame work.  One-frame latency, >=1.5x
        # throughput when client-side work ~ compute (tests/test_protocol).
        self.pipeline = pipeline
        self.engine: Optional[Engine] = None
        self._prev_x = None
        self.stats = StepStats()
        self._sock: Optional[socket.socket] = None
        self._thread: Optional[threading.Thread] = None
        self._ready = threading.Event()
        self._running = False
        self._frames = 0
        self._last_print = time.perf_counter()
        # live browser viewport (reference: real-time Unity viewport; here a
        # render/live.py HTTP stream fed per MSG_STEP)
        self.view = view
        self.view_port = view_port
        self._viewer = None

    # -- lifecycle --
    def start_background(self) -> "PBDServer":
        """Listen + serve one client on a background thread (for tests and
        in-process embedding)."""
        self._listen()
        self._thread = threading.Thread(target=self.serve_one, daemon=True)
        self._thread.start()
        return self

    def _listen(self):
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((self.host, self.port))
        if self.port == 0:
            self.port = self._sock.getsockname()[1]
        self._sock.listen(1)
        self._ready.set()
        self._log(f"listening on {self.host}:{self.port} mode={self.mode}")

    def wait_ready(self, timeout: float = 10.0):
        self._ready.wait(timeout)
        return self

    def serve_one(self):
        """Accept a single client and run the comm loop (the reference is
        single-client, Net.cpp:57-102)."""
        if self._sock is None:
            self._listen()
        client, addr = self._sock.accept()
        client.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._log(f"client connected from {addr}")
        self._running = True
        try:
            self._comm_loop(client)
        finally:
            client.close()
            self._sock.close()
            self._running = False
            self._log("shut down")

    def _maybe_publish(self, pos):
        """Feed the live viewport (serve --view): lazily created at the
        first frame (the surface comes from the INIT'd topology)."""
        if not self.view or self.engine is None:
            return
        if self._viewer is None:
            from ..render.live import LiveViewer

            self._viewer = LiveViewer(
                self.engine.topology.surface_tris, None,
                port=self.view_port, title="PBD1 live")
            self._log(f"live viewer at {self._viewer.url}")
        self._viewer.publish(pos)

    # -- protocol --
    def _comm_loop(self, client: socket.socket):
        while True:
            msg = protocol.read_message(client)
            if msg is None:
                break
            msg_type, payload = msg

            if msg_type == protocol.MSG_INIT:
                try:
                    self._handle_init(payload)
                except Exception as e:
                    # malformed INIT: end the session cleanly (the C++
                    # reference would crash-parse; we close instead)
                    self._log(f"bad INIT: {type(e).__name__}: {e}")
                    break
            elif msg_type == protocol.MSG_STEP:
                if len(payload) < 4:
                    break
                if self.engine is None:
                    continue  # reference ignores STEP before INIT
                dt = float(np.frombuffer(payload[:4], "<f4")[0])
                if self.pipeline:
                    # reply with step k-1's positions; dispatch step k async.
                    # Engine.step donates its state buffers, so the reply
                    # reads a device-side copy made after the previous step.
                    prev = self._prev_x
                    with self.stats.scope("step"):
                        self.engine.step(dt)          # async dispatch
                    import jax.numpy as jnp
                    self._prev_x = jnp.array(self.engine.positions_device(), copy=True)
                    with self.stats.scope("pack"):
                        pos = np.asarray(prev)        # waits only for k-1
                        client.sendall(protocol.pack_positions(pos))
                    self._maybe_publish(pos)
                else:
                    with self.stats.scope("step"):
                        self.engine.step(dt)
                        self.engine.block()
                    with self.stats.scope("pack"):
                        pos = self.engine.positions()
                        client.sendall(protocol.pack_positions(pos))
                    self._maybe_publish(pos)
                self._tick_stats()
            elif msg_type == protocol.MSG_SHUTDOWN:
                break
            else:
                break  # unknown type tears the session down (Server.cpp:141-143)

    def _handle_init(self, payload: bytes):
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
            friction=wp.friction,
        )
        # wire topology is authoritative: keep edges and tet order exactly as
        # sent (orient=False) so rest state matches the client's intent
        topo = build_topology(
            init.x0, init.tets.astype(np.int64),
            edges=init.edges.astype(np.int64),
            surface_tris=np.zeros((0, 3), np.int64), orient=False)
        self.engine = Engine(topo, params, pinned=init.pinned,
                             inv_mass_mode="tet")
        # a re-INIT replaces the world (Server.cpp:106-110): drop the live
        # viewer so the next publish rebuilds it against the new topology
        if self._viewer is not None:
            self._viewer.stop()
            self._viewer = None
        import jax.numpy as jnp
        self._prev_x = jnp.array(self.engine.positions_device(), copy=True)
        self._log(
            f"Init received. V={len(init.x0)} E={len(init.edges)} "
            f"T={len(init.tets)} pinned={len(init.pinned)}")

    def _tick_stats(self):
        self._frames += 1
        now = time.perf_counter()
        if now - self._last_print >= 1.0 and self.verbose:
            topo = self.engine.topology
            line = self.stats.report(
                prefix=f"[PBDServer] Mode={self.mode} "
                       f"V={topo.num_particles} "
                       f"E={topo.num_edges} "
                       f"T={topo.num_tets} |")
            print(line, flush=True)
            self._frames = 0
            self._last_print = now

    def _log(self, msg: str):
        if self.verbose:
            print(f"[PBDServer] {msg}", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="PBD1 soft-body server (TPU engine)")
    ap.add_argument("--port", type=int, default=7777)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--mode", choices=["serial", "parallel"],
                    default="serial",
                    help="accepted for reference-CLI parity; both modes run "
                         "the same jitted engine")
    ap.add_argument("--threads", type=int, default=0,
                    help="ignored (XLA manages device parallelism)")
    ap.add_argument("--pipeline", action="store_true",
                    help="reply to STEP k with step k-1's positions so "
                         "device compute overlaps the network round trip "
                         "(one-frame latency; protocol extension)")
    args = ap.parse_args(argv)
    PBDServer(host=args.host, port=args.port, mode=args.mode,
              pipeline=args.pipeline).serve_one()


if __name__ == "__main__":
    main()
