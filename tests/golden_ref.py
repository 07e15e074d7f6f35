"""Build + run harness for the compiled REFERENCE solver (golden traces).

Compiles ``tools/golden_ref/ref_runner.cpp`` against the unmodified reference
sources under ``/root/reference/CProgram`` (read-only checkout; nothing is
copied) and exposes ``run_reference(...)`` returning the reference's own
trajectory.  Used by tests/test_golden_ref.py to anchor the NumPy oracle and
the JAX backends to the real C++ PBDServer instead of a reimplementation.

``-ffp-contract=off`` keeps the C++ arithmetic plain IEEE fp32 (no FMA
contraction) so it is comparable bit-for-bit with NumPy float32 math.
"""

from __future__ import annotations

import os
import pathlib
import struct
import subprocess
import tempfile

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE = pathlib.Path(os.environ.get("SOFTBODYSIM_REFERENCE",
                                        "/root/reference"))
REF_SIM = REFERENCE / "CProgram" / "src" / "Sim.cpp"
REF_INC = REFERENCE / "CProgram" / "include"
RUNNER_SRC = REPO / "tools" / "golden_ref" / "ref_runner.cpp"
CACHE_DIR = REPO / ".cache" / "golden_ref"

MAGIC = 0x31464552  # "REF1"


def reference_available() -> bool:
    return REF_SIM.is_file() and (REF_INC / "PBDServer.h").is_file()


def build_runner() -> pathlib.Path:
    """Compile the runner (cached on source mtimes)."""
    CACHE_DIR.mkdir(parents=True, exist_ok=True)
    exe = CACHE_DIR / "ref_runner"
    stamp = CACHE_DIR / "ref_runner.stamp"
    key = f"{RUNNER_SRC.stat().st_mtime_ns}:{REF_SIM.stat().st_mtime_ns}"
    if exe.is_file() and stamp.is_file() and stamp.read_text() == key:
        return exe
    cmd = [
        "g++", "-O2", "-std=c++17", "-ffp-contract=off",
        "-I", str(REF_INC),
        str(RUNNER_SRC), str(REF_SIM),
        "-o", str(exe), "-pthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    stamp.write_text(key)
    return exe


def run_reference(topo, params, *, dt, nsteps, sample_every=0, pinned=None,
                  edge_order=None, tet_order=None):
    """Run ``nsteps`` of the reference SerialStepper on ``topo``.

    ``edge_order`` / ``tet_order`` permute the constraint arrays before they
    are handed to the reference, which sweeps its arrays in index order
    (Sim.cpp:104,136) -- so a permutation IS a custom Gauss-Seidel ordering.
    Returned ``edge_lambda`` / ``tet_lambda`` are mapped back to the original
    constraint ids.

    Returns dict with 'samples' (S, V, 3), 'vel_samples' (S, V, 3), 'x',
    'v', 'edge_lambda', 'tet_lambda' (final state).

    ``sample_every=0`` means final-state-only: the runner binary itself
    writes NO position samples at 0 (ref_runner.cpp:126 — only final
    v/lambdas), so it is mapped to ``nsteps`` here, sampling exactly once
    at the last step and keeping 'x' populated.
    """
    exe = build_runner()
    if not sample_every:
        sample_every = int(nsteps)

    edges = np.asarray(topo.edges, np.uint32).reshape(-1, 2)
    tets = np.asarray(topo.tets, np.uint32).reshape(-1, 4)
    if edge_order is not None:
        edge_order = np.asarray(edge_order, np.int64)
        edges = edges[edge_order]
    if tet_order is not None:
        tet_order = np.asarray(tet_order, np.int64)
        tets = tets[tet_order]

    V = int(topo.num_particles)
    E = int(edges.shape[0])
    T = int(tets.shape[0])
    pinned = np.asarray([] if pinned is None else pinned, np.uint32)

    g = np.asarray(params.gravity, np.float32)
    header = struct.pack(
        "<7I2f3fIff fII",
        MAGIC, V, E, T, len(pinned),
        int(params.substeps), int(params.iterations),
        float(params.edge_compliance), float(params.volume_compliance),
        float(g[0]), float(g[1]), float(g[2]),
        int(bool(params.ground_enabled)),
        float(params.ground_y), float(params.friction),
        float(dt), int(nsteps), int(sample_every),
    )
    payload = b"".join([
        header,
        pinned.tobytes(),
        np.asarray(topo.vertices, np.float32).tobytes(),
        edges.tobytes(),
        tets.tobytes(),
    ])

    with tempfile.TemporaryDirectory(prefix="golden_ref_") as td:
        inp = os.path.join(td, "in.bin")
        outp = os.path.join(td, "out.bin")
        with open(inp, "wb") as f:
            f.write(payload)
        subprocess.run([str(exe), inp, outp], check=True,
                       capture_output=True, text=True)
        with open(outp, "rb") as f:
            raw = f.read()

    off = 0
    (num_samples,) = struct.unpack_from("<I", raw, off)
    off += 4

    def take(n):
        nonlocal off
        arr = np.frombuffer(raw, np.float32, count=n, offset=off)
        off += 4 * n
        return arr

    xs_list, vs_list = [], []
    for _ in range(num_samples):
        xs_list.append(take(V * 3).reshape(V, 3))
        vs_list.append(take(V * 3).reshape(V, 3))
    samples = (np.stack(xs_list) if num_samples
               else np.zeros((0, V, 3), np.float32))
    vel_samples = (np.stack(vs_list) if num_samples
                   else np.zeros((0, V, 3), np.float32))
    x = samples[-1] if num_samples else None
    v = take(V * 3).reshape(V, 3)
    edge_lambda = take(E)
    tet_lambda = take(T)
    assert off == len(raw), (off, len(raw))

    if edge_order is not None:
        inv = np.empty_like(edge_order)
        inv[edge_order] = np.arange(E)
        edge_lambda = edge_lambda[inv]
    if tet_order is not None:
        inv = np.empty_like(tet_order)
        inv[tet_order] = np.arange(T)
        tet_lambda = tet_lambda[inv]

    return {
        "samples": samples,
        "vel_samples": vel_samples,
        "x": x,
        "v": v,
        "edge_lambda": edge_lambda,
        "tet_lambda": tet_lambda,
    }
