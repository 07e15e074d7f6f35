"""ctypes bindings for the native topology library (native/softtopo.cpp).

Auto-builds ``libsofttopo.so`` on first use if a compiler is available;
every entry point has a NumPy fallback, so the framework works without the
native lib (it is only a speedup for large-mesh init -- the hot path is all
on-device).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libsofttopo.so")
_NATIVE_DIR = os.path.normpath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native"))

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _try_build() -> bool:
    src = os.path.join(_NATIVE_DIR, "softtopo.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o",
             _LIB_PATH, src],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            return None
        _tried = True
        src = os.path.join(_NATIVE_DIR, "softtopo.cpp")
        try:
            stale = (os.path.exists(src) and
                     os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))
        except OSError:
            stale = not os.path.exists(_LIB_PATH)
        if (stale or not os.path.exists(_LIB_PATH)) and not _try_build():
            if not os.path.exists(_LIB_PATH):
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        i64, i32p, f32p, voidp = (
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_void_p)

        lib.st_build_topology.restype = voidp
        lib.st_build_topology.argtypes = [f32p, i64, i32p, i64]
        for name in ("st_num_edges", "st_num_surface"):
            fn = getattr(lib, name)
            fn.restype = i64
            fn.argtypes = [voidp]
        for name in ("st_get_edges", "st_get_surface", "st_get_edge_colors",
                     "st_get_tet_colors"):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [voidp, i32p]
        lib.st_free.argtypes = [voidp]
        try:                      # stale prebuilt lib may lack newer symbols
            lib.st_orient.restype = None
            lib.st_orient.argtypes = [f32p, i32p, i64]
        except AttributeError:
            pass
        lib.st_greedy_color.restype = None
        lib.st_greedy_color.argtypes = [i32p, i64, ctypes.c_int32, i64, i32p]

        lib.st_voxelize.restype = voidp
        lib.st_voxelize.argtypes = [f32p, i64, i32p, i64, ctypes.c_float]
        lib.st_vox_num_verts.restype = i64
        lib.st_vox_num_verts.argtypes = [voidp]
        lib.st_vox_num_tets.restype = i64
        lib.st_vox_num_tets.argtypes = [voidp]
        lib.st_vox_get_verts.restype = None
        lib.st_vox_get_verts.argtypes = [voidp, f32p]
        lib.st_vox_get_tets.restype = None
        lib.st_vox_get_tets.argtypes = [voidp, i32p]
        lib.st_vox_free.argtypes = [voidp]

        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        lib.st_pack_super.restype = voidp
        lib.st_pack_super.argtypes = [i64p, i64, ctypes.c_int32,
                                      ctypes.c_int32, ctypes.c_int32,
                                      ctypes.c_int32]
        lib.st_pack_num_super.restype = i64
        lib.st_pack_num_super.argtypes = [voidp]
        lib.st_pack_dmax.restype = ctypes.c_int32
        lib.st_pack_dmax.argtypes = [voidp]
        lib.st_pack_fill.restype = None
        lib.st_pack_fill.argtypes = [voidp, i32p, i32p, i32p, i64p, f32p]
        lib.st_pack_free.argtypes = [voidp]

        if hasattr(lib, "st_permute_rows"):
            lib.st_permute_rows.restype = None
            lib.st_permute_rows.argtypes = [voidp, voidp, i64p, i64, i64]

        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def native_build_topology(vertices: np.ndarray, tets: np.ndarray):
    """Returns (edges (E,2), surface (S,3), edge_colors (E,), tet_colors (T,))
    or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    v = np.ascontiguousarray(vertices, np.float32)
    t = np.ascontiguousarray(tets, np.int32)
    h = lib.st_build_topology(v, len(v), t, len(t))
    try:
        ne = lib.st_num_edges(h)
        ns = lib.st_num_surface(h)
        edges = np.empty((ne, 2), np.int32)
        surface = np.empty((ns, 3), np.int32)
        ecol = np.empty((ne,), np.int32)
        tcol = np.empty((len(t),), np.int32)
        if ne:
            lib.st_get_edges(h, edges.reshape(-1))
            lib.st_get_edge_colors(h, ecol)
        if ns:
            lib.st_get_surface(h, surface.reshape(-1))
        if len(t):
            lib.st_get_tet_colors(h, tcol)
        return edges, surface, ecol, tcol
    finally:
        lib.st_free(h)


def native_permute_blocks(arr: np.ndarray,
                          order: np.ndarray) -> Optional[np.ndarray]:
    """``out[i] = arr[order[i]]`` along axis 0 as a straight per-block
    memcpy (bit-identical to the numpy fancy-index gather, ~2-3x faster
    on the multi-GB regroup_plan table permutes).  None if the lib is
    unavailable or the input isn't C-contiguous-able cheaply."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "st_permute_rows"):
        return None
    a = np.ascontiguousarray(arr)
    o = np.ascontiguousarray(order, np.int64)
    nb = a.shape[0]
    if nb == 0 or len(o) != nb:
        return None
    out = np.empty_like(a)
    lib.st_permute_rows(
        a.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        o, nb, a.nbytes // nb)
    return out


def native_orient(vertices: np.ndarray,
                  tets: np.ndarray) -> Optional[np.ndarray]:
    """Positively-oriented copy of ``tets`` (int32), or None if the lib is
    unavailable.  Bit-identical to topology.orient_tets_positive."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "st_orient"):
        return None
    v = np.ascontiguousarray(vertices, np.float32)
    t = np.ascontiguousarray(tets, np.int32)
    if t is tets:                       # ascontiguousarray may alias
        t = t.copy()
    if len(t):
        lib.st_orient(v, t.reshape(-1), len(t))
    return t


def native_greedy_color(constraints: np.ndarray, num_vertices: int):
    lib = get_lib()
    if lib is None:
        return None
    cons = np.ascontiguousarray(constraints, np.int32)
    n, arity = cons.shape
    out = np.empty((n,), np.int32)
    if n:
        lib.st_greedy_color(cons.reshape(-1), n, arity, num_vertices, out)
    return out


def native_voxelize(vertices: np.ndarray, triangles: np.ndarray,
                    cell: float) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    v = np.ascontiguousarray(vertices, np.float32)
    t = np.ascontiguousarray(triangles, np.int32)
    h = lib.st_voxelize(v, len(v), t.reshape(-1), len(t),
                        ctypes.c_float(cell))
    try:
        nv = lib.st_vox_num_verts(h)
        nt = lib.st_vox_num_tets(h)
        verts = np.empty((nv, 3), np.float32)
        tets = np.empty((nt, 4), np.int32)
        if nv:
            lib.st_vox_get_verts(h, verts.reshape(-1))
        if nt:
            lib.st_vox_get_tets(h, tets.reshape(-1))
        return verts, tets
    finally:
        lib.st_vox_free(h)


def native_pack_super(cons: np.ndarray, slots_cap: int, layer_cap: int,
                      order_mode: int = 1):
    """Native greedy super-block packing (kernels/sweep.pack_superblocks):
    returns (nsup, dmax, slots, rel, inv, perm, scale) or None if the lib is
    unavailable.  Bit-identical to the Python packer (same stable ordering
    and greedy scan)."""
    lib = get_lib()
    if lib is None:
        return None
    cons = np.ascontiguousarray(cons, np.int64)
    n, arity = cons.shape
    h = lib.st_pack_super(cons, n, arity, slots_cap, layer_cap,
                          order_mode)
    try:
        nsup = int(lib.st_pack_num_super(h))
        dmax = int(lib.st_pack_dmax(h))
        s = slots_cap
        slots = np.zeros((nsup, 128), np.int32)
        rel = np.zeros((nsup * arity * 8, 128), np.int32)
        inv = np.zeros((nsup * s * dmax * 8, 128), np.int32)
        perm = np.zeros((nsup * 8 * 128,), np.int64)
        scale = np.zeros((nsup * 8, 128), np.float32)
        lib.st_pack_fill(h, slots, rel, inv, perm, scale)
    finally:
        lib.st_pack_free(h)
    return nsup, dmax, slots, rel, inv, perm, scale
