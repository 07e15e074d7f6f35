"""Persistent packed-plan cache: skip host-side packing on cold starts.

Packing the Pallas sweep/pass plans is pure host work that grows with
scene size — seconds at the 100k-particle scale, ~4 minutes at 1M
particles (PLAN.md round 3e).  The result is a deterministic function of
the topology arrays and packing parameters, so it is cached on disk keyed
by a content hash: a process cold-starting a known scene loads the packed
tables and goes straight to compile (which the persistent XLA cache makes
warm too).

This is the runtime analog of the reference's pre-generated tet assets
(``Assets/SoftBody/Generated/``, ``SoftBodyTetMeshAsset.cs:57-75``): pay
the host-side build once, ship the arrays.

Environment:
- ``SOFTBODYSIM_PLAN_CACHE``: cache directory (default
  ``~/.cache/softbodysim_tpu/plans``).
- ``SOFTBODYSIM_NO_PLAN_CACHE=1``: disable entirely (tests default to
  hermetic runs via conftest).
- ``SOFTBODYSIM_PLAN_CACHE_GB``: size bound (default 20); least
  recently USED entries are evicted after each save (loads touch
  mtime, so hot scenes stay resident).

Entries are pickles of numpy-dataclass plan bundles — an internal cache
format, not an interchange format (loading is best-effort: any failure
falls back to repacking).
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile

import numpy as np


def cache_dir() -> str:
    d = os.environ.get("SOFTBODYSIM_PLAN_CACHE")
    if d:
        return d
    return os.path.join(os.path.expanduser("~"), ".cache",
                        "softbodysim_tpu", "plans")


def enabled() -> bool:
    return os.environ.get("SOFTBODYSIM_NO_PLAN_CACHE", "") not in (
        "1", "true", "True")


def content_key(parts) -> str:
    """SHA-1 over a heterogeneous list of arrays / scalars / None.

    Arrays hash dtype+shape+bytes, so any topology or parameter change
    (including the packer version a caller includes) yields a new key.
    """
    h = hashlib.sha1()
    for p in parts:
        if p is None:
            h.update(b"\x00none")
        elif isinstance(p, np.ndarray):
            a = np.ascontiguousarray(p)
            h.update(str(a.dtype).encode())
            h.update(str(a.shape).encode())
            h.update(memoryview(a).cast("B"))
        else:
            h.update(repr(p).encode())
        h.update(b"|")
    return h.hexdigest()


def load(key: str):
    """Return the cached object for ``key``, or None (miss/disabled/error)."""
    if not enabled():
        return None
    path = os.path.join(cache_dir(), key + ".pkl")
    try:
        with open(path, "rb") as fh:
            obj = pickle.load(fh)
    except (OSError, pickle.UnpicklingError, EOFError, AttributeError,
            ImportError, ValueError):
        return None
    try:
        os.utime(path)            # LRU touch: keep hot scenes resident
    except OSError:
        pass                      # read-only cache / concurrent evict: the
    return obj                    # successfully loaded object still counts


def _evict(max_bytes: int) -> None:
    """Drop least-recently-used entries until the cache fits ``max_bytes``.
    Best-effort: concurrent processes may race; unlink errors ignored."""
    d = cache_dir()
    try:
        entries = []
        for f in os.listdir(d):
            if not f.endswith(".pkl"):
                continue
            p = os.path.join(d, f)
            st = os.stat(p)
            entries.append((st.st_mtime, st.st_size, p))
    except OSError:
        return
    total = sum(e[1] for e in entries)
    for mtime, size, p in sorted(entries):
        if total <= max_bytes:
            break
        try:
            os.unlink(p)
            total -= size
        except OSError:
            pass


def save(key: str, obj) -> None:
    """Best-effort atomic write (tmp file + rename); never raises."""
    if not enabled():
        return
    d = cache_dir()
    tmp = None
    try:
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "wb") as fh:
            pickle.dump(obj, fh, protocol=5)
        os.replace(tmp, os.path.join(d, key + ".pkl"))
        tmp = None
        try:
            gb = float(os.environ.get("SOFTBODYSIM_PLAN_CACHE_GB", "20"))
        except ValueError:
            gb = 20.0             # malformed env: keep the default bound
        _evict(int(gb * 2**30))
    except Exception:   # incl. PicklingError: skip the cache, never raise
        if tmp is not None:
            try:
                os.unlink(tmp)
            except OSError:
                pass
