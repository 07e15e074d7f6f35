"""Persistent packed-plan cache (io/plan_store.py).

Packing must be skipped on a disk hit, the loaded plans must be
array-identical to freshly packed ones, and any content or parameter
change must miss.  No Pallas compiles here — only the host-side
_cached_plans path — so this file stays in the quick tier.
"""

import dataclasses
import os

import numpy as np
import pytest

from softbodysim_tpu.core import meshes
from softbodysim_tpu.io import plan_store
from softbodysim_tpu.kernels import sweep as sw
from softbodysim_tpu.solver import xpbd_pallas as xp


@pytest.fixture
def store(tmp_path, monkeypatch):
    monkeypatch.delenv("SOFTBODYSIM_NO_PLAN_CACHE", raising=False)
    monkeypatch.setenv("SOFTBODYSIM_PLAN_CACHE", str(tmp_path))
    return tmp_path


def _plans(topo, **kw):
    return xp._cached_plans(topo, kw.pop("vertex_order", "auto"),
                            kw.pop("slots_cap", None),
                            kw.pop("layer_cap", None),
                            kw.pop("superblocks", True),
                            kw.pop("seg_windows", 0))


def _assert_plan_equal(a, b):
    assert type(a) is type(b)
    if a is None:
        return
    for f in dataclasses.fields(a):
        va, vb = getattr(a, f.name), getattr(b, f.name)
        if isinstance(va, np.ndarray):
            np.testing.assert_array_equal(va, vb, err_msg=f.name)
        elif f.name == "segs":
            assert len(va) == len(vb)
            for sa, sb in zip(va, vb):
                _assert_plan_equal(sa, sb)
        elif f.name == "plan":
            _assert_plan_equal(va, vb)
        else:
            assert va == vb, f.name


def test_roundtrip_and_packing_skipped(store, monkeypatch):
    topo = meshes.tet_cube(5, 5, 5, size=1.0)
    fresh = _plans(topo)
    files = [f for f in os.listdir(store) if f.endswith(".pkl")]
    assert len(files) == 1

    # same content, new object (new id -> in-memory miss) must come off
    # disk without invoking the packer at all
    topo2 = meshes.tet_cube(5, 5, 5, size=1.0)

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("packer ran despite a disk hit")

    monkeypatch.setattr(sw, "pack_superblocks", boom)
    monkeypatch.setattr(sw, "pack_constraints", boom)
    loaded = _plans(topo2)

    perm_a, o2n_a, nwin_a, ep_a, tp_a = fresh
    perm_b, o2n_b, nwin_b, ep_b, tp_b = loaded
    np.testing.assert_array_equal(perm_a, perm_b)
    np.testing.assert_array_equal(o2n_a, o2n_b)
    assert nwin_a == nwin_b
    _assert_plan_equal(ep_a, ep_b)
    _assert_plan_equal(tp_a, tp_b)


def test_content_or_param_change_misses(store):
    topo = meshes.tet_cube(4, 4, 4, size=1.0)
    _plans(topo)
    n0 = len(os.listdir(store))

    # different geometry -> new entry
    _plans(meshes.tet_cube(4, 4, 4, size=1.2))
    # different packing params -> new entry
    _plans(topo, slots_cap=8)
    _plans(topo, seg_windows=2)
    assert len(os.listdir(store)) == n0 + 3


def test_corrupt_entry_falls_back(store):
    topo = meshes.tet_cube(4, 4, 4, size=1.0)
    fresh = _plans(topo)
    (pkl,) = [f for f in os.listdir(store) if f.endswith(".pkl")]
    with open(os.path.join(store, pkl), "wb") as fh:
        fh.write(b"not a pickle")
    xp._PLAN_CACHE.clear()
    again = _plans(topo)
    np.testing.assert_array_equal(fresh[0], again[0])


def test_disabled_by_default_in_tests(tmp_path):
    # conftest sets SOFTBODYSIM_NO_PLAN_CACHE=1: nothing may touch disk
    assert not plan_store.enabled()
    topo = meshes.tet_cube(3, 3, 3, size=1.0)
    _plans(topo)
    assert plan_store.load("deadbeef") is None
    plan_store.save("deadbeef", {"x": 1})  # must be a no-op
    assert not os.path.exists(
        os.path.join(plan_store.cache_dir(), "deadbeef.pkl"))


def test_lru_eviction(store, monkeypatch):
    # three ~equal entries, cap that fits only two: the least recently
    # USED entry goes; a load refreshes recency
    import time as _time

    now = _time.time()
    for i, key in enumerate(("aaa", "bbb", "ccc")):
        plan_store.save(key, np.zeros(1000, np.float64))
        past = now - 1000 + i
        os.utime(os.path.join(store, key + ".pkl"), (past, past))
    assert plan_store.load("aaa") is not None      # refresh aaa's mtime

    sz = os.path.getsize(os.path.join(store, "aaa.pkl"))
    monkeypatch.setenv("SOFTBODYSIM_PLAN_CACHE_GB",
                       str(2.5 * sz / 2**30))
    plan_store.save("ddd", np.zeros(1000, np.float64))   # triggers evict
    left = sorted(f for f in os.listdir(store) if f.endswith(".pkl"))
    # bbb (oldest-used) evicted; recently-loaded aaa survives
    assert "bbb.pkl" not in left
    assert "aaa.pkl" in left and "ddd.pkl" in left
