"""Megascale plan-build profile (VERDICT r3 #5): end-to-end wall time to
build the XPBD Pallas step's plans at N particles, via the production
path (solver/xpbd_pallas._cached_plans with the auto-selected segmented
layout), with cProfile attribution of the hot stages.

Run: python tools/profile_megapack.py [n_side] [--cprofile]
n_side=126 -> 2,048,383 particles (the 2M scale point).
"""
import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main(n_side=126, do_profile=False):
    import softbodysim_tpu.solver.xpbd_pallas as xp
    from softbodysim_tpu.core import meshes
    from softbodysim_tpu.kernels.sweep import LANES
    from softbodysim_tpu.solver.xpbd_pallas import (
        DEFAULT_SEG_WINDOWS, MAX_FLAT_WINDOWS)

    t0 = time.time()
    topo = meshes.tet_cube(n_side, n_side, n_side, size=2.0,
                           center=(0.0, 3.0, 0.0))
    t_mesh = time.time() - t0
    print(f"mesh: V={topo.num_particles:,} E={topo.num_edges:,} "
          f"T={topo.num_tets:,}  [{t_mesh:.1f}s]", flush=True)

    est_nwin = -(-topo.num_particles // LANES)
    seg = DEFAULT_SEG_WINDOWS if est_nwin > MAX_FLAT_WINDOWS else 0
    print(f"seg_windows={seg}", flush=True)

    # bypass the disk plan store so we time a real build
    from softbodysim_tpu.io import plan_store as ps

    orig_save, orig_load = ps.save, ps.load
    ps.save = lambda *a, **k: None
    ps.load = lambda *a, **k: None
    try:
        t0 = time.time()
        if do_profile:
            pr = cProfile.Profile()
            pr.enable()
        res = xp._cached_plans(topo, "auto", None, None, True, seg)
        if do_profile:
            pr.disable()
        t_build = time.time() - t0
    finally:
        ps.save = orig_save
        ps.load = orig_load
    perm, old2new, nwin, e_plan, t_plan = res
    print(f"plan build: {t_build:.1f}s  (nwin={nwin}, "
          f"edge segs={len(getattr(e_plan, 'segs', [])) or 'flat'}, "
          f"tet segs={len(getattr(t_plan, 'segs', [])) or 'flat'})",
          flush=True)
    print(f"TOTAL (mesh + build): {t_mesh + t_build:.1f}s", flush=True)
    if do_profile:
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
        print(s.getvalue())


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--cprofile"]
    main(*(int(a) for a in args),
         do_profile="--cprofile" in sys.argv)
