"""Megascale plan-build profile (VERDICT r3 #5): end-to-end wall time to
build the XPBD Pallas step's plans at N particles, with a per-stage
breakdown (order, pack, regroup, table materialization).

Run: python tools/profile_megapack.py [n_side]
n_side=126 -> 2,000,376 particles (the 2M scale point).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main(n_side=126):
    import softbodysim_tpu.kernels.sweep as sw
    from softbodysim_tpu.core import meshes

    t0 = time.time()
    topo = meshes.tet_cube(n_side, n_side, n_side, size=2.0,
                           center=(0.0, 3.0, 0.0))
    t_mesh = time.time() - t0
    print(f"mesh: V={topo.num_particles:,} E={topo.num_edges:,} "
          f"T={topo.num_tets:,}  [{t_mesh:.1f}s]", flush=True)

    t0 = time.time()
    aligned = sw.aligned_order(topo.num_particles, topo.edges)
    t_order = time.time() - t0
    print(f"aligned_order: {t_order:.1f}s", flush=True)
    perm_layout, old2new = aligned
    nwin = len(perm_layout) // sw.LANES

    stages = {}
    plans = {}
    for fam, cons, rest, lcap in (
            ("edge", topo.edges, topo.edge_rest, 2),
            ("tet", topo.tets, topo.tet_rest_vol, 3)):
        c = old2new[np.asarray(cons, np.int64)]
        t0 = time.time()
        plan = sw.pack_superblocks(c, rest, nwin, layer_cap=lcap)
        stages[f"pack_{fam}"] = time.time() - t0
        t0 = time.time()
        plan = sw.regroup_plan(plan)
        stages[f"regroup_{fam}"] = time.time() - t0
        plans[fam] = plan
        print(f"{fam}: pack {stages[f'pack_{fam}']:.1f}s  regroup "
              f"{stages[f'regroup_{fam}']:.1f}s  blocks={plan.num_super} "
              f"groups={plan.groups}", flush=True)

    total = t_mesh + t_order + sum(stages.values())
    print(f"TOTAL plan build: {total:.1f}s "
          f"(mesh {t_mesh:.1f} + order {t_order:.1f} + "
          f"pack/regroup {sum(stages.values()):.1f})", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
