"""Benchmark: the BASELINE.json north-star workloads, honestly.

Three workloads, one JSON line (round-1 VERDICT asked for all three numbers
that were previously only in PLAN.md):

1. **north_star** (the headline): ONE 100k-particle scene (tet_cube(47),
   V=110592 / E=642960 / T=519115), XPBD dialect, 8 substeps, ground contact,
   stepped with the Pallas sweep backend (kernels/sweep.py).  BASELINE.json:
   ">= 60 Hz".  vs_baseline = steps_per_sec / 60.
   QUALITY-NORMALIZED since round 4: the default in-block scheme (mass
   splitting, omega (1.5, 2.2) -- solver/xpbd_pallas._resolve_block_scheme)
   settles at 0.92x (edge) / 0.80x (tet) of the compiled serial reference's
   residual at this exact scale (tools/probe_scale_convergence.py, PLAN.md
   round 4a), so the reported steps/s is at-or-better-than serial-GS
   solution quality per iteration -- no convergence asterisk.
2. **north_star_iters6**: the same scene at the reference's iteration count
   (substeps 8 x iterations 6) -- the hardest honest configuration.
3. **batched**: 128 vmapped bunny-scale Jacobi bodies (the BatchTest-style
   datagen workload) -- constraint projections/sec vs the 1e8/s/core target.
4. **batch_test**: the reference's actual BatchTest scene (20 bodies /
   87.8k particles / 687k constraints, real tet assets, BatchTest.unity
   tunings), merged-mesh execution on the jacobi Pallas passes
   (Scene.build_merged).  The reference implies 60 FPS interactive.
5. **partitioned_mixed** (round 5): a mixed-DIALECT all-unique-mesh world
   (20 unique bodies, 10 jacobi + 10 xpbd, ~118k particles / 1.16M
   constraints) that the single merged program cannot express, executed
   as TWO merged programs via Scene.build_partitioned -- the replacement
   for the per-body loop's ~20x slow lane (measured 62.9 vs 4.5 steps/s,
   PLAN.md round 5).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time


def _bench_single(meshes, SolverParams, init_state, make_step, jax,
                  iterations: int, steps: int):
    topo = meshes.tet_cube(47, 47, 47, size=1.0, center=(0.0, 2.0, 0.0))
    params = SolverParams(dialect="xpbd", substeps=8, iterations=iterations,
                          xpbd_backend="pallas")
    step = make_step(topo, params)
    if hasattr(step, "run_carry"):
        # steady-state continuous simulation: the internal layout stays
        # HBM-resident across calls (the Engine's carry-persistent mode /
        # the reference's zero-readback GPU path); each timed window has a
        # carried data dependency on the previous one
        carry = step.pack_state(init_state(topo))
        carry = step.run_carry(carry, 1.0 / 60.0, steps)
        jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
        reps, elapsed = 3, 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                carry = step.run_carry(carry, 1.0 / 60.0, steps)
            jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
            elapsed = min(elapsed, (time.perf_counter() - t0) / reps)
    else:
        if getattr(step.step_n, "prejit", False):  # pallas backends pre-jit
            run = lambda s: step.step_n(s, 1.0 / 60.0, steps)  # noqa: E731
        else:
            run = jax.jit(lambda s: step.step_n(s, 1.0 / 60.0, steps))
        # the pre-jitted paths donate the state buffers, so feed a fresh
        # state per call (init cost is negligible vs the 60-step program)
        out = run(init_state(topo))
        jax.block_until_ready(out.x)       # compile + warm
        elapsed = 1e30
        for _ in range(2):
            state = init_state(topo)
            jax.block_until_ready(state.x)
            t0 = time.perf_counter()
            out = run(state)
            jax.block_until_ready(out.x)
            elapsed = min(elapsed, time.perf_counter() - t0)
    per_step = elapsed / steps
    nproj = ((topo.num_edges + topo.num_tets) * params.substeps
             * params.iterations)
    return topo, 1.0 / per_step, per_step * 1e3, nproj / per_step


def _worker_delegate():
    """Run the bench inside a live persistent TPU worker, if one exists.

    The axon TPU tunnel is exclusive to ONE process (see
    .claude/skills/verify/SKILL.md): if tools/tpu_worker.py currently owns
    it (fresh /tmp/tpu_jobs/.heartbeat), initializing the backend here
    would fail.  Instead, submit this benchmark as a worker job and relay
    the JSON line it prints.  Returns the line, or None to bench inline
    (no worker running — the normal standalone case).
    """
    import os
    import sys

    if os.environ.get("SOFTBODYSIM_BENCH_INLINE"):
        return None                      # we ARE the worker job
    hb = "/tmp/tpu_jobs/.heartbeat"
    try:
        fresh = time.time() - os.path.getmtime(hb) < 10.0
    except OSError:
        return None
    if not fresh:
        return None
    me = os.path.abspath(__file__)
    job = f"/tmp/tpu_jobs/zbench_{int(time.time())}"
    with open(job + ".py", "w") as fh:
        fh.write(
            "import sys, os, runpy\n"
            "for m in [m for m in sys.modules"
            " if m.startswith('softbodysim_tpu')]:\n"
            "    del sys.modules[m]\n"
            "os.environ['SOFTBODYSIM_BENCH_INLINE'] = '1'\n"
            f"runpy.run_path({me!r}, run_name='__main__')\n")
    print(f"delegating to TPU worker ({job}.py)", file=sys.stderr)
    deadline = time.time() + 2400
    while time.time() < deadline:
        if os.path.exists(job + ".done"):
            with open(job + ".out") as fh:
                text = fh.read()
            for line in text.splitlines():
                line = line.strip()
                if line.startswith("{") and line.endswith("}"):
                    return line
            print(text, file=sys.stderr)
            raise SystemExit("worker bench job produced no JSON line")
        try:
            stale = time.time() - os.path.getmtime(hb) > 60.0
        except OSError:
            stale = True
        if stale:
            print("TPU worker heartbeat lost; benching inline",
                  file=sys.stderr)
            return None
        time.sleep(1.0)
    raise SystemExit("bench delegation timed out after 40 min")


def main():
    line = _worker_delegate()
    if line is not None:
        print(line)
        return

    import jax

    from softbodysim_tpu import SolverParams
    from softbodysim_tpu.core import meshes
    from softbodysim_tpu.core.state import init_state
    from softbodysim_tpu.solver import make_step
    from softbodysim_tpu.parallel import BatchedEngine

    # --- 1. the north star: 100k particles, 8 substeps, one scene ---------
    topo, sps1, ms1, proj1 = _bench_single(
        meshes, SolverParams, init_state, make_step, jax,
        iterations=1, steps=60)

    # --- 2. same scene at the reference's iters=6 -------------------------
    _, sps6, ms6, proj6 = _bench_single(
        meshes, SolverParams, init_state, make_step, jax,
        iterations=6, steps=10)

    # --- 2b. iters6-EQUIVALENT: fewest iterations whose settled residual
    # matches the serial reference at ITS six (the split scheme converges
    # faster per iteration).  Measured round 5 (worker job 201, same
    # ss2/120-step/30-tail protocol as round 4a): iterations=5 settles at
    # 0.94x (edge) / 0.90x (tet) of the serial iters-6 anchor; 4 is not
    # quite there on tets (1.03x).
    _, sps5, ms5, _ = _bench_single(
        meshes, SolverParams, init_state, make_step, jax,
        iterations=5, steps=10)

    # --- 3. batched datagen throughput (BatchTest-style) ------------------
    btopo = meshes.tet_cube(10, 10, 10, size=0.8, center=(0.0, 1.0, 0.0))
    batch = 128
    bparams = SolverParams(
        dialect="jacobi", substeps=2, iterations=6,
        edge_stiffness=0.9, volume_stiffness=0.98, sor_omega=1.4,
        particle_radius=0.02, gravity=(0.0, -10.0, 0.0),
        jacobi_backend="gather")
    eng = BatchedEngine(btopo, bparams, batch=batch, pos_jitter=0.002)
    dt = 1.0 / 60.0
    eng.step(dt)
    eng.block()
    bsteps = 50
    t0 = time.perf_counter()
    for _ in range(bsteps):
        eng.step(dt)
    eng.block()
    belapsed = time.perf_counter() - t0
    brate = (batch * (btopo.num_edges + btopo.num_tets)
             * bparams.iterations * bparams.substeps * bsteps) / belapsed

    # --- 4. the reference's BatchTest scene, merged-mesh execution --------
    from softbodysim_tpu.api.scenes import batch_test

    bt = batch_test()
    beng, _ = bt.build_merged()
    chunk = beng.RUN_CHUNK
    beng.run(chunk, dt)
    beng.block()                           # compile + warm
    bt_best = 1e30
    for _ in range(3):                     # 64-step windows, best of 3
        t0 = time.perf_counter()
        beng.run(2 * chunk, dt)
        beng.block()
        bt_best = min(bt_best, time.perf_counter() - t0)
    bt_sps = 2 * chunk / bt_best
    btopo_m = beng.topology

    # --- 5. mixed-dialect unique-mesh world, partitioned execution --------
    from softbodysim_tpu.api.scenes import Scene, _params

    pm_bodies = []
    px = SolverParams(dialect="xpbd", substeps=2, iterations=6)
    for i in range(10):
        t = meshes.tet_cube(11 + (i % 3), 11 + ((i + 1) % 2), 11, size=0.5,
                            center=(i * 1.2 - 6.0, 1.0, -1.0))
        pm_bodies.append(
            (f"j{i}", t, _params(edge=0.5 + 0.04 * i, vol=1.0), {}))
    for i in range(10):
        t = meshes.tet_cube(20 + (i % 3), 20 + ((i + 1) % 2), 20, size=1.0,
                            center=(i * 1.5 - 7.0, 1.2, 1.5))
        pm_bodies.append((f"x{i}", t, px, {}))
    pm = Scene(name="partitioned_mixed", colliders=[],
               bodies=pm_bodies).build_partitioned(backend="pallas")
    pm_v = sum(t.num_particles for _, t, _, _ in pm_bodies)
    pm_c = sum(t.num_edges + t.num_tets for _, t, _, _ in pm_bodies)
    pm_steps = 32                           # one RUN_CHUNK burst per engine
    pm.run(pm_steps, dt)                    # compile + warm
    pm_best = 1e30
    for _ in range(3):                      # chunk windows, best of 3
        t0 = time.perf_counter()
        pm.run(pm_steps, dt)
        pm_best = min(pm_best, time.perf_counter() - t0)
    pm_sps = pm_steps / pm_best

    result = {
        "metric": "100k_particle_8substep_steps_per_sec",
        "value": float(f"{sps1:.4g}"),
        "unit": "steps/s",
        "vs_baseline": float(f"{sps1 / 60.0:.4g}"),
        "detail": {
            "north_star": {
                "V": topo.num_particles, "E": topo.num_edges,
                "T": topo.num_tets, "substeps": 8, "iterations": 1,
                "ms_per_step": round(ms1, 2),
                "steps_per_sec": round(sps1, 2),
                "proj_per_sec": float(f"{proj1:.4g}"),
                # settled-residual ratio vs the compiled serial reference
                # at THIS scale/protocol (ss2 x it6, 120 steps, 30-tail;
                # tools/probe_scale_convergence.py, measured round 4 on
                # v5e) for the default block scheme the run above used
                "quality": {
                    "block_scheme": "split/split omega=(1.5,2.2)",
                    "edge_residual_vs_serial": 0.92,
                    "tet_residual_vs_serial": 0.80,
                },
            },
            "north_star_iters6": {
                "substeps": 8, "iterations": 6,
                "ms_per_step": round(ms6, 2),
                "steps_per_sec": round(sps6, 2),
                "proj_per_sec": float(f"{proj6:.4g}"),
            },
            "north_star_iters6_matched": {
                # serial-iters6-residual-equivalent configuration
                "substeps": 8, "iterations": 5,
                "ms_per_step": round(ms5, 2),
                "steps_per_sec": round(sps5, 2),
                "residual_vs_serial_it6": {"edge": 0.94, "tet": 0.90},
            },
            "batched_128x_jacobi": {
                "batch": batch, "V": btopo.num_particles,
                "proj_per_sec": float(f"{brate:.4g}"),
                "vs_1e8_target": float(f"{brate / 1e8:.4g}"),
            },
            "batch_test_merged": {
                "bodies": len(bt.bodies), "V": btopo_m.num_particles,
                "constraints": btopo_m.num_edges + btopo_m.num_tets,
                "ms_per_step": round(bt_best / (2 * chunk) * 1e3, 2),
                "steps_per_sec": round(bt_sps, 1),
                "vs_60fps": float(f"{bt_sps / 60.0:.4g}"),
            },
            "partitioned_mixed_dialect": {
                "bodies": 20, "programs": pm.num_programs, "V": pm_v,
                "constraints": pm_c,
                "ms_per_step": round(pm_best / pm_steps * 1e3, 2),
                "steps_per_sec": round(pm_sps, 1),
                "vs_60fps": float(f"{pm_sps / 60.0:.4g}"),
            },
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
