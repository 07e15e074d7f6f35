"""Probe: reverse-mode autodiff through the sharded steps (VERDICT r3 #2).

Measures compile time + gradient parity vs the single-device rollout on
the 8-device virtual CPU mesh.  Round-3f dead end: reverse-mode through
the sharded xpbd constraint-MP step didn't finish compiling in 9+ min on
XLA:CPU; this probe isolates which sharded mode has the pathology and
whether the scatter formulation avoids it.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_sharded_grad.py
"""

import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp                                      # noqa: E402

from softbodysim_tpu import SolverParams                      # noqa: E402
from softbodysim_tpu.core import meshes                      # noqa: E402
from softbodysim_tpu.core.state import init_state            # noqa: E402
from softbodysim_tpu.solver import make_step                 # noqa: E402
from softbodysim_tpu.parallel import sharding as sh          # noqa: E402

DT = 1.0 / 60.0
NSTEPS = 5


def loss_of(step_fn, state0, nsteps=NSTEPS):
    import dataclasses

    def run(x0):
        st = dataclasses.replace(state0, x=x0, x_star=x0)

        def body(s, _):
            s2 = step_fn(s, DT)
            return s2, None
        st, _ = jax.lax.scan(body, st, None, length=nsteps)
        return jnp.sum(st.x * st.x)
    return run


def probe(name, build, topo, params, batched=False):
    state0 = init_state(topo)
    if batched:
        state0 = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (8,) + a.shape), state0)
    try:
        t0 = time.time()
        fn = build()
        run = loss_of(fn, state0)
        g = jax.jit(jax.grad(run))
        gv = g(state0.x)
        gv.block_until_ready()
        t1 = time.time()
        print(f"{name}: compiled+ran grad in {t1-t0:.1f}s  "
              f"|g|={float(jnp.abs(gv).max()):.4e}")
        return np.asarray(gv)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {e}")
        return None


def main():
    topo = meshes.tet_cube(4, 4, 4, size=0.5, center=(0.0, 0.6, 0.0))
    mesh = sh.make_mesh((1, 8))
    mesh1 = sh.make_mesh((8,), axis_names=("model",))

    for dialect in ("jacobi", "xpbd"):
        if dialect == "jacobi":
            params = SolverParams(dialect="jacobi", substeps=2, iterations=4,
                                  jacobi_backend="segment")
        else:
            params = SolverParams(dialect="xpbd", substeps=2, iterations=4,
                                  xpbd_backend="scatter")
        print(f"--- {dialect} ---")
        ref = probe(f"{dialect} single-device",
                    lambda: make_step(topo, params), topo, params)

        if dialect == "jacobi":
            g2 = probe(
                "jacobi mesh-sharded (data=1, model=8)",
                lambda: (lambda st, dt: jax.tree_util.tree_map(
                    lambda a: a[0],
                    sh.make_mesh_sharded_step(topo, params, mesh)(
                        jax.tree_util.tree_map(
                            lambda a: a[None], st), dt))),
                topo, params)
            if ref is not None and g2 is not None:
                print("   parity:",
                      float(np.abs(g2 - ref).max() /
                            max(np.abs(ref).max(), 1e-20)))
            g3 = probe(
                "jacobi vertex-sharded (model=8)",
                lambda: sh.make_sharded_step(topo, params, mesh1), topo,
                params)
            if ref is not None and g3 is not None:
                print("   parity:",
                      float(np.abs(g3 - ref).max() /
                            max(np.abs(ref).max(), 1e-20)))
        else:
            g2 = probe(
                "xpbd constraint-sharded (data=1, model=8)",
                lambda: (lambda st, dt: jax.tree_util.tree_map(
                    lambda a: a[0],
                    sh.make_xpbd_sharded_step(topo, params, mesh)(
                        jax.tree_util.tree_map(
                            lambda a: a[None], st), dt))),
                topo, params)
            g3 = probe(
                "xpbd vertex-sharded (model=8)",
                lambda: sh.make_xpbd_vertex_sharded_step(topo, params,
                                                         mesh1),
                topo, params)
            for g in (g2, g3):
                if ref is not None and g is not None:
                    print("   parity:",
                          float(np.abs(g - ref).max() /
                                max(np.abs(ref).max(), 1e-20)))


if __name__ == "__main__":
    main()
