"""Failure detection + rollback."""

import numpy as np
import jax.numpy as jnp

from softbodysim_tpu import Engine, SolverParams
from softbodysim_tpu.api.watchdog import Watchdog, WatchdogConfig
from softbodysim_tpu.core import meshes
from softbodysim_tpu.core.state import SimState

DT = 1.0 / 60.0


def test_healthy_run_snapshots_and_never_rolls_back():
    topo = meshes.tet_cube(2, 2, 2, center=(0.0, 0.5, 0.0))
    eng = Engine(topo, SolverParams(dialect="xpbd"))
    wd = Watchdog(eng, WatchdogConfig(check_every=5))
    ok = all(wd.step(DT) for _ in range(30))
    assert ok
    assert wd.rollbacks == 0


def test_nan_injection_triggers_rollback():
    topo = meshes.tet_cube(2, 2, 2, center=(0.0, 0.5, 0.0))
    eng = Engine(topo, SolverParams(dialect="xpbd"))
    wd = Watchdog(eng, WatchdogConfig(check_every=5))
    for _ in range(10):
        wd.step(DT)
    good = eng.positions()

    # corrupt the state
    st = eng.state
    x_bad = st.x.at[0, 0].set(jnp.nan)
    eng.state = SimState(x=x_bad, v=st.v, x_star=st.x_star,
                         inv_mass=st.inv_mass, edge_lambda=st.edge_lambda,
                         tet_lambda=st.tet_lambda)

    rolled = False
    for _ in range(5):
        if not wd.step(DT):
            rolled = True
            break
    assert rolled
    assert wd.rollbacks == 1
    assert np.isfinite(eng.positions()).all()
    # restored state is a previously-seen healthy state (same topology scale)
    assert np.abs(eng.positions() - good).max() < 1.0


def test_velocity_bound_triggers():
    topo = meshes.single_tet()
    eng = Engine(topo, SolverParams(ground_enabled=False))
    wd = Watchdog(eng, WatchdogConfig(check_every=1, max_speed=0.5))
    # free fall exceeds 0.5 after ~3 steps at g~=9.81
    tripped = False
    for _ in range(10):
        if not wd.step(DT):
            tripped = True
            break
    assert tripped
