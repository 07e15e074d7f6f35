"""World scheduler semantics (SoftBodyManager.Update accumulator,
SoftBodyManager.cs:73-94) + stats reporting."""

import numpy as np

from softbodysim_tpu import Body, SolverParams, World
from softbodysim_tpu.core import meshes
from softbodysim_tpu.perf import StepStats


def _world(**kw):
    w = World(fixed_dt=1.0 / 60.0, **kw)
    w.register(Body(meshes.single_tet(), SolverParams(dialect="xpbd",
                                                      substeps=1,
                                                      iterations=2)))
    return w


def test_frame_accumulator_steps():
    w = _world()
    # a 1/30 frame at fixed_dt 1/60 -> 2 steps
    assert w.frame(1.0 / 30.0) == 2
    # a tiny frame accumulates without stepping
    assert w.frame(1.0 / 240.0) == 0
    # accumulation carries: 3 more tiny frames push past one dt
    steps = sum(w.frame(1.0 / 240.0) for _ in range(3))
    assert steps == 1


def test_frame_clamps_and_overflow_reset():
    w = _world(max_steps_per_frame=3, max_frame_delta_time=0.05)
    # a huge frame is clamped to maxFrameDeltaTime then to maxStepsPerFrame;
    # hitting the cap resets the accumulator (SoftBodyManager.cs:90)
    assert w.frame(10.0) == 3
    assert w._accumulator == 0.0
    # next small frame starts fresh
    assert w.frame(1.0 / 240.0) == 0


def test_unregister_stops_stepping():
    w = _world()
    b = w.bodies[0]
    x0 = b.positions().copy()
    w.unregister(b)
    w.step()
    np.testing.assert_array_equal(b.positions(), x0)


def test_step_stats_report_format():
    st = StepStats()
    with st.scope("step"):
        pass
    st.add("pack", 0.001)
    line = st.report(prefix="[t]")
    assert line.startswith("[t]")
    assert "step=" in line and "pack=" in line and "%" in line
    # reset cleared accumulators
    assert st.count == 0 and not st.sums
