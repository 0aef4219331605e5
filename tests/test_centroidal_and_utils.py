"""Centroidal model MPC, second-order DDP, and utils tests."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from nmpc_tpu import DDPConfig, DDPSolver, DDPStatus
from nmpc_tpu.models.centroidal import (
    example_ref_pos_func,
    make_centroidal_problem,
)
from nmpc_tpu.models.cartpole import make_cartpole_problem
from nmpc_tpu.models.oscillator import make_oscillator_problem
from nmpc_tpu.mpc.driver import run_mpc
from nmpc_tpu.utils.check import check_problem_derivatives
from nmpc_tpu.utils.trace import dump_ddp_trace, load_trace
from nmpc_tpu.utils.timing import timed_solve


def test_centroidal_mpc():
    """Reference closed-loop assertions (``TestDDPCentroidalMotion.cpp:351-353``):
    final |CoM - ref| < 1e-2, momenta norm < 1.0, through a jump (flight
    phase 1.4-1.6 s with zero contacts)."""
    dt = 0.03
    horizon_steps = 100
    problem = make_centroidal_problem(dt)
    solver = DDPSolver(problem, DDPConfig(horizon_steps=horizon_steps,
                                          max_iter=500))
    x0 = jnp.concatenate([jnp.array([0.0, 0.0, 1.0]), jnp.zeros(6)])
    log = run_mpc(solver, x0, t0=0.0, end_t=3.0)
    ref = np.asarray(example_ref_pos_func()(log.ts[-1] + dt))
    final_x = log.xs[-1]
    # flight phase: all forces zero
    fl = (log.ts > 1.41) & (log.ts < 1.59)
    assert np.abs(log.us[fl]).max() < 1e-12
    assert np.linalg.norm(final_x[:3] - ref) < 1e-2
    assert np.linalg.norm(final_x[3:]) < 1.0


def test_centroidal_jump_full_scenario(tmp_path):
    """The reference's full SolveMpc scenario
    (``TestDDPCentroidalMotion.cpp:238-331``): first solve uncapped, then
    max_iter=3 warm-started; per-step assertion
    ``(planned_pos - ref_pos).norm() < 1.0`` (:318); result file in the
    reference's 25-column layout; trace table from the first solve."""
    import sys

    sys.path.insert(0, os.getcwd())
    from examples.centroidal_jump import COLUMNS, run

    out = os.path.join(tmp_path, "result.txt")
    trace = os.path.join(tmp_path, "trace.txt")
    rows, pos_errs, xf = run(end_t=3.0, out_path=out, trace_path=trace)

    # reference per-step check (TestDDPCentroidalMotion.cpp:318)
    assert max(pos_errs) < 1.0
    # landing: final CoM at the stepped reference
    ref = np.asarray(example_ref_pos_func()(3.0))
    assert np.linalg.norm(xf[:3] - ref) < 1e-2
    assert np.linalg.norm(xf[3:]) < 1.0

    with open(out) as f:
        header = f.readline().strip()
    assert header == COLUMNS
    data = np.loadtxt(out, skiprows=1)
    assert data.shape == (len(rows), len(COLUMNS.split()))
    # flight phase (1.4-1.6 s): all contact forces identically zero
    fl = (data[:, 0] > 1.41) & (data[:, 0] < 1.59)
    assert np.abs(data[fl][:, 10:13]).max() < 1e-12
    # warm-started solves capped at 3 iterations (reference :315)
    assert data[1:, 16].max() <= 3
    assert os.path.exists(trace)


def test_second_order_ddp():
    """Full DDP with autodiff second-order dynamics terms — the feature the
    reference declares but leaves unimplemented (``DDPSolver.hpp:391-414``).
    Must converge on the nonlinear cart-pole and agree with iLQG's optimum."""
    problem = make_cartpole_problem(0.01)
    x0 = jnp.array([0.0, np.pi, 0.0, 0.0])
    us0 = jnp.zeros((60, 1))
    ilqg = DDPSolver(problem, DDPConfig(horizon_steps=60, max_iter=100))
    full = DDPSolver(problem, DDPConfig(horizon_steps=60, max_iter=100,
                                        use_state_eq_second_derivative=True))
    r1 = ilqg.solve(0.0, x0, us0)
    r2 = full.solve(0.0, x0, us0)
    assert int(r1.status) == DDPStatus.SUCCEEDED
    assert int(r2.status) == DDPStatus.SUCCEEDED
    c1, c2 = float(jnp.sum(r1.costs)), float(jnp.sum(r2.costs))
    # same local optimum
    assert abs(c1 - c2) / c1 < 1e-5
    np.testing.assert_allclose(np.asarray(r2.us), np.asarray(r1.us),
                               atol=1e-3)


def test_second_order_batched_matches_single():
    """Full DDP rides the stacked (batch-minor) fast path: solve_batch with
    ``use_state_eq_second_derivative=True`` must reproduce the single-solve
    results per lane (the reference stubs this feature entirely,
    ``DDPSolver.hpp:391-414``)."""
    import jax

    problem = make_cartpole_problem(0.01)
    config = DDPConfig(horizon_steps=40, max_iter=60,
                       use_state_eq_second_derivative=True)
    solver = DDPSolver(problem, config)
    x0s = jnp.asarray(np.array([
        [0.0, np.pi, 0.0, 0.0],
        [0.1, np.pi - 0.2, 0.0, 0.1],
        [-0.1, np.pi + 0.1, 0.2, 0.0],
    ]))
    us0 = jnp.zeros((3, 40, 1))
    batch = solver.solve_batch(0.0, x0s, us0)
    for i in range(3):
        single = solver.solve(0.0, x0s[i], us0[i])
        assert int(batch.status[i]) == int(single.status)
        assert int(batch.iters[i]) == int(single.iters)
        np.testing.assert_allclose(np.asarray(batch.us[i]),
                                   np.asarray(single.us), atol=1e-8)


def test_second_order_boxed_batched():
    """Second-order + box constraints together on the stacked path: inputs
    respect the box and lanes converge."""
    problem = make_cartpole_problem(0.01, input_limits=(-15.0, 15.0))
    config = DDPConfig(horizon_steps=40, max_iter=100,
                       use_state_eq_second_derivative=True,
                       with_input_constraint=True)
    solver = DDPSolver(problem, config)
    x0s = jnp.asarray(np.array([[0.0, np.pi, 0.0, 0.0],
                                [0.0, np.pi - 0.3, 0.0, 0.0]]))
    us0 = jnp.zeros((2, 40, 1))
    res = solver.solve_batch(0.0, x0s, us0)
    us = np.asarray(res.us)
    assert us.min() >= -15.0 - 1e-9 and us.max() <= 15.0 + 1e-9
    assert bool(jnp.all(jnp.isfinite(res.us)))


def test_derivative_checker():
    check_problem_derivatives(make_cartpole_problem(0.01), 0.0,
                              [1.0, -2.0, 3.0, -4.0], [10.0])
    check_problem_derivatives(make_oscillator_problem(0.01), 0.0,
                              [0.1, -0.2], [0.3])


def test_trace_dump_roundtrip(tmp_path):
    problem = make_cartpole_problem(0.01)
    solver = DDPSolver(problem, DDPConfig(horizon_steps=30, max_iter=20))
    res, dur = timed_solve(solver, 0.0, jnp.array([0.0, np.pi, 0.0, 0.0]),
                           jnp.zeros((30, 1)))
    assert dur.solve > 0
    path = os.path.join(tmp_path, "trace.txt")
    dump_ddp_trace(res, path)
    data = load_trace(path)
    # reference column schema (DDPSolver.hpp:567-578)
    assert list(data.keys()) == [
        "iter", "cost", "lambda", "dlambda", "alpha", "k_rel_norm",
        "cost_update_actual", "cost_update_expected", "cost_update_ratio",
        "duration_derivative", "duration_backward", "duration_forward"]
    assert data["iter"].shape[0] == int(res.iters) + 1
    assert data["cost"][0] == pytest.approx(float(res.trace.cost[0]))


def test_profiled_solve_fills_durations(tmp_path):
    """Profiled mode (utils/profiled.py) reproduces the fused solve exactly
    and fills the trace dump's per-iteration phase-duration columns with
    real nonzero milliseconds (reference ``DDPSolver.h:219-247``,
    TraceData duration columns ``DDPSolver.h:179-216``)."""
    from nmpc_tpu.utils.profiled import (
        estimate_backward_split,
        profiled_solve_ddp,
    )

    problem = make_cartpole_problem(0.01)
    solver = DDPSolver(problem, DDPConfig(horizon_steps=30, max_iter=20))
    x0 = jnp.array([0.0, np.pi, 0.0, 0.0])
    us0 = jnp.zeros((30, 1))

    fused = solver.solve(0.0, x0, us0)
    prof, dur, cd = profiled_solve_ddp(solver, 0.0, x0, us0)

    assert int(prof.status) == int(fused.status)
    assert int(prof.iters) == int(fused.iters)
    np.testing.assert_allclose(np.asarray(prof.us), np.asarray(fused.us),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(prof.trace.cost),
                               np.asarray(fused.trace.cost), rtol=1e-12)

    n = int(prof.iters)
    for k in ("derivative", "backward", "forward"):
        assert dur[k][1:n].min() > 0.0, k
    # totals consistent: phases <= end-to-end solve time
    assert 0 < cd.opt <= cd.solve
    assert cd.derivative + cd.backward + cd.forward == pytest.approx(cd.opt)

    path = os.path.join(tmp_path, "trace_prof.txt")
    dump_ddp_trace(prof, path, durations=dur)
    data = load_trace(path)
    assert data["duration_backward"][1:].min() > 0.0

    split = estimate_backward_split(solver, 0.0, x0, us0)
    assert all(v > 0 for v in split.values())


def test_profiled_solve_fmpc_fills_durations(tmp_path):
    """FMPC profiled mode: coeff/backward/forward/update columns
    (reference ``FmpcSolver.h:254-288``) filled with real times and the
    result matching the fused solve."""
    from nmpc_tpu import FmpcConfig, FmpcSolver, fmpc_variable_reset
    from nmpc_tpu.utils.profiled import profiled_solve_fmpc
    from nmpc_tpu.utils.trace import dump_fmpc_trace

    problem = make_oscillator_problem(0.01)
    solver = FmpcSolver(problem, FmpcConfig(horizon_steps=50, max_iter=5))
    var = fmpc_variable_reset(50, 2, 1, 3)
    x0 = jnp.array([0.0, 1.0])

    fused = solver.solve(0.0, x0, var)
    prof, dur = profiled_solve_fmpc(solver, 0.0, x0, var)

    assert int(prof.status) == int(fused.status)
    assert int(prof.iters) == int(fused.iters)
    np.testing.assert_allclose(np.asarray(prof.variable.us),
                               np.asarray(fused.variable.us), atol=1e-10)
    np.testing.assert_allclose(np.asarray(prof.trace.kkt_error),
                               np.asarray(fused.trace.kkt_error), rtol=1e-10)

    assert dur["coeff"][1] > 0.0
    n = int(prof.iters)
    assert dur["backward"][1:n].min() > 0.0

    path = os.path.join(tmp_path, "fmpc_trace_prof.txt")
    dump_fmpc_trace(prof, path, durations=dur)
    data = load_trace(path)
    assert data["duration_coeff"].min() > 0.0


def test_print_level_gated_logging(capfd):
    """print_level=3 streams per-iteration diagnostics (reference
    DDPSolver.h:62-63 gate); the default 0 compiles to silence."""
    problem = make_cartpole_problem(0.01)
    x0 = jnp.array([0.0, np.pi, 0.0, 0.0])
    us0 = jnp.zeros((10, 1))

    quiet = DDPSolver(problem, DDPConfig(horizon_steps=10, max_iter=3))
    quiet.solve(0.0, x0, us0)
    out = capfd.readouterr().out
    assert "[DDP]" not in out

    loud = DDPSolver(problem, DDPConfig(horizon_steps=10, max_iter=3,
                                        print_level=3))
    res = loud.solve(0.0, x0, us0)
    import jax
    jax.effects_barrier()
    out = capfd.readouterr().out
    assert "[DDP] iter 1:" in out and "lambda" in out
    assert out.count("[DDP] iter") == int(res.iters)


def test_cgmres_dump_roundtrip(tmp_path):
    """C/GMRES /tmp-dump file layout (CgmresSolver.cpp:68-103)."""
    import json

    from nmpc_tpu.utils.trace import dump_cgmres_data, load_cgmres_data

    n = 7
    ts = np.linspace(0.0, 0.006, n)
    xs = np.random.default_rng(0).normal(size=(n, 2))
    us = np.random.default_rng(1).normal(size=(n, 3))
    errs = np.abs(np.random.default_rng(2).normal(size=n))
    prefix = os.path.join(tmp_path, "cgmres")
    dump_cgmres_data(ts, xs, us, errs, prefix=prefix, log_dt=0.001,
                     param={"dim_x": 2})
    ts2, xs2, us2, errs2 = load_cgmres_data(prefix)
    np.testing.assert_allclose(ts2, ts)
    np.testing.assert_allclose(xs2, xs)
    np.testing.assert_allclose(us2, us)
    np.testing.assert_allclose(errs2, errs)
    with open(prefix + "_param.dat") as f:
        p = json.load(f)
    assert p == {"dim_x": 2, "log_dt": 0.001}
