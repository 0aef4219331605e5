"""Native MPC executor tests: cart-pole swing-up through the C++ runtime
(the reference's asynchronous mpc_dt/sim_dt driver, TestDDPCartPole.cpp:299-347,
with FMPC-style inter-solve affine feedback, TestFmpcCartPole.cpp:345-356)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nmpc_tpu import DDPConfig, DDPSolver
from nmpc_tpu.models.cartpole import make_cartpole_problem
from nmpc_tpu.mpc.driver import shift_warm_start
from nmpc_tpu.runtime.executor import MpcExecutor


def _make_solver():
    # horizon model uses its own dt (0.01), plant runs at sim_dt (0.002):
    # the reference's exact multi-rate setup
    problem = make_cartpole_problem(0.01,
                                    param=__import__("nmpc_tpu.models.cartpole",
                                                     fromlist=["CartPoleParam"]
                                                     ).CartPoleParam())
    solver = DDPSolver(problem, DDPConfig(horizon_steps=100, max_iter=3))
    return problem, solver


class _SolveFn:
    def __init__(self, problem, solver):
        self.problem = problem
        self.solver = solver
        self.us = jnp.zeros((solver.config.horizon_steps, 1))

    def __call__(self, t, x):
        res = self.solver.solve(t, jnp.asarray(x), self.us)
        self.us = shift_warm_start(self.problem, t + self.problem.dt, res.us)
        return (np.asarray(res.us[0]), np.asarray(res.Ks[0]),
                np.asarray(res.xs[0]))


def test_virtual_time_swingup():
    problem, solver = _make_solver()
    ex = MpcExecutor(nx=4, nu=1, sim_dt=0.002, mpc_dt=0.004)
    ex.set_cartpole_plant(x0=[0.0, np.pi, 0.0, 0.0], m1=1.0, m2=0.5, l=2.0)
    ex.set_input_limits(-100.0, 100.0)
    log, stats = ex.run(_SolveFn(problem, solver), duration=6.0,
                        realtime=False)
    # 6 s / 0.002 s = 3000 control steps, MPC every 2nd -> 1500 solves
    assert stats.n_solves == pytest.approx(1500, rel=0.01)
    x = ex.state()
    theta_err = abs(((x[1] + np.pi) % (2 * np.pi)) - np.pi)
    assert theta_err < 0.2, f"pole not upright: {x}"
    assert abs(x[3]) < 0.5
    assert log.ts.shape[0] == 3000
    assert np.all(np.isfinite(log.xs))
    assert stats.p99_ms > 0


def test_realtime_mode_runs():
    """Threaded wall-clock mode: short run, sane stats, no crash."""
    problem, solver = _make_solver()
    fn = _SolveFn(problem, solver)
    fn(0.0, np.array([0.0, np.pi, 0.0, 0.0]))  # warm up jit outside the loop
    fn.us = fn.us * 0
    ex = MpcExecutor(nx=4, nu=1, sim_dt=0.002, mpc_dt=0.05)
    ex.set_cartpole_plant(x0=[0.0, np.pi, 0.0, 0.0])
    log, stats = ex.run(fn, duration=1.0, realtime=True)
    assert stats.n_solves >= 3
    assert log.ts.shape[0] > 100
    assert np.all(np.isfinite(log.xs))


def test_solve_error_propagates():
    ex = MpcExecutor(nx=4, nu=1)
    ex.set_cartpole_plant(x0=[0.0, np.pi, 0.0, 0.0])

    def bad_solve(t, x):
        raise ValueError("boom")

    with pytest.raises(RuntimeError):
        ex.run(bad_solve, duration=0.1, realtime=False)
