"""FMPC solver tests: golden parity, closed-loop constraint satisfaction.

Mirrors the reference FMPC test strategy: derivative checks + closed-loop MPC
with per-step inequality satisfaction (``TestFmpcOscillator.cpp:166-199``)
and cart-pole with force/position constraints (``TestFmpcCartPole.cpp``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nmpc_tpu.core.types import FmpcConfig, FmpcStatus, FmpcVariable, fmpc_variable_reset
from nmpc_tpu.solvers.fmpc import FmpcSolver
from nmpc_tpu.models.oscillator import make_oscillator_problem
from nmpc_tpu.models.cartpole import make_cartpole_fmpc_problem

from golden.fmpc_numpy import GoldenFmpc, GoldenFmpcConfig, OscillatorGolden

DT = 0.01


def _variable_np(var: FmpcVariable):
    return dict(xs=np.asarray(var.xs), us=np.asarray(var.us),
                lambdas=np.asarray(var.lambdas), ss=np.asarray(var.ss),
                nus=np.asarray(var.nus))


def test_oscillator_single_solve_matches_golden():
    N = 100
    problem = make_oscillator_problem(DT)
    solver = FmpcSolver(problem, FmpcConfig(horizon_steps=N, max_iter=10))
    golden = GoldenFmpc(OscillatorGolden(DT),
                        GoldenFmpcConfig(horizon_steps=N, max_iter=10))

    var = fmpc_variable_reset(N, 2, 1, 3, s=1.0, nu_=1.0)
    x0 = jnp.array([0.0, 1.0])
    res = solver.solve(0.0, x0, var)
    gres = golden.solve(0.0, np.asarray(x0), _variable_np(var))

    assert int(res.iters) == gres["iters"]
    assert int(res.status) == gres["status"]
    np.testing.assert_allclose(np.asarray(res.variable.us), gres["us"], atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.variable.xs), gres["xs"], atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.variable.ss), gres["ss"], atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.variable.nus), gres["nus"], atol=1e-8)
    np.testing.assert_allclose(float(res.barrier_eps), gres["barrier_eps"],
                               rtol=1e-10)
    kkt_g = np.asarray(gres["kkt_trace"])
    kkt_j = np.asarray(res.trace.kkt_error[1:len(kkt_g) + 1])
    np.testing.assert_allclose(kkt_j, kkt_g, rtol=1e-8)


def test_oscillator_mpc_constraint_satisfaction():
    """Closed-loop: status in {Succeeded, MaxIterationReached}, g <= 0 every
    step, final |x| < 1e-2 (``TestFmpcOscillator.cpp:166-199``)."""
    N = 400
    sim_dt = 0.005
    end_t = 10.0
    problem = make_oscillator_problem(DT)
    solver = FmpcSolver(problem, FmpcConfig(horizon_steps=N, max_iter=3))

    def sim_step(t, x, u, h):
        xdot0 = (1.0 - x[1] ** 2) * x[0] - x[1] + u[0]
        return x + h * jnp.stack([xdot0, x[0]])

    var = fmpc_variable_reset(N, 2, 1, 3, s=1.0, nu_=1.0)
    x = jnp.array([0.0, 1.0])
    t = 0.0
    eps = 1e-4
    while t < end_t:
        res = solver.solve(t, x, var, eps)
        assert int(res.status) in (FmpcStatus.SUCCEEDED,
                                   FmpcStatus.MAX_ITERATION_REACHED)
        u = res.variable.us[0]
        g = problem.ineq_const(t, x, u)
        assert bool(jnp.all(g <= 1e-10)), f"t={t}: constraint violated {g}"
        x = sim_step(t, x, u, sim_dt)
        t += sim_dt
        var = res.variable
        eps = res.barrier_eps
    assert abs(float(x[0])) < 1e-2
    assert abs(float(x[1])) < 1e-2


def test_cartpole_fmpc_swingup():
    """Cart-pole FMPC swing-up with force/position constraints; force stays
    within +-15 N (``TestFmpcCartPole.cpp:118-131``), pole ends upright."""
    N = 200
    problem = make_cartpole_fmpc_problem(DT)
    solver = FmpcSolver(problem, FmpcConfig(horizon_steps=N, max_iter=5))
    var = fmpc_variable_reset(N, 4, 1, 4, s=1.0, nu_=1.0)
    x = jnp.array([0.0, np.pi, 0.0, 0.0])
    t = 0.0
    eps = 1e-4
    forces = []
    for _ in range(1000):
        res = solver.solve(t, x, var, eps)
        u = res.variable.us[0]
        forces.append(float(u[0]))
        x = problem.dynamics(t, x, u)
        t += DT
        var = res.variable
        eps = res.barrier_eps
    forces = np.asarray(forces)
    assert forces.min() >= -15.0 - 1e-6
    assert forces.max() <= 15.0 + 1e-6
    xf = np.asarray(x)
    assert abs(((xf[1] + np.pi) % (2 * np.pi)) - np.pi) < 1e-1
    assert abs(xf[3]) < 1e-1


def test_batch_matches_single():
    N = 50
    problem = make_oscillator_problem(DT)
    solver = FmpcSolver(problem, FmpcConfig(horizon_steps=N, max_iter=5))
    B = 3
    x0s = jnp.asarray(np.array([[0.0, 1.0], [0.2, 0.8], [-0.1, 0.9]]))
    var1 = fmpc_variable_reset(N, 2, 1, 3)
    vars_b = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), var1)
    epss = jnp.full((B,), 1e-4)
    batch = solver.solve_batch(0.0, x0s, vars_b, epss)
    for i in range(B):
        single = solver.solve(0.0, x0s[i], var1)
        assert int(batch.status[i]) == int(single.status)
        np.testing.assert_allclose(np.asarray(batch.variable.us[i]),
                                   np.asarray(single.variable.us), atol=1e-9)


def test_line_search_mode_runs():
    """enable_line_search exercises the l1-merit Armijo path
    (``FmpcSolver.hpp:752-793``)."""
    N = 50
    problem = make_oscillator_problem(DT)
    solver = FmpcSolver(problem, FmpcConfig(horizon_steps=N, max_iter=5,
                                            enable_line_search=True))
    var = fmpc_variable_reset(N, 2, 1, 3)
    res = solver.solve(0.0, jnp.array([0.0, 1.0]), var)
    assert int(res.status) in (FmpcStatus.SUCCEEDED,
                               FmpcStatus.MAX_ITERATION_REACHED)
    assert bool(jnp.all(jnp.isfinite(res.variable.us)))


def test_init_complementary_variable():
    """init_complementary_variable auto-initializes (s, nu)
    (``FmpcSolver.hpp:171-188``)."""
    N = 50
    problem = make_oscillator_problem(DT)
    solver = FmpcSolver(problem, FmpcConfig(horizon_steps=N, max_iter=5,
                                            init_complementary_variable=True))
    var = fmpc_variable_reset(N, 2, 1, 3, s=0.5, nu_=0.5)
    res = solver.solve(0.0, jnp.array([0.0, 1.0]), var)
    assert int(res.status) in (FmpcStatus.SUCCEEDED,
                               FmpcStatus.MAX_ITERATION_REACHED)


class _CartPoleFmpcGolden:
    """Cart-pole FMPC problem for the NumPy golden solver (analytic derivs
    reused from the DDP golden; constraints from TestFmpcCartPole.cpp:118-131)."""

    def __init__(self, dt, u_max=15.0, x_max=20.0):
        from golden.cartpole_numpy import CartPoleGolden
        self._cp = CartPoleGolden(dt)
        self.dt = dt
        self.u_max, self.x_max = u_max, x_max

    def dynamics(self, t, x, u):
        return self._cp.dynamics(t, x, u)

    def running_cost(self, t, x, u):
        return self._cp.running_cost(t, x, u)

    def terminal_cost(self, t, x):
        return self._cp.terminal_cost(t, x)

    def ineq(self, t, x, u):
        return np.array([-u[0] - self.u_max, u[0] - self.u_max,
                         -x[0] - self.x_max, x[0] - self.x_max])

    def fx_fu(self, t, x, u):
        return self._cp.fx_fu(t, x, u)

    def ineq_derivs(self, t, x, u):
        C = np.zeros((4, 4))
        C[2, 0] = -1.0
        C[3, 0] = 1.0
        D = np.array([[-1.0], [1.0], [0.0], [0.0]])
        return C, D

    def lderivs(self, t, x, u):
        return self._cp.lderivs(t, x, u)

    def vderivs(self, t, x):
        return self._cp.vderivs(t, x)


def test_cartpole_fmpc_matches_golden():
    """Cart-pole FMPC golden parity (second problem family through the
    independent NumPy PDIP implementation)."""
    N = 100
    problem = make_cartpole_fmpc_problem(DT)
    solver = FmpcSolver(problem, FmpcConfig(horizon_steps=N, max_iter=5))
    golden = GoldenFmpc(_CartPoleFmpcGolden(DT),
                        GoldenFmpcConfig(horizon_steps=N, max_iter=5))
    var = fmpc_variable_reset(N, 4, 1, 4, s=1.0, nu_=1.0)
    x0 = jnp.array([0.0, np.pi, 0.0, 0.0])
    res = solver.solve(0.0, x0, var)
    gres = golden.solve(0.0, np.asarray(x0), _variable_np(var))
    assert int(res.iters) == gres["iters"]
    np.testing.assert_allclose(np.asarray(res.variable.us), gres["us"],
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.variable.ss), gres["ss"],
                               atol=1e-7)
