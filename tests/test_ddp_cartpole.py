"""DDP solver tests: golden parity, derivative checks, batch consistency.

Mirrors the reference test strategy (SURVEY.md §4): derivative cross-checks
(``TestDDPCartPole.cpp:609-649``), golden-value parity, and closed-loop MPC
convergence (``TestDDPCartPole.cpp:350-354``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nmpc_tpu import DDPConfig, DDPSolver, DDPStatus
from nmpc_tpu.models.cartpole import CartPoleParam, cartpole_xdot, make_cartpole_problem

from golden.cartpole_numpy import CartPoleGolden
from golden.ddp_numpy import GoldenConfig, GoldenDDP

DT = 0.01
HORIZON = 100


def _solvers(max_iter=500):
    problem = make_cartpole_problem(DT)
    config = DDPConfig(horizon_steps=HORIZON, max_iter=max_iter)
    solver = DDPSolver(problem, config)
    golden = GoldenDDP(CartPoleGolden(DT), GoldenConfig(horizon_steps=HORIZON,
                                                        max_iter=max_iter))
    return solver, golden


def test_autodiff_matches_analytic_derivatives():
    """Autodiff Fx/Fu vs the hand-derived analytic Jacobians (reference
    cross-check pattern, tol 1e-6 — here fp64 so much tighter)."""
    problem = make_cartpole_problem(DT)
    gp = CartPoleGolden(DT)
    x = jnp.array([1.0, -2.0, 3.0, -4.0])
    u = jnp.array([10.0])
    Fx, Fu = problem.linearize_dynamics(0.0, x, u)
    Fx_g, Fu_g = gp.fx_fu(0.0, np.asarray(x), np.asarray(u))
    np.testing.assert_allclose(np.asarray(Fx), Fx_g, atol=1e-10)
    np.testing.assert_allclose(np.asarray(Fu), Fu_g, atol=1e-10)
    Lx, Lu, Lxx, Luu, Lxu = problem.quadraticize_running_cost(0.0, x, u)
    Lx_g, Lu_g, Lxx_g, Luu_g, Lxu_g = gp.lderivs(0.0, np.asarray(x), np.asarray(u))
    np.testing.assert_allclose(np.asarray(Lx), Lx_g, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Luu), Luu_g, atol=1e-12)


def test_single_solve_matches_golden():
    """u-trajectory parity vs the independent NumPy fp64 DDP (BASELINE.md
    requires 1e-4; fp64-vs-fp64 we demand far tighter)."""
    solver, golden = _solvers(max_iter=50)
    x0 = jnp.array([0.0, np.pi, 0.0, 0.0])
    us0 = jnp.zeros((HORIZON, 1))
    res = solver.solve(0.0, x0, us0)
    gres = golden.solve(0.0, np.asarray(x0), np.zeros((HORIZON, 1)))
    assert gres["status"] == "succeeded"
    assert int(res.status) == DDPStatus.SUCCEEDED
    assert int(res.iters) == gres["iters"]
    np.testing.assert_allclose(np.asarray(res.us), gres["us"], atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.xs), gres["xs"], atol=1e-8)
    np.testing.assert_allclose(float(jnp.sum(res.costs)),
                               gres["costs"].sum(), rtol=1e-10)


def test_mpc_loop_matches_golden_and_converges():
    """A few receding-horizon steps track the golden solver exactly and the
    pole swings up (closed-loop pattern of TestDDPBipedal.cpp:243-267)."""
    solver, golden = _solvers(max_iter=10)
    x = jnp.array([0.0, np.pi, 0.0, 0.0])
    xg = np.asarray(x).copy()
    us = jnp.zeros((HORIZON, 1))
    usg = np.zeros((HORIZON, 1))
    gp = CartPoleGolden(DT)
    t = 0.0
    for step in range(5):
        res = solver.solve(t, x, us)
        gres = golden.solve(t, xg, usg)
        np.testing.assert_allclose(np.asarray(res.us), gres["us"], atol=1e-7)
        u = res.us[0]
        x = solver.problem.dynamics(t, x, u)
        xg = gp.dynamics(t, xg, np.asarray(u))
        us = jnp.concatenate([res.us[1:], res.us[-1:]])
        usg = np.concatenate([gres["us"][1:], gres["us"][-1:]])
        t += DT
        np.testing.assert_allclose(np.asarray(x), xg, atol=1e-7)


def test_swingup_closed_loop():
    """Full swing-up: after 10 s of MPC the pole is upright
    (|theta| < 1e-1, |omega| < 1e-1 — TestDDPCartPole.cpp:350-354)."""
    problem = make_cartpole_problem(DT)
    config = DDPConfig(horizon_steps=200, max_iter=3)
    solver = DDPSolver(problem, config)
    x = jnp.array([0.0, np.pi, 0.0, 0.0])
    us = jnp.zeros((200, 1))
    t = 0.0
    mpc_dt = DT  # solve every plant step
    for step in range(1000):
        res = solver.solve(t, x, us)
        u = res.us[0]
        x = problem.dynamics(t, x, u)
        us = jnp.concatenate([res.us[1:], res.us[-1:]])
        t += mpc_dt
    x = np.asarray(x)
    assert abs(x[0]) < 1.0
    assert abs(((x[1] + np.pi) % (2 * np.pi)) - np.pi) < 1e-1  # theta ~ 0 mod 2pi
    assert abs(x[2]) < 1.0
    assert abs(x[3]) < 1e-1


def test_batch_matches_single():
    """vmapped solves terminate per-lane identically to individual solves."""
    solver, _ = _solvers(max_iter=20)
    rng = np.random.default_rng(0)
    x0s = jnp.array([[0.0, np.pi, 0.0, 0.0],
                     [0.5, np.pi - 0.3, 0.1, -0.1],
                     [-0.2, np.pi + 0.5, -0.3, 0.2]])
    us0 = jnp.zeros((3, HORIZON, 1))
    batch = solver.solve_batch(0.0, x0s, us0)
    for i in range(3):
        single = solver.solve(0.0, x0s[i], us0[i])
        assert int(batch.status[i]) == int(single.status)
        assert int(batch.iters[i]) == int(single.iters)
        np.testing.assert_allclose(np.asarray(batch.us[i]),
                                   np.asarray(single.us), atol=1e-9)


def test_trace_schema():
    solver, golden = _solvers(max_iter=20)
    x0 = jnp.array([0.0, np.pi, 0.0, 0.0])
    res = solver.solve(0.0, x0, jnp.zeros((HORIZON, 1)))
    tr = res.trace
    it = int(res.iters)
    # row 0 is the initial rollout (DDPSolver.hpp:97-104)
    assert float(tr.lam[0]) == pytest.approx(1e-4)
    assert float(tr.cost[0]) > 0
    # iterations monotone cost decrease on accepted rows
    costs = np.asarray(tr.cost[: it + 1])
    assert costs[-1] <= costs[0]


def test_trace_rows_match_golden():
    """Per-iteration trace parity vs golden: cost, lambda, dlambda, alpha
    sequences (the reference's TraceData rows, DDPSolver.h:179-216)."""
    solver, golden = _solvers(max_iter=30)
    x0 = jnp.array([0.0, np.pi, 0.0, 0.0])
    res = solver.solve(0.0, x0, jnp.zeros((HORIZON, 1)))
    gres = golden.solve(0.0, np.asarray(x0), np.zeros((HORIZON, 1)))
    tr = res.trace
    for row in gres["trace"]:
        i = row["iter"]
        if "cost" in row:
            np.testing.assert_allclose(float(tr.cost[i]), row["cost"],
                                       rtol=1e-10, err_msg=f"iter {i} cost")
        if "lam" in row:
            np.testing.assert_allclose(float(tr.lam[i]), row["lam"],
                                       rtol=1e-10, err_msg=f"iter {i} lam")
        if "dlam" in row:
            np.testing.assert_allclose(float(tr.dlam[i]), row["dlam"],
                                       rtol=1e-10, err_msg=f"iter {i} dlam")
        if "alpha" in row:
            np.testing.assert_allclose(float(tr.alpha[i]), row["alpha"],
                                       rtol=1e-12, err_msg=f"iter {i} alpha")
    # stacked batch path produces identical trace rows
    res_b = solver.solve_batch(0.0, x0[None], jnp.zeros((1, HORIZON, 1)))
    n = int(res.iters) + 1
    np.testing.assert_allclose(np.asarray(res_b.trace.cost[0][:n]),
                               np.asarray(tr.cost[:n]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(res_b.trace.lam[0][:n]),
                               np.asarray(tr.lam[:n]), atol=1e-12)
