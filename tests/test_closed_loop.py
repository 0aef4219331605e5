"""Fully-on-device closed-loop MPC tests."""

import jax.numpy as jnp
import numpy as np

from nmpc_tpu import DDPConfig, DDPSolver
from nmpc_tpu.models.cartpole import make_cartpole_problem
from nmpc_tpu.mpc.closed_loop import make_closed_loop, make_closed_loop_batch
from nmpc_tpu.mpc.driver import run_mpc


def test_closed_loop_matches_host_driver():
    """On-device lax.scan closed loop == host-side run_mpc loop."""
    problem = make_cartpole_problem(0.01)
    solver = DDPSolver(problem, DDPConfig(horizon_steps=40, max_iter=3))
    x0 = jnp.array([0.0, np.pi, 0.0, 0.0])
    us0 = jnp.zeros((40, 1))

    sim = make_closed_loop(solver, n_steps=25)
    log_dev = sim(0.0, x0, us0)

    log_host = run_mpc(solver, x0, t0=0.0, end_t=25 * 0.01, us_init=us0)
    np.testing.assert_allclose(np.asarray(log_dev.xs),
                               log_host.xs[:25], atol=1e-10)
    np.testing.assert_allclose(np.asarray(log_dev.us),
                               log_host.us[:25], atol=1e-10)


def test_closed_loop_batch():
    problem = make_cartpole_problem(0.01)
    solver = DDPSolver(problem, DDPConfig(horizon_steps=30, max_iter=3))
    B = 4
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.tile([0.0, np.pi, 0.0, 0.0], (B, 1))
                      + 0.05 * rng.normal(size=(B, 4)))
    us0 = jnp.zeros((B, 30, 1))
    sim_b = make_closed_loop_batch(solver, n_steps=10)
    log = sim_b(0.0, x0s, us0)
    assert log.xs.shape == (B, 10, 4)
    sim1 = make_closed_loop(solver, n_steps=10)
    log0 = sim1(0.0, x0s[0], us0[0])
    np.testing.assert_allclose(np.asarray(log.xs[0]), np.asarray(log0.xs),
                               atol=1e-12)
