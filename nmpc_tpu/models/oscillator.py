"""Van der Pol oscillator FMPC problem (2 states, 1 input, 3 inequalities).

Same family as the reference's FMPC oscillator example
(``nmpc_fmpc/tests/src/TestFmpcOscillator.cpp:18-135``; see
https://web.casadi.org/docs/#a-simple-test-problem): state/input constrained
stabilization with g = [-x1 - 0.05, -u - 1, u - 0.9] <= 0.
"""

from __future__ import annotations

import jax.numpy as jnp

from nmpc_tpu.core.problem import Problem


def make_oscillator_problem(dt: float) -> Problem:
    def dynamics(t, x, u):
        xdot0 = (1.0 - x[1] ** 2) * x[0] - x[1] + u[0]
        return x + dt * jnp.stack([xdot0, x[0]])

    def running_cost(t, x, u):
        return 0.5 * (jnp.sum(x**2) + jnp.sum(u**2))

    def terminal_cost(t, x):
        return jnp.zeros((), x.dtype)

    def ineq_const(t, x, u):
        return jnp.stack([-x[1] - 0.05, -u[0] - 1.0, u[0] - 0.9])

    return Problem(
        dt=dt,
        state_dim=2,
        input_dim=1,
        ineq_dim=3,
        dynamics=dynamics,
        running_cost=running_cost,
        terminal_cost=terminal_cost,
        ineq_const=ineq_const,
    )
