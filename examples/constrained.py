"""Example: constrained NMPC with the FMPC (interior-point) solver.

Van der Pol oscillator with state + input constraints; every MPC step
satisfies g <= 0 strictly (interior-point, unlike clamping).

Run:  python examples/constrained.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp

from nmpc_tpu import FmpcConfig, FmpcSolver, FmpcStatus, fmpc_variable_reset
from nmpc_tpu.models.oscillator import make_oscillator_problem


def main():
    problem = make_oscillator_problem(dt=0.01)
    solver = FmpcSolver(problem, FmpcConfig(horizon_steps=200, max_iter=5))

    var = fmpc_variable_reset(200, 2, 1, 3)
    x = jnp.array([0.0, 1.0])
    t, eps = 0.0, 1e-4
    worst_g = -np.inf
    for step in range(400):
        res = solver.solve(t, x, var, eps)
        u = res.variable.us[0]
        g = problem.ineq_const(t, x, u)
        worst_g = max(worst_g, float(g.max()))
        x = problem.dynamics(t, x, u)
        t += 0.01
        var, eps = res.variable, res.barrier_eps
    print(f"final x = {np.round(np.asarray(x), 4)}, "
          f"worst constraint value over 4 s: {worst_g:+.2e} (feasible: "
          f"{worst_g <= 0})")


if __name__ == "__main__":
    main()
