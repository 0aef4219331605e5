"""Cart-pole C/GMRES problem, with optional input bound via dummy input.

Same family as the reference example
(``nmpc_cgmres/tests/src/CartPoleProblem.h:11-205``): continuous-time
cart-pole with quadratic tracking cost; with ``with_input_bound=True`` the
force bound |f| <= f_max is encoded as the equality
f^2 + f_dummy^2 - f_max^2 = 0 with multiplier mu, uc = (f, f_dummy, mu)
(``CartPoleProblem.h:177-188``).  Parameters (m1, m2, l, f_max) =
(1, 1, 1, 100), weights q = (10,100,1,10), r = (10, 0.01),
sf = (100,300,1,10) (``CartPoleProblem.h:44-55``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from nmpc_tpu.core.problem import ContinuousProblem

G = 9.80665
M1, M2, L, F_MAX = 1.0, 1.0, 1.0, 100.0
Q = (10.0, 100.0, 1.0, 10.0)
R = (10.0, 0.01)
SF = (100.0, 300.0, 1.0, 10.0)


def _xdot(t, x, u):
    theta, dx, dtheta = x[1], x[2], x[3]
    f = u[0]
    s, c = jnp.sin(theta), jnp.cos(theta)
    denom = M1 + M2 * s**2
    return jnp.stack([
        dx,
        dtheta,
        (f - M2 * L * dtheta**2 * s + M2 * G * s * c) / denom,
        (f * c - M2 * L * dtheta**2 * s * c + G * (M1 + M2) * s) / (L * denom),
    ])


def make_cartpole_cgmres_problem(
    with_input_bound: bool = False,
    ref_func: Optional[Callable] = None,
) -> ContinuousProblem:
    if ref_func is None:
        ref_func = lambda t: jnp.zeros(4)
    q = jnp.asarray(Q)
    sf = jnp.asarray(SF)

    if with_input_bound:
        dim_u, dim_c = 2, 1
        u_initial = jnp.asarray([0.0, 1.0, 0.01])

        def running_cost(t, x, uc):
            dx = x - ref_func(t).astype(x.dtype)
            return 0.5 * (jnp.sum(q.astype(x.dtype) * dx**2) + R[0] * uc[0] ** 2) - R[1] * uc[1]

        def eq_const(t, x, uc):
            return jnp.stack([uc[0] ** 2 + uc[1] ** 2 - F_MAX**2])
    else:
        dim_u, dim_c = 1, 0
        u_initial = jnp.asarray([0.0])

        def running_cost(t, x, uc):
            dx = x - ref_func(t).astype(x.dtype)
            return 0.5 * (jnp.sum(q.astype(x.dtype) * dx**2) + R[0] * uc[0] ** 2)

        eq_const = None

    def terminal_cost(t, x):
        dx = x - ref_func(t).astype(x.dtype)
        return 0.5 * jnp.sum(sf.astype(x.dtype) * dx**2)

    return ContinuousProblem(
        dim_x=4,
        dim_u=dim_u,
        dim_c=dim_c,
        state_eq=_xdot,
        running_cost=running_cost,
        terminal_cost=terminal_cost,
        eq_const=eq_const,
        x_initial=jnp.asarray([0.0, jnp.pi, 0.0, 0.0]),
        u_initial=u_initial,
    )
