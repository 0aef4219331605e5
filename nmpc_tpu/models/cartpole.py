"""Cart-pole swing-up problem family.

Same plant/cost family as the reference's DDP, FMPC, and C/GMRES cart-pole
examples (``nmpc_ddp/tests/src/TestDDPCartPole.cpp:28-234``,
``nmpc_fmpc/tests/src/TestFmpcCartPole.cpp:32-256``,
``nmpc_cgmres/tests/src/CartPoleProblem.h:11-205``).

State x = [pos, theta, vel, omega]; input u = [force].  theta = pi is the
hanging pose, theta = 0 upright.  Derivatives come from autodiff (the
reference hand-codes them; the derivative cross-check tests validate both).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp

from nmpc_tpu.core.problem import Problem

GRAVITY = 9.80665  # [m/s^2]


@dataclasses.dataclass(frozen=True)
class CartPoleParam:
    """Plant parameters (``TestDDPCartPole.cpp:33-38``)."""

    cart_mass: float = 1.0    # [kg]
    pole_mass: float = 0.5    # [kg]
    pole_length: float = 2.0  # [m]


@dataclasses.dataclass(frozen=True)
class CartPoleCostWeight:
    """Quadratic cost weights (``TestDDPCartPole.cpp:40-52``)."""

    running_x: tuple = (0.1, 1.0, 0.01, 0.1)
    running_u: tuple = (0.001,)
    terminal_x: tuple = (0.1, 1.0, 0.01, 0.1)


def cartpole_xdot(param: CartPoleParam, x, u):
    """Continuous dynamics (``TestDDPCartPole.cpp:68-98``)."""
    theta, vel, omega = x[1], x[2], x[3]
    f = u[0]
    m1, m2, l = param.cart_mass, param.pole_mass, param.pole_length
    s, c = jnp.sin(theta), jnp.cos(theta)
    denom = m1 + m2 * s**2
    acc = (f - m2 * l * omega**2 * s + m2 * GRAVITY * s * c) / denom
    ang_acc = (f * c - m2 * l * omega**2 * s * c + GRAVITY * (m1 + m2) * s) / (l * denom)
    return jnp.stack([vel, omega, acc, ang_acc])


def make_cartpole_problem(
    dt: float,
    ref_pos_func: Optional[Callable] = None,
    param: CartPoleParam = CartPoleParam(),
    cost_weight: CartPoleCostWeight = CartPoleCostWeight(),
    input_limits: Optional[tuple] = None,
) -> Problem:
    """Build the discrete-time cart-pole Problem (forward-Euler, like the
    reference's ``stateEq``: x + dt * xdot, ``TestDDPCartPole.cpp:97``).

    ``input_limits=(lo, hi)`` enables the boxed-DDP force bound, the
    reference uses +-15 N (``TestDDPCartPole.cpp:379-386``).
    """
    if ref_pos_func is None:
        ref_pos_func = lambda t: jnp.asarray(0.0)

    wrx = jnp.asarray(cost_weight.running_x)
    wru = jnp.asarray(cost_weight.running_u)
    wtx = jnp.asarray(cost_weight.terminal_x)

    def dynamics(t, x, u):
        return x + dt * cartpole_xdot(param, x, u)

    def ref_x(t):
        z = jnp.zeros(())
        return jnp.stack([jnp.asarray(ref_pos_func(t)), z, z, z])

    def running_cost(t, x, u):
        dx = x - ref_x(t).astype(x.dtype)
        return (0.5 * jnp.sum(wrx.astype(x.dtype) * dx**2)
                + 0.5 * jnp.sum(wru.astype(u.dtype) * u**2))

    def terminal_cost(t, x):
        dx = x - ref_x(t).astype(x.dtype)
        return 0.5 * jnp.sum(wtx.astype(x.dtype) * dx**2)

    limits_fn = None
    if input_limits is not None:
        lo, hi = input_limits
        limits_fn = lambda t: (jnp.full((1,), lo), jnp.full((1,), hi))

    return Problem(
        dt=dt,
        state_dim=4,
        input_dim=1,
        dynamics=dynamics,
        running_cost=running_cost,
        terminal_cost=terminal_cost,
        input_limits=limits_fn,
    )


def make_cartpole_fmpc_problem(
    dt: float,
    ref_pos_func: Optional[Callable] = None,
    param: CartPoleParam = CartPoleParam(),
    cost_weight: CartPoleCostWeight = CartPoleCostWeight(),
    u_max: float = 15.0,
    x_max: float = 20.0,
) -> Problem:
    """Cart-pole with force and cart-position inequality constraints,
    g = [-u + u_min, u - u_max, -x + x_min, x - x_max] <= 0
    (``nmpc_fmpc/tests/src/TestFmpcCartPole.cpp:118-131``)."""
    base = make_cartpole_problem(dt, ref_pos_func, param, cost_weight)

    def ineq_const(t, x, u):
        return jnp.stack([
            -u[0] - u_max,
            u[0] - u_max,
            -x[0] - x_max,
            x[0] - x_max,
        ])

    return Problem(
        dt=dt,
        state_dim=4,
        input_dim=1,
        ineq_dim=4,
        dynamics=base.dynamics,
        running_cost=base.running_cost,
        terminal_cost=base.terminal_cost,
        ineq_const=ineq_const,
    )
