"""Fully on-device closed-loop MPC simulation (batched).

The reference's MPC loops are host-side (``TestDDPBipedal.cpp:243-267``);
here the entire receding-horizon simulation — solve, apply u[0], plant step,
warm-start shift — compiles to one ``lax.scan`` program, so thousands of
closed-loop controllers run per chip with zero host round-trips.  This is
the workload behind the p99-latency benchmark (the reference's real-time
budget: 4 ms MPC tick for cart-pole, ``TestDDPCartPole.cpp:302-303``).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from nmpc_tpu.core.problem import Problem


class ClosedLoopLog(NamedTuple):
    ts: jnp.ndarray        # [S]
    xs: jnp.ndarray        # [S, nx] state before each step
    us: jnp.ndarray        # [S, nu] input applied
    iters: jnp.ndarray     # [S] solver iterations
    status: jnp.ndarray    # [S] solver status


def _tick_solver(solver):
    """Resolve the solver used inside the tick loop: warm-started MPC ticks
    are 1-3 iteration, latency-bound solves where the adaptive line
    search's lax.cond machinery is pure overhead (measured 2.8 ms vs
    1.15 ms p99 tick at 256 controllers) — so a DDP solver left on
    ls_mode="auto" is rebuilt with the always-2-scan "sweep" path.  An
    explicit ls_mode ("head"/"sweep") is respected."""
    config = getattr(solver, "config", None)
    if getattr(config, "ls_mode", None) == "auto":
        import dataclasses

        return type(solver)(solver.problem,
                            dataclasses.replace(config, ls_mode="sweep"))
    return solver


def make_closed_loop(solver, n_steps: int, sim_dynamics: Optional[Callable] = None,
                     mpc_interval: int = 1):
    """Build a jitted closed-loop simulator ``sim(t0, x0, us0) -> ClosedLoopLog``.

    ``sim_dynamics(t, x, u)`` defaults to the problem dynamics (one horizon
    dt per MPC step).  Batched via vmap over (x0, us0) automatically when
    inputs carry a leading batch axis (use :func:`make_closed_loop_batch`).
    """
    solver = _tick_solver(solver)
    problem: Problem = solver.problem
    dt = problem.dt
    if sim_dynamics is None:
        sim_dynamics = problem.dynamics

    def shift(t_next, us):
        last = us[-1]
        if problem.input_mask is not None:
            N = us.shape[0]
            t_term_new = t_next + N * dt
            m_new = problem.input_mask_at(t_term_new)
            m_old = problem.input_mask_at(t_term_new - dt)
            same = jnp.all(m_new == m_old)
            last = jnp.where(same, last * m_new, jnp.zeros_like(last))
        return jnp.concatenate([us[1:], last[None]], axis=0)

    def step(carry, i):
        t, x, us = carry
        res = solver.raw_solve(t, x, us)
        u = res.us[0]
        x_next = sim_dynamics(t, x, u)
        us_next = shift(t + dt, res.us)
        return (t + dt, x_next, us_next), (t, x, u, res.iters, res.status)

    def sim(t0, x0, us0):
        (_, _, _), (ts, xs, us, iters, status) = lax.scan(
            step, (jnp.asarray(t0, x0.dtype), x0, us0), jnp.arange(n_steps))
        return ClosedLoopLog(ts, xs, us, iters, status)

    return jax.jit(sim)


def make_closed_loop_batch(solver, n_steps: int,
                           sim_dynamics: Optional[Callable] = None):
    """Batched closed-loop simulator over a leading axis of (x0, us0).

    Uses the solver's natively-batched (stacked-kernel) solve path — a vmap
    of the single-instance loop would silently fall back to the slow
    batch-major layout (2.5x the tick latency at B=256)."""
    solver = _tick_solver(solver)
    problem: Problem = solver.problem
    dt = problem.dt
    if sim_dynamics is None:
        sim_dynamics = problem.dynamics
    v_dyn = jax.vmap(sim_dynamics, in_axes=(None, 0, 0))

    def shift_b(t_next, uss):
        last = uss[:, -1]
        if problem.input_mask is not None:
            N = uss.shape[1]
            t_term_new = t_next + N * dt
            m_new = problem.input_mask_at(t_term_new)
            m_old = problem.input_mask_at(t_term_new - dt)
            same = jnp.all(m_new == m_old)
            last = jnp.where(same, last * m_new[None, :],
                             jnp.zeros_like(last))
        return jnp.concatenate([uss[:, 1:], last[:, None]], axis=1)

    def step(carry, i):
        t, xs, uss = carry
        res = solver.raw_solve_batch(t, xs, uss)
        us0 = res.us[:, 0]
        xs_next = v_dyn(t, xs, us0)
        uss_next = shift_b(t + dt, res.us)
        return (t + dt, xs_next, uss_next), (t, xs, us0, res.iters, res.status)

    def sim(t0, x0s, us0s):
        (_, _, _), (ts, xs, us, iters, status) = lax.scan(
            step, (jnp.asarray(t0, x0s.dtype), x0s, us0s),
            jnp.arange(n_steps))
        # emit batch-leading logs [B, S, ...]
        mv = lambda a: jnp.moveaxis(a, 0, 1) if a.ndim > 1 else a
        return ClosedLoopLog(ts, mv(xs), mv(us), mv(iters), mv(status))

    return jax.jit(sim)
