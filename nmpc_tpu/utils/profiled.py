"""Profiled solve mode: real per-phase durations for the trace dumps.

The reference times every phase with ``std::chrono`` inside the solver loop
(``DDPSolver::ComputationDuration``, ``DDPSolver.h:219-247``; TraceData
duration columns, ``DDPSolver.h:179-216``; FMPC ``FmpcSolver.h:254-288``).
Under XLA the production solve is ONE fused device computation — there is
nothing to put a host timer around inside it, which is why the fast path
dumps zeros for the phase columns.

This module provides the opt-in equivalent: it re-runs the solver's exact
iteration logic as a host-level loop over separately-jitted stage functions
(derivative sweep / backward / forward for DDP; coeff+KKT / backward /
forward / update for FMPC), fencing and timing each stage.  The stage
functions are the *same* jitted internals the fused solver traces, and the
host replicates the accept/reject logic on fetched scalars, so the profiled
result matches the fused result (tested) — at the cost of one host↔device
round trip per stage, which is exactly the price of observability.

Each stage is warmed up once before timing so the reported milliseconds are
steady-state device times, not compilation.

The reference's backward sub-split (Q / reg / gain, ``DDPSolver.h:239-247``)
cannot be measured inside the fused backward scan; :func:`estimate_backward_split`
times the three kernel families (Q-expansion GEMM chain, regularize+Cholesky,
gain triangular solves) at the solve's exact shapes instead — a
shape-representative decomposition of where the backward time goes.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from nmpc_tpu.core.types import (
    DDPResult,
    DDPStatus,
    DDPTrace,
    FmpcResult,
    FmpcStatus,
    FmpcTrace,
    FmpcVariable,
)
from nmpc_tpu.utils.timing import ComputationDuration


def _timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return out, 1e3 * (time.perf_counter() - t0)


def profiled_solve_ddp(solver, t0, x0, us_init):
    """One DDP solve with per-iteration phase timing.

    Returns ``(DDPResult, durations, ComputationDuration)`` where
    ``durations`` maps ``{"derivative", "backward", "forward"}`` to
    per-trace-row millisecond arrays (row 0 = 0, like the reference's
    first TraceData row) ready for ``dump_ddp_trace(durations=...)``.
    """
    from nmpc_tpu.solvers import ddp as D

    problem, config = solver.problem, solver.config
    dtype = x0.dtype
    n_trace = config.max_iter + 1
    alphas = np.asarray(config.alpha_list, dtype)

    rollout = jax.jit(functools.partial(D._rollout, problem, config))
    sweep = jax.jit(functools.partial(D._derivative_sweep, problem, config))
    backward = jax.jit(functools.partial(D._backward_with_retry, problem,
                                         config))
    forward = jax.jit(functools.partial(D._forward_all_alphas, problem,
                                        config))

    sw_total = time.perf_counter()
    (xs, costs), setup_ms = _timed(rollout, t0, x0, us_init)
    us = us_init
    lam = jnp.asarray(config.initial_lambda, dtype)
    dlam = jnp.asarray(config.initial_dlambda, dtype)
    nx, nu = problem.state_dim, problem.input_dim
    N = config.horizon_steps
    ks = jnp.zeros((N, nu), dtype)
    Ks = jnp.zeros((N, nu, nx), dtype)

    # stage warm-up (compile) — excluded from the timings below
    _ = jax.block_until_ready(sweep(t0, xs, us))
    Dw, VxTw, VxxTw = _
    _ = jax.block_until_ready(backward(Dw, VxTw, VxxTw, lam, dlam, ks, Ks))
    _ = jax.block_until_ready(forward(t0, xs, us, ks, Ks))

    dur = {k: np.zeros(n_trace) for k in ("derivative", "backward", "forward")}
    tr = {
        "cost": np.zeros(n_trace), "lam": np.zeros(n_trace),
        "dlam": np.zeros(n_trace), "alpha": np.zeros(n_trace),
        "k_rel_norm": np.zeros(n_trace),
        "cost_update_actual": np.zeros(n_trace),
        "cost_update_expected": np.zeros(n_trace),
        "cost_update_ratio": np.zeros(n_trace),
    }
    tr["cost"][0] = float(jnp.sum(costs))
    tr["lam"][0] = config.initial_lambda
    tr["dlam"][0] = config.initial_dlambda

    status = int(DDPStatus.RUNNING)
    it = 0
    while status == DDPStatus.RUNNING:
        it += 1

        (Dst, Vx_T, Vxx_T), dur_d = _timed(sweep, t0, xs, us)
        dur["derivative"][it] = dur_d

        (lam, dlam, ks_n, Ks_n, dV, bw_ok, bw_failed), dur_b = _timed(
            backward, Dst, Vx_T, Vxx_T, lam, dlam, ks, Ks)
        dur["backward"][it] = dur_b
        ks, Ks = ks_n, Ks_n
        if bool(bw_failed):
            status = int(DDPStatus.FAIL_BACKWARD_LAMBDA)

        k_rel_norm = float(jnp.max(
            jnp.linalg.norm(ks, axis=-1)
            / (jnp.linalg.norm(us, axis=-1) + 1.0)))
        tr["k_rel_norm"][it] = k_rel_norm if not bool(bw_failed) else 0.0
        if (status == DDPStatus.RUNNING
                and k_rel_norm < config.k_rel_norm_thre
                and float(lam) < config.lambda_thre):
            status = int(DDPStatus.SUCCEEDED)

        if status == DDPStatus.RUNNING:
            (cand_xs, cand_us, cand_costs), dur_f = _timed(
                forward, t0, xs, us, ks, Ks)
            dur["forward"][it] = dur_f

            cost_old = float(jnp.sum(costs))
            cand_sums = np.asarray(jnp.sum(cand_costs, axis=-1))
            actual = cost_old - cand_sums
            dV_np = np.asarray(dV)
            expected = -alphas * (dV_np[0] + alphas * dV_np[1])
            ratio = np.where(expected < 0,
                             np.where(actual >= 0, 1.0, -1.0),
                             actual / expected)
            accept_mask = ratio > config.cost_update_ratio_thre
            fw_success = bool(np.any(accept_mask))
            idx = int(np.argmax(accept_mask)) if fw_success else len(alphas) - 1

            if fw_success:
                xs, us, costs = cand_xs[idx], cand_us[idx], cand_costs[idx]
                if actual[idx] < config.cost_update_thre:
                    status = int(DDPStatus.SUCCEEDED)
                dlam = jnp.minimum(dlam / config.lambda_factor,
                                   1.0 / config.lambda_factor)
                lam = jnp.where(lam >= config.lambda_min,
                                lam * dlam, jnp.zeros_like(lam))
            else:
                dlam = jnp.maximum(dlam * config.lambda_factor,
                                   config.lambda_factor)
                lam = jnp.maximum(lam * dlam, config.lambda_min)
                if float(lam) > config.lambda_max:
                    status = int(DDPStatus.FAIL_FORWARD_LAMBDA)

            tr["cost"][it] = float(jnp.sum(costs))
            tr["lam"][it] = float(lam)
            tr["dlam"][it] = float(dlam)
            tr["alpha"][it] = alphas[idx]
            tr["cost_update_actual"][it] = actual[idx]
            tr["cost_update_expected"][it] = expected[idx]
            tr["cost_update_ratio"][it] = ratio[idx]

        if status == DDPStatus.RUNNING and it >= config.max_iter:
            status = int(DDPStatus.MAX_ITER_REACHED)

    solve_ms = 1e3 * (time.perf_counter() - sw_total)
    cd = ComputationDuration(
        solve=solve_ms,
        setup=setup_ms,
        opt=float(sum(dur[k].sum() for k in dur)),
        derivative=float(dur["derivative"].sum()),
        backward=float(dur["backward"].sum()),
        forward=float(dur["forward"].sum()),
    )

    result = DDPResult(
        status=jnp.int32(status),
        success=jnp.bool_(status == DDPStatus.SUCCEEDED),
        iters=jnp.int32(it),
        xs=xs, us=us, costs=costs, ks=ks, Ks=Ks, lam=lam, dlam=dlam,
        trace=DDPTrace(
            iter=jnp.arange(n_trace, dtype=jnp.int32),
            cost=jnp.asarray(tr["cost"], dtype),
            lam=jnp.asarray(tr["lam"], dtype),
            dlam=jnp.asarray(tr["dlam"], dtype),
            alpha=jnp.asarray(tr["alpha"], dtype),
            k_rel_norm=jnp.asarray(tr["k_rel_norm"], dtype),
            cost_update_actual=jnp.asarray(tr["cost_update_actual"], dtype),
            cost_update_expected=jnp.asarray(tr["cost_update_expected"], dtype),
            cost_update_ratio=jnp.asarray(tr["cost_update_ratio"], dtype),
        ),
    )
    return result, dur, cd


def estimate_backward_split(solver, t0, x0, us, reps: int = 8):
    """Shape-representative (Q, reg, gain) millisecond split of one backward
    pass (the reference's ``DDPSolver.h:239-247`` sub-timers).

    Times three jitted sweeps over all N stages at the solve's exact
    shapes: the Q-expansion GEMM chain, regularization + Cholesky
    factorization, and the gain triangular solves.  The recursion coupling
    (V flowing between stages) is not timed — it is fused with the Q GEMMs
    on device — so treat this as "where the backward flops live", which is
    what the reference's numbers communicate.
    """
    from nmpc_tpu.solvers import ddp as D
    from nmpc_tpu.kernels.linalg import cho_solve_small, cholesky_small

    problem, config = solver.problem, solver.config
    dtype = x0.dtype
    xs, costs = D._rollout(problem, config, t0, x0, us)
    Dst, Vx_T, Vxx_T = D._derivative_sweep(problem, config, t0, xs, us)
    lam = jnp.asarray(config.initial_lambda, dtype)

    def q_sweep(Dst, Vx, Vxx):
        def one(d):
            Qu = d.Lu + d.Fu.T @ Vx
            Qx = d.Lx + d.Fx.T @ Vx
            Qux = d.Lxu.T + d.Fu.T @ Vxx @ d.Fx
            Quu = d.Luu + d.Fu.T @ Vxx @ d.Fu
            Qxx = d.Lxx + d.Fx.T @ Vxx @ d.Fx
            return Qu, Qx, Qux, Quu, Qxx
        return jax.vmap(one)(Dst)

    def reg_sweep(Quu, lam):
        nu = Quu.shape[-1]
        Quu_F = Quu + lam * jnp.eye(nu, dtype=dtype)[None]
        return jax.vmap(cholesky_small)(Quu_F)

    def gain_sweep(L, Qu, Qux):
        k = -jax.vmap(cho_solve_small)(L, Qu)
        K = -jax.vmap(cho_solve_small)(L, Qux)
        return k, K

    q_j = jax.jit(q_sweep)
    r_j = jax.jit(reg_sweep)
    g_j = jax.jit(gain_sweep)

    Qu, Qx, Qux, Quu, Qxx = jax.block_until_ready(q_j(Dst, Vx_T, Vxx_T))
    L, _ = jax.block_until_ready(r_j(Quu, lam))
    _ = jax.block_until_ready(g_j(L, Qu, Qux))

    def best_of(fn, *args):
        ts = []
        for _ in range(reps):
            t0_ = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(1e3 * (time.perf_counter() - t0_))
        return min(ts)

    return {
        "Q": best_of(q_j, Dst, Vx_T, Vxx_T),
        "reg": best_of(r_j, Quu, lam),
        "gain": best_of(g_j, L, Qu, Qux),
    }


def profiled_solve_fmpc(solver, t0, x0, variable, barrier_eps=1e-4):
    """One FMPC solve with per-iteration phase timing (coeff / backward /
    forward / update, the reference's ``FmpcSolver.h:254-288`` split).

    Returns ``(FmpcResult, durations)`` with per-trace-row millisecond
    arrays for ``dump_fmpc_trace(durations=...)``.
    """
    from nmpc_tpu.solvers import fmpc as F

    problem, config = solver.problem, solver.config
    dtype = x0.dtype
    t0 = jnp.asarray(t0, dtype)
    N = config.horizon_steps
    dt = problem.dt
    n_trace = config.max_iter + 1

    ts = t0 + dt * jnp.arange(N, dtype=dtype)
    gms = jax.vmap(lambda t: problem.ineq_mask_at(t).astype(dtype))(ts)
    n_active = jnp.maximum(jnp.sum(gms), 1.0)

    def check_fn(var, eps):
        if config.update_barrier_eps:
            s_nu_ave = jnp.sum(var.ss * var.nus * gms) / n_active
            eps = jnp.clip(F._SIGMA * s_nu_ave, F._BARRIER_EPS_MIN,
                           F._BARRIER_EPS_MAX)
        co = F._coeffs(problem, config, t0, x0, var)
        kkt = F._kkt_error(x0, var, co, jnp.zeros((), dtype))
        return co, kkt, eps

    check = jax.jit(check_fn)
    backward = jax.jit(functools.partial(F._backward, problem, config))
    forward = jax.jit(functools.partial(F._forward, problem, config))
    update = jax.jit(functools.partial(F._update, problem, config, t0, x0))

    var = variable
    eps = jnp.asarray(barrier_eps, dtype)
    if config.init_complementary_variable:
        margin, cmin = 1e-2, 1e-2
        eps = jnp.asarray(F._BARRIER_EPS_INIT, dtype)
        g0 = jax.vmap(problem.ineq_const)(ts, var.xs[:-1], var.us)
        ss = (1.0 + margin) * jnp.maximum(-g0, cmin)
        nus = (1.0 + margin) * jnp.maximum(eps / ss, cmin)
        var = FmpcVariable(var.xs, var.us, var.lambdas, ss, nus)
    var = FmpcVariable(
        xs=var.xs, us=var.us, lambdas=var.lambdas,
        ss=jnp.where(gms > 0, var.ss, 1.0),
        nus=jnp.where(gms > 0, var.nus, 0.0),
    )

    dur = {k: np.zeros(n_trace)
           for k in ("coeff", "backward", "forward", "update")}
    trace_kkt = np.zeros(n_trace)

    # warm-up (compile)
    co_w, kkt_w, eps_w = jax.block_until_ready(check(var, eps))
    bw_w = jax.block_until_ready(backward(co_w, var, eps_w))
    fw_w = jax.block_until_ready(forward(co_w, var, x0, *bw_w[:4], eps_w))
    _ = jax.block_until_ready(update(co_w, var, fw_w[0], eps_w))

    nu_dim, nx = problem.input_dim, problem.state_dim
    ks = jnp.zeros((N, nu_dim), dtype)
    Ks = jnp.zeros((N, nu_dim, nx), dtype)
    kkt = float("inf")
    status = int(FmpcStatus.ITERATION_CONTINUED)
    iters = 0
    steps = 0

    (co, kkt_j, eps), dur_c = _timed(check, var, eps)
    dur["coeff"][1] = dur_c
    kkt = float(kkt_j)
    iters = 1
    trace_kkt[1] = kkt
    if kkt <= config.kkt_error_thre:
        status = int(FmpcStatus.SUCCEEDED)

    while status == FmpcStatus.ITERATION_CONTINUED and steps < config.max_iter:
        steps += 1
        (ks_n, Ks_n, ss_vec, Ps, bw_ok, bw_finite), dur_b = _timed(
            backward, co, var, eps)
        dur["backward"][steps] += dur_b
        bw_good = bool(bw_ok) and bool(bw_finite)
        if bw_good:
            ks, Ks = ks_n, Ks_n

        (delta, fw_finite), dur_f = _timed(forward, co, var, x0,
                                           ks_n, Ks_n, ss_vec, Ps, eps)
        dur["forward"][steps] += dur_f

        (new_var, up_ok), dur_u = _timed(update, co, var, delta, eps)
        dur["update"][steps] += dur_u

        if not up_ok:
            status = int(FmpcStatus.ERROR_IN_UPDATE)
        if not bool(fw_finite):
            status = int(FmpcStatus.ERROR_IN_FORWARD)
        if not bw_good:
            status = int(FmpcStatus.ERROR_IN_BACKWARD)
        if status != FmpcStatus.ITERATION_CONTINUED:
            break
        var = new_var

        if iters < config.max_iter:
            (co, kkt_j, eps), dur_c = _timed(check, var, eps)
            iters += 1
            dur["coeff"][iters] = dur_c
            kkt = float(kkt_j)
            trace_kkt[iters] = kkt
            if kkt <= config.kkt_error_thre:
                status = int(FmpcStatus.SUCCEEDED)

    if status == FmpcStatus.ITERATION_CONTINUED:
        status = int(FmpcStatus.MAX_ITERATION_REACHED)

    result = FmpcResult(
        status=jnp.int32(status),
        iters=jnp.int32(iters),
        variable=var,
        kkt_error=jnp.asarray(kkt, dtype),
        ks=ks, Ks=Ks,
        barrier_eps=eps,
        trace=FmpcTrace(
            iter=jnp.arange(n_trace, dtype=jnp.int32),
            kkt_error=jnp.asarray(trace_kkt, dtype),
        ),
    )
    return result, dur
