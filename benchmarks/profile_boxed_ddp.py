"""Profile the boxed-DDP backward: where does the 9x vs unconstrained go?

VERDICT r2 item #4.  Measures, on real first-iteration derivative data from
the vertical-motion config (B=1024, N=100, the BENCH_RESULTS row):
  - unconstrained vs boxed backward time,
  - per-stage BoxQP while-loop trip counts (the global while_loop runs to
    the max over stages' lanes, so one slow lane stalls the whole batch),
  - boxed backward time under capped BoxQP iteration budgets.

Run: python benchmarks/profile_boxed_ddp.py
"""

import dataclasses
import functools
import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from nmpc_tpu import DDPConfig
from nmpc_tpu.core.types import BoxQPConfig
from nmpc_tpu.models.vertical import make_vertical_problem
from nmpc_tpu.solvers import ddp as Dmod
from nmpc_tpu.kernels.ddp_backward import (
    StackedBounds, StackedDerivs, backward_stacked, backward_stacked_boxed)


def main():
    from benchmarks.timing import device_time_min

    problem = make_vertical_problem(0.01)
    N, B = 100, 1024
    nu = problem.input_dim
    config = DDPConfig(horizon_steps=N, max_iter=3, initial_lambda=1e-6,
                       with_input_constraint=True)

    rng = np.random.default_rng(0)
    x0s = jnp.asarray((np.tile([1.2, 0.0], (B, 1))
                       + 0.05 * rng.normal(size=(B, 2))).astype(np.float32))
    us0 = jnp.zeros((B, N, nu), jnp.float32)
    t0 = jnp.float32(0.0)

    # real first-iteration stage data via the solver's own sweep
    from nmpc_tpu.kernels.lanes import block_lanes, lane_factors

    S, L = lane_factors(B)
    xs_l, _ = Dmod._rollout_lanes(problem, config, t0,
                                  block_lanes(x0s, 0, S, L),
                                  block_lanes(us0, 0, S, L))
    D, VxT, VxxT = Dmod._derivative_sweep_lanes(
        problem, config, t0, xs_l, block_lanes(us0, 0, S, L))
    flat = lambda a: a.reshape(a.shape[:-2] + (B,))
    Dst = StackedDerivs(Fx=flat(D.Fx), Fu=flat(D.Fu), Lx=flat(D.Lx),
                        Lu=flat(D.Lu), Lxx=flat(D.Lxx), Luu=flat(D.Luu),
                        Lxu=flat(D.Lxu))
    bounds = StackedBounds(lower=flat(D.lower), upper=flat(D.upper),
                           u=flat(D.u))
    VxT_f, VxxT_f = flat(VxT), flat(VxxT)
    lam = jnp.full((B,), 1e-6, jnp.float32)

    results = {"B": B, "N": N, "nu": nu}

    f_unc = jax.jit(lambda *a: backward_stacked(config, *a))
    t_unc = device_time_min(f_unc, Dst, VxT_f, VxxT_f, lam)
    results["backward_unconstrained_ms"] = t_unc * 1e3

    f_box = jax.jit(lambda *a: backward_stacked_boxed(config, *a))
    t_box = device_time_min(f_box, Dst, bounds, VxT_f, VxxT_f, lam)
    results["backward_boxed_ms"] = t_box * 1e3
    results["boxed_over_unconstrained"] = t_box / t_unc

    # fused boxed Pallas kernel (round 4: full stacked semantics in-kernel,
    # while-loop Armijo tail + QP continuation) — parity + time on chip
    if jax.default_backend() == "tpu" and B % 128 == 0:
        from nmpc_tpu.kernels.ddp_backward_pallas import backward_pallas_boxed

        f_pl = jax.jit(lambda *a: backward_pallas_boxed(config, *a))
        t_pl = device_time_min(f_pl, Dst, bounds, VxT_f, VxxT_f, lam)
        results["backward_boxed_pallas_ms"] = t_pl * 1e3
        results["boxed_pallas_speedup_vs_stacked"] = t_box / t_pl
        results["boxed_pallas_over_unconstrained"] = t_pl / t_unc
        o_st = f_box(Dst, bounds, VxT_f, VxxT_f, lam)
        o_pl = f_pl(Dst, bounds, VxT_f, VxxT_f, lam)
        results["boxed_pallas_ks_max_err"] = float(
            np.abs(np.asarray(o_st[0]) - np.asarray(o_pl[0])).max())
        results["boxed_pallas_ok_equal"] = bool(
            (np.asarray(o_st[3]) == np.asarray(o_pl[3])).all())

    # per-stage BoxQP trip counts (global while_loop => max over lanes)
    *_, qp_iters = backward_stacked_boxed(config, Dst, bounds, VxT_f, VxxT_f,
                                          lam, with_qp_iters=True)
    qp = np.asarray(qp_iters)
    results["qp_iters_per_stage"] = {
        "min": int(qp.min()), "median": float(np.median(qp)),
        "p90": float(np.percentile(qp, 90)), "max": int(qp.max()),
        "sum": int(qp.sum()),
    }

    # capped-iteration variants: does bounding the QP budget recover time,
    # and does the solution move?
    ks_ref, *_ = f_box(Dst, bounds, VxT_f, VxxT_f, lam)
    for cap in (int(qp.max()), 20, 10, 5):
        cfg_c = dataclasses.replace(
            config, boxqp=dataclasses.replace(BoxQPConfig(), max_iter=cap))
        f_c = jax.jit(lambda *a, c=cfg_c: backward_stacked_boxed(c, *a))
        t_c = device_time_min(f_c, Dst, bounds, VxT_f, VxxT_f, lam)
        ks_c, *_ = f_c(Dst, bounds, VxT_f, VxxT_f, lam)
        dk = float(np.max(np.abs(np.asarray(ks_c) - np.asarray(ks_ref))))
        results[f"backward_boxed_cap{cap}_ms"] = t_c * 1e3
        results[f"backward_boxed_cap{cap}_max_dk"] = dk

    # end-to-end solves at the bench config, for the headline ratio
    from nmpc_tpu import DDPSolver

    solver = DDPSolver(problem, dataclasses.replace(
        config, backward_impl="stacked"))
    t_solve = device_time_min(solver.solve_batch, t0, x0s, us0, reps=6)
    results["solve_boxed_ms"] = t_solve * 1e3
    results["solve_boxed_solves_per_s"] = B / t_solve

    if jax.default_backend() == "tpu" and B % 128 == 0:
        solver_p = DDPSolver(problem, dataclasses.replace(
            config, backward_impl="pallas"))
        t_sp = device_time_min(solver_p.solve_batch, t0, x0s, us0, reps=6)
        results["solve_boxed_pallas_ms"] = t_sp * 1e3
        results["solve_boxed_pallas_solves_per_s"] = B / t_sp
        r_st = solver.solve_batch(t0, x0s, us0)
        r_pl = solver_p.solve_batch(t0, x0s, us0)
        results["solve_boxed_pallas_u_max_err"] = float(
            np.abs(np.asarray(r_st.us) - np.asarray(r_pl.us)).max())
        results["solve_boxed_pallas_status_equal"] = bool(
            (np.asarray(r_st.status) == np.asarray(r_pl.status)).all())

    cfg_u = dataclasses.replace(config, with_input_constraint=False)
    solver_u = DDPSolver(problem, cfg_u)
    t_solve_u = device_time_min(solver_u.solve_batch, t0, x0s, us0, reps=6)
    results["solve_unconstrained_ms"] = t_solve_u * 1e3
    results["solve_unconstrained_solves_per_s"] = B / t_solve_u

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
