"""In-graph per-phase profile of the batched FMPC solve on chip
(VERDICT r4 item #6 — the solve-anatomy treatment DDP got in round 4).

Phases per PDIP iteration (``_solve_batched``'s body, mirroring the
reference ``FmpcSolver.hpp:365-450``):

  coeff sweep  _coeffs_bm       (FmpcSolver.hpp:401-440 — the hot loop)
  KKT error    _kkt_error_bm    (:496-521)
  backward     condensed Riccati, pallas + stacked (:524-665)
  forward      _forward_bm      (:668-708)
  update       _update_bm       (fraction-to-boundary + merit, :711-834)

Methodology (same as tools/profile_solve_phases.py): each phase is
measured CHAINED R times inside ONE jit (data-dependent fori_loop defeats
CSE) because a single dispatch through this environment's tunnel costs
~175-200 us regardless of the op — standalone sub-ms timings are
dispatch-bound artifacts.

Run on the TPU:  python tools/profile_fmpc_phases.py
"""

import json
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nmpc_tpu.core.types import FmpcConfig, fmpc_variable_reset
from nmpc_tpu.models.cartpole import make_cartpole_fmpc_problem
from nmpc_tpu.models.oscillator import make_oscillator_problem
from nmpc_tpu.solvers import fmpc as F
from nmpc_tpu.solvers.fmpc import FmpcSolver
from nmpc_tpu.kernels.fmpc_backward_pallas import backward_fmpc_pallas
from benchmarks.timing import device_time_min

R = 30
tiny = jnp.float32(1e-30)


def chain(fn, probe):
    def run():
        def body(i, acc):
            out = fn(acc * tiny)
            return acc + probe(out)
        return lax.fori_loop(0, R, body, jnp.float32(0.0))
    f = jax.jit(run)
    t = device_time_min(f, reps=3, trials=3)
    return t / R


def profile(name, problem, B, N, x0s):
    p = problem
    nx, nu, ng = p.state_dim, p.input_dim, p.ineq_dim
    config = FmpcConfig(horizon_steps=N, max_iter=5,
                        init_complementary_variable=True)
    t0 = jnp.float32(0.0)
    var1 = fmpc_variable_reset(N, nx, nu, ng, dtype=jnp.float32)
    vars_b = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), var1)
    eps0 = jnp.full((B,), 1e-4, jnp.float32)
    bm = lambda a: jnp.moveaxis(a, 0, -1)
    var = jax.tree_util.tree_map(bm, vars_b)
    ts = t0 + p.dt * jnp.arange(N, dtype=jnp.float32)
    gms = jax.vmap(lambda t: p.ineq_mask_at(t).astype(jnp.float32))(ts)
    # complementarity init like the solver (FmpcSolver.hpp:171-188)
    ineq_b = jax.vmap(p.ineq_const, in_axes=(None, -1, -1), out_axes=-1)
    g0 = jax.vmap(ineq_b)(ts, var.xs[:-1], var.us)
    ss = 1.01 * jnp.maximum(-g0, 1e-2)
    nus = 1.01 * jnp.maximum(eps0[None, None, :] / ss, 1e-2)
    var = type(var)(var.xs, var.us, var.lambdas, ss, nus)
    x0_b = bm(x0s)

    co = jax.jit(lambda v: F._coeffs_bm(p, config, t0, v))(var)
    bw = jax.jit(lambda c, s_, n_, e: F._backward_bm(p, config, c, s_, n_,
                                                     gms, e))
    ks, Ks, ss_vec, Ps, ok, fin = bw(co, var.ss, var.nus, eps0)

    res = {"config": name, "B": B, "N": N, "dims": [nx, nu, ng],
           "R_chained": R}
    res["coeff_sweep_ms"] = chain(
        lambda d: F._coeffs_bm(p, config, t0,
                               type(var)(var.xs + d, var.us, var.lambdas,
                                         var.ss, var.nus)),
        lambda o: o.A[0, 0, 0, 0]) * 1e3
    res["kkt_error_ms"] = chain(
        lambda d: F._kkt_error_bm(x0_b + d, var, co, eps0, gms),
        lambda o: o[0]) * 1e3
    res["backward_stacked_ms"] = chain(
        lambda d: F._backward_bm(p, config, co, var.ss, var.nus, gms,
                                 eps0 + d),
        lambda o: o[0][0, 0, 0]) * 1e3
    try:
        res["backward_pallas_ms"] = chain(
            lambda d: backward_fmpc_pallas(p, config, co, var.ss, var.nus,
                                           gms, eps0 + d),
            lambda o: o[0][0, 0, 0]) * 1e3
    except Exception as e:  # noqa: BLE001
        res["backward_pallas_error"] = repr(e)[:200]
    res["forward_ms"] = chain(
        lambda d: F._forward_bm(p, config, co, var, x0_b + d, ks, Ks,
                                ss_vec, Ps, eps0, gms),
        lambda o: o[0].xs[0, 0, 0]) * 1e3
    delta, _ = jax.jit(lambda: F._forward_bm(p, config, co, var, x0_b, ks,
                                             Ks, ss_vec, Ps, eps0, gms))()
    res["update_ms"] = chain(
        lambda d: F._update_bm(p, config, t0, x0_b + d, co, var, delta,
                               eps0, gms),
        lambda o: o[0].xs[0, 0, 0]) * 1e3

    phases = ["coeff_sweep_ms", "kkt_error_ms", "forward_ms", "update_ms"]
    bw_key = ("backward_pallas_ms" if "backward_pallas_ms" in res
              else "backward_stacked_ms")
    res["sum_per_iteration_ms"] = sum(res[k] for k in phases) + res[bw_key]

    solver = FmpcSolver(p, config)
    t_solve = device_time_min(solver.solve_batch, t0, x0s, vars_b, eps0,
                              reps=6, trials=3)
    res["full_solve_ms"] = t_solve * 1e3
    res["solves_per_s"] = B / t_solve
    return res


def main():
    rng = np.random.default_rng(0)
    B = 4096
    out = []
    p_osc = make_oscillator_problem(0.01)
    x0s = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32) * 0.3)
    out.append(profile("oscillator", p_osc, B, 20, x0s))
    p_cp = make_cartpole_fmpc_problem(0.01)
    x0s = jnp.asarray(
        (np.tile(np.array([0.0, np.pi, 0.0, 0.0]), (B, 1))
         + 0.05 * rng.normal(size=(B, 4))).astype(np.float32))
    out.append(profile("cartpole_fmpc", p_cp, B, 100, x0s))
    for r in out:
        print(json.dumps(r, indent=1))


if __name__ == "__main__":
    main()
