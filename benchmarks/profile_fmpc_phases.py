"""On-chip phase profile of the batched FMPC PDIP iteration.

Times each batch-minor phase (coeff+KKT "check", backward Riccati, forward
recursion, update incl. fraction-to-boundary) standalone at the bench config
to decide where a fused Pallas kernel would pay.  Not part of the bench
suite — a planning tool.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nmpc_tpu import FmpcConfig, FmpcSolver, fmpc_variable_reset
from nmpc_tpu.models.oscillator import make_oscillator_problem
from nmpc_tpu.solvers import fmpc as F
from benchmarks.timing import device_time_min


def main(B=4096):
    problem = make_oscillator_problem(0.01)
    config = FmpcConfig(horizon_steps=100, max_iter=5)
    solver = FmpcSolver(problem, config)

    rng = np.random.default_rng(0)
    x0s = jnp.asarray((np.tile([0.0, 1.0], (B, 1))
                       + 0.05 * rng.normal(size=(B, 2))).astype(np.float32))
    var1 = fmpc_variable_reset(100, 2, 1, 3, dtype=jnp.float32)
    vars_b = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), var1)
    epss = jnp.full((B,), 1e-4, jnp.float32)
    t0 = jnp.float32(0.0)

    # end-to-end
    t_full = device_time_min(solver.solve_batch, t0, x0s, vars_b, epss,
                             reps=4, trials=3)
    print(f"end-to-end solve_batch  B={B}: {t_full*1e3:8.3f} ms "
          f"({B/t_full:,.0f} solves/s)")

    # build batch-minor state like _solve_batched does
    dtype = x0s.dtype
    N = config.horizon_steps
    dt = problem.dt
    ts = t0 + dt * jnp.arange(N, dtype=dtype)
    gms = jax.vmap(lambda t: problem.ineq_mask_at(t).astype(dtype))(ts)
    bm = lambda a: jnp.moveaxis(a, 0, -1)
    x0_b = bm(x0s)
    var = jax.tree_util.tree_map(bm, vars_b)
    gm3 = gms[:, :, None]
    g0 = jax.vmap(jax.vmap(problem.ineq_const, in_axes=(None, -1, -1),
                           out_axes=-1))(ts, var.xs[:-1], var.us)
    ss = (1.0 + 1e-2) * jnp.maximum(-g0, 1e-2)
    nus = (1.0 + 1e-2) * jnp.maximum(epss[None, None, :] / ss, 1e-2)
    var = F.FmpcVariable(var.xs, var.us, var.lambdas,
                         jnp.where(gm3 > 0, ss, 1.0),
                         jnp.where(gm3 > 0, nus, 0.0))

    coeffs_fn = jax.jit(functools.partial(F._coeffs_bm, problem, config, t0))
    co = jax.block_until_ready(coeffs_fn(var))

    kkt_fn = jax.jit(lambda x0_b, var, co, z, gms:
                     F._kkt_error_bm(x0_b, var, co, z, gms))
    zer = jnp.zeros((B,), dtype)

    bwd_fn = jax.jit(functools.partial(F._backward_bm, problem, config))
    out_b = jax.block_until_ready(bwd_fn(co, var.ss, var.nus, gms, epss))
    ks, Ks, ss_vec, Ps, _, _ = out_b

    fwd_fn = jax.jit(functools.partial(F._forward_bm, problem, config))
    delta, _ = jax.block_until_ready(
        fwd_fn(co, var, x0_b, ks, Ks, ss_vec, Ps, epss, gms))

    upd_fn = jax.jit(functools.partial(F._update_bm, problem, config, t0))

    t_co = device_time_min(coeffs_fn, var, reps=16, trials=3)
    t_kkt = device_time_min(kkt_fn, x0_b, var, co, zer, gms, reps=16, trials=3)
    t_bw = device_time_min(bwd_fn, co, var.ss, var.nus, gms, epss,
                           reps=16, trials=3)
    t_fw = device_time_min(fwd_fn, co, var, x0_b, ks, Ks, ss_vec, Ps, epss,
                           gms, reps=16, trials=3)
    t_up = device_time_min(upd_fn, x0_b, co, var, delta, epss, gms,
                           reps=16, trials=3)

    one_iter = t_co + t_kkt + t_bw + t_fw + t_up
    for name, t in [("coeffs", t_co), ("kkt", t_kkt), ("backward", t_bw),
                    ("forward", t_fw), ("update", t_up)]:
        print(f"  {name:9s}: {t*1e3:7.3f} ms  ({100*t/one_iter:5.1f}% of "
              f"one iteration)")
    print(f"  sum of phases (1 iter): {one_iter*1e3:7.3f} ms; "
          f"full solve ran {t_full/one_iter:.1f} iteration-equivalents")


if __name__ == "__main__":
    main()
