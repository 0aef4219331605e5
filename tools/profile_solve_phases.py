"""Round-4 TRUE phase breakdown of the headline DDP solve on chip.

Methodology note (the round-4 finding that re-frames the r3 roofline
audit): a single dispatch through this environment's device tunnel costs
~175-200 us regardless of the op (a trivial (32,128) multiply measures the
same as the r3 "fused backward" row).  Standalone per-phase timings are
therefore dispatch-bound, not kernel-bound.  Here every phase is measured
CHAINED R times inside ONE jit (a data-dependent fori_loop that defeats
CSE), so the per-call number is the in-graph cost the full solve actually
pays.
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

from nmpc_tpu import DDPConfig, DDPSolver
from nmpc_tpu.models.cartpole import make_cartpole_problem
from nmpc_tpu.solvers import ddp as Dmod
from nmpc_tpu.kernels.ddp_backward import StackedDerivs
from nmpc_tpu.kernels.ddp_backward_pallas import backward_pallas
from nmpc_tpu.kernels.lanes import block_lanes, lane_factors
from benchmarks.timing import device_time_min

problem = make_cartpole_problem(0.01)
N, B = 100, 4096
config = DDPConfig(horizon_steps=N, max_iter=10)
rng = np.random.default_rng(0)
x0s = jnp.asarray((np.tile([0.0, np.pi, 0.0, 0.0], (B, 1))
                   + 0.05 * rng.normal(size=(B, 4))).astype(np.float32))
us0 = jnp.zeros((B, N, 1), jnp.float32)
t0 = jnp.float32(0.0)
S, L = lane_factors(B)

x_l = block_lanes(x0s, 0, S, L)
us_l = block_lanes(us0, 0, S, L)
xs_l, _ = jax.jit(lambda x, u: Dmod._rollout_lanes(
    problem, config, t0, x, u))(x_l, us_l)
D, VxT, VxxT = jax.jit(lambda xs, us: Dmod._derivative_sweep_lanes(
    problem, config, t0, xs, us))(xs_l, us_l)
flat = lambda a: a.reshape(a.shape[:-2] + (B,))
Dst = StackedDerivs(Fx=flat(D.Fx), Fu=flat(D.Fu), Lx=flat(D.Lx),
                    Lu=flat(D.Lu), Lxx=flat(D.Lxx), Luu=flat(D.Luu),
                    Lxu=flat(D.Lxu))
VxT_f, VxxT_f = flat(VxT), flat(VxxT)
lam = jnp.full((B,), 1e-6, jnp.float32)
ks_f, Ks_f, dV, ok = jax.jit(lambda *a: backward_pallas(config, *a))(
    Dst, VxT_f, VxxT_f, lam)
lanes = lambda a: a.reshape(a.shape[:-1] + (S, L))
ks_l, Ks_l = lanes(ks_f), lanes(Ks_f)
alpha_l = jnp.ones((S, L), jnp.float32)

R = 30
tiny = jnp.float32(1e-30)


def chain(fn, probe):
    """Run fn R times inside one jit, perturbing via `probe` to defeat
    CSE; returns per-call seconds."""
    def run():
        def body(i, acc):
            out = fn(acc * tiny)
            return acc + probe(out)
        return lax.fori_loop(0, R, body, jnp.float32(0.0))
    f = jax.jit(run)
    t = device_time_min(f, reps=3, trials=3)
    return t / R


res = {"B": B, "N": N, "R_chained": R}
res["initial_rollout_ms"] = chain(
    lambda d: Dmod._rollout_lanes(problem, config, t0, x_l + d, us_l),
    lambda o: o[0][1, 0, 0, 0]) * 1e3
res["derivative_sweep_ms"] = chain(
    lambda d: Dmod._derivative_sweep_lanes(problem, config, t0, xs_l + d,
                                           us_l),
    lambda o: o[0].Fx[0, 0, 0, 0, 0]) * 1e3
res["backward_pallas_ms"] = chain(
    lambda d: backward_pallas(config, Dst, VxT_f, VxxT_f, lam + d),
    lambda o: o[0][0, 0, 0]) * 1e3
# round 5: the whole-iteration remat kernel REPLACES sweep+backward
from nmpc_tpu.kernels.ddp_backward_remat import backward_remat

xs_f = flat(xs_l)
us_f = flat(us_l)
res["backward_remat_ms"] = chain(
    lambda d: backward_remat(problem, config, t0, xs_f, us_f, VxT_f,
                             VxxT_f, lam + d),
    lambda o: o[0][0, 0, 0]) * 1e3
res["forward_costs_ms"] = chain(
    lambda d: Dmod._forward_costs_lanes(problem, config, t0, xs_l + d, us_l,
                                        ks_l, Ks_l),
    lambda o: o[0, 0, 0]) * 1e3
res["forward_selected_ms"] = chain(
    lambda d: Dmod._forward_selected_lanes(problem, config, t0, xs_l + d,
                                           us_l, ks_l, Ks_l, alpha_l),
    lambda o: o[0][1, 0, 0, 0]) * 1e3

per_iter = (res["backward_remat_ms"]
            + res["forward_costs_ms"] + res["forward_selected_ms"])
res["sum_per_iteration_ms"] = per_iter
res["sum_per_iteration_sweepfed_ms"] = (
    res["derivative_sweep_ms"] + res["backward_pallas_ms"]
    + res["forward_costs_ms"] + res["forward_selected_ms"])

solver = DDPSolver(problem, config)
t_solve = device_time_min(solver.solve_batch, t0, x0s, us0, reps=6)
r_full = solver.solve_batch(t0, x0s, us0)
res["full_solve_ms"] = t_solve * 1e3
res["solves_per_s"] = B / t_solve
res["iters_mean"] = float(np.asarray(r_full.iters).mean())
res["accounted_ms"] = (res["initial_rollout_ms"]
                       + res["iters_mean"] * per_iter)

print(json.dumps(res, indent=1))
