"""On-TPU compile + parity + perf check of the fused boxed Pallas kernel
at the DEFAULT BoxQP config (full 105-step Armijo schedule) — the
configuration the interpreter could never reach.  Round 4 evidence run.
"""
import sys

sys.path.insert(0, ".")

import dataclasses
import json

import numpy as np
import jax
import jax.numpy as jnp

from nmpc_tpu import DDPConfig
from nmpc_tpu.models.vertical import make_vertical_problem
from nmpc_tpu.solvers import ddp as Dmod
from nmpc_tpu.kernels.ddp_backward import (
    StackedBounds, StackedDerivs, backward_stacked, backward_stacked_boxed)
from nmpc_tpu.kernels.ddp_backward_pallas import backward_pallas_boxed
from nmpc_tpu.kernels.lanes import block_lanes, lane_factors

print("backend:", jax.default_backend())

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

import time

t_c = time.time()
o2 = backward_pallas_boxed(config, Dst, bounds, VxT_f, VxxT_f, lam)
ks2 = np.asarray(o2[0])
print(f"pallas boxed compiled+ran in {time.time()-t_c:.1f}s")

o1 = backward_stacked_boxed(config, Dst, bounds, VxT_f, VxxT_f, lam)
ks1 = np.asarray(o1[0])
Ks1, Ks2 = np.asarray(o1[1]), np.asarray(o2[1])
dV1, dV2 = np.asarray(o1[2]), np.asarray(o2[2])
ok1, ok2 = np.asarray(o1[3]), np.asarray(o2[3])

res = {
    "ks_max_err": float(np.abs(ks1 - ks2).max()),
    "Ks_max_err": float(np.abs(Ks1 - Ks2).max()),
    "dV_max_err": float(np.abs(dV1 - dV2).max()),
    "ok_equal": bool((ok1 == ok2).all()),
}
print(json.dumps(res))

# perf
from benchmarks.timing import device_time_min

f_st = jax.jit(lambda *a: backward_stacked_boxed(config, *a))
f_pl = jax.jit(lambda *a: backward_pallas_boxed(config, *a))
t_st = device_time_min(f_st, Dst, bounds, VxT_f, VxxT_f, lam)
t_pl = device_time_min(f_pl, Dst, bounds, VxT_f, VxxT_f, lam)
f_un = jax.jit(lambda *a: backward_stacked(config, *a))
t_un = device_time_min(f_un, Dst, VxT_f, VxxT_f, lam)
print(json.dumps({
    "stacked_boxed_ms": t_st * 1e3,
    "pallas_boxed_ms": t_pl * 1e3,
    "unconstrained_stacked_ms": t_un * 1e3,
    "pallas_speedup_vs_stacked": t_st / t_pl,
}))
