"""Diagnose the FMPC pallas end-to-end divergence.

Measures (1) the true single-backward parity, (2) per-iteration growth of
pallas-vs-stacked divergence through the PDIP loop, (3) the intrinsic fp32
sensitivity (stacked fp32 vs a perturbed stacked fp32 run).
"""
import functools
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

pl.pallas_call = functools.partial(pl.pallas_call, interpret=True)

from nmpc_tpu.core.types import FmpcConfig, fmpc_variable_reset
from nmpc_tpu.models.oscillator import make_oscillator_problem
from nmpc_tpu.solvers.fmpc import FmpcSolver
from nmpc_tpu.solvers import fmpc as F
from nmpc_tpu.core.types import FmpcVariable

p = make_oscillator_problem(0.01)
N, B = 20, 128
rng = np.random.default_rng(2)
x0s = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32) * 0.5)
var1 = fmpc_variable_reset(N, 2, 1, 3, dtype=jnp.float32)
vars_b = jax.tree_util.tree_map(
    lambda a: jnp.broadcast_to(a, (B,) + a.shape), var1)
eps0 = jnp.full((B,), 1e-4, jnp.float32)

# --- (1) single-backward parity on the ACTUAL first-iteration coefficients
from nmpc_tpu.kernels.fmpc_backward_pallas import backward_fmpc_pallas

c = FmpcConfig(horizon_steps=N, max_iter=5)
dtype = jnp.float32
t0 = jnp.float32(0.0)
ts = t0 + p.dt * jnp.arange(N, dtype=dtype)
gms = jax.vmap(lambda t: p.ineq_mask_at(t).astype(dtype))(ts)
gm3 = gms[:, :, None]

bm = lambda a: jnp.moveaxis(a, 0, -1)
x0_b = bm(x0s)
var = jax.tree_util.tree_map(bm, vars_b)
# init complementary vars like the solver
margin, cmin = 1e-2, 1e-2
eps = jnp.full((B,), 1e-4, dtype)
ineq_b = jax.vmap(p.ineq_const, in_axes=(None, -1, -1), out_axes=-1)
g0 = jax.vmap(ineq_b)(ts, var.xs[:-1], var.us)
ss = (1.0 + margin) * jnp.maximum(-g0, cmin)
nus = (1.0 + margin) * jnp.maximum(eps[None, None, :] / ss, cmin)
var = FmpcVariable(var.xs, var.us, var.lambdas,
                   jnp.where(gm3 > 0, ss, 1.0),
                   jnp.where(gm3 > 0, nus, 0.0))

co = F._coeffs_bm(p, c, t0, var)
o1 = F._backward_bm(p, c, co, var.ss, var.nus, gms, eps)
o2 = backward_fmpc_pallas(p, c, co, var.ss, var.nus, gms, eps)
names = ["ks", "Ks", "svecs", "Ps"]
print("== single-backward parity (iteration-1 coefficients) ==")
for nm, a, b in zip(names, o1[:4], o2[:4]):
    d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
    rel = d / (np.abs(np.asarray(a, np.float64)) + 1e-12)
    print(f"  {nm}: max abs {d.max():.3e} max rel {rel.max():.3e}")

# --- (2) per-iteration growth
print("== per-iteration divergence (max_iter=k) ==")
for k in range(1, 6):
    outs = {}
    for impl in ("stacked", "pallas"):
        ck = FmpcConfig(horizon_steps=N, max_iter=k, backward_impl=impl)
        outs[impl] = FmpcSolver(p, ck).solve_batch(0.0, x0s, vars_b, eps0)
    a, b = outs["stacked"], outs["pallas"]
    du = np.abs(np.asarray(a.variable.us, np.float64)
                - np.asarray(b.variable.us, np.float64)).max()
    ds = np.abs(np.asarray(a.variable.ss, np.float64)
                - np.asarray(b.variable.ss, np.float64)).max()
    dk = np.abs(np.asarray(a.kkt_error, np.float64)
                - np.asarray(b.kkt_error, np.float64)).max()
    same_status = np.array_equal(np.asarray(a.status), np.asarray(b.status))
    same_iters = np.array_equal(np.asarray(a.iters), np.asarray(b.iters))
    print(f"  k={k}: max|du|={du:.3e} max|ds|={ds:.3e} max|dkkt|={dk:.3e} "
          f"status_eq={same_status} iters_eq={same_iters} "
          f"kkt(stacked) max={np.asarray(a.kkt_error).max():.3e}")

# --- (3) intrinsic sensitivity: stacked vs stacked-with-1ulp-x0-perturbation
print("== intrinsic fp32 sensitivity (stacked vs stacked, x0 + 1 ulp) ==")
x0s_p = x0s * (1.0 + 1.2e-7)
for k in (3, 5):
    ck = FmpcConfig(horizon_steps=N, max_iter=k, backward_impl="stacked")
    s = FmpcSolver(p, ck)
    a = s.solve_batch(0.0, x0s, vars_b, eps0)
    b = s.solve_batch(0.0, x0s_p, vars_b, eps0)
    du = np.abs(np.asarray(a.variable.us, np.float64)
                - np.asarray(b.variable.us, np.float64)).max()
    print(f"  k={k}: max|du| = {du:.3e}")
