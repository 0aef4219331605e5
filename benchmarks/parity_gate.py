"""On-chip Pallas-vs-stacked parity gate (VERDICT r3 item #2).

Rounds 2 and 3 each shipped a default fast path whose compiled kernel
diverged from the stacked reference path.  This gate makes that
structurally impossible to miss: ``bench.py`` (which the driver runs on
real TPU hardware every round) calls :func:`run_parity_gate` BEFORE
timing and embeds the per-kernel pass/fail + max-err into the bench JSON.

Checks, at the bench shapes, compiled on the real chip:

  1. unconstrained DDP backward  — ``backward_pallas``      vs ``backward_stacked``
  2. boxed DDP backward          — ``backward_pallas_boxed``vs ``backward_stacked_boxed``
  3. FMPC condensed Riccati      — ``backward_fmpc_pallas`` vs ``_backward_bm``

Tolerances are the per-kernel parity-contract values: compiled XLA and
Mosaic reassociate fp32 reductions differently, so on-chip agreement is
fp-noise-level, not bit-exact (the bit-exact contract is pinned by the
interpreter-mode tests in tests/test_pallas_kernels.py /
tests/test_fmpc_pallas.py).  Measured on 2026-08-20 (v5e):
unconstrained ks 0.0, boxed ks 1.3e-5, FMPC 1.5e-5-class.
"""

from __future__ import annotations

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

try:  # persistent compile cache: gate reruns cost seconds, not minutes
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

# Normalized tolerances (max|a-b| / (1 + max|a|) per output): ~10x
# headroom over the measured on-chip errors; anything past these is a
# semantic divergence, not fp reassociation.
TOL_DDP_UNCONSTRAINED = 2e-4
TOL_DDP_BOXED = 2e-4
TOL_FMPC = 2e-4


def _ddp_unconstrained_case(B=4096, N=100):
    """First-iteration cart-pole derivative data at the headline shape."""
    from nmpc_tpu import DDPConfig
    from nmpc_tpu.models.cartpole import make_cartpole_problem
    from nmpc_tpu.solvers import ddp as Dmod
    from nmpc_tpu.kernels.ddp_backward import stack_derivs

    p = make_cartpole_problem(0.01)
    c = DDPConfig(horizon_steps=N, max_iter=10)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray((np.tile([0.0, np.pi, 0.0, 0.0], (B, 1))
                       + 0.05 * rng.normal(size=(B, 4))).astype(np.float32))
    us = jnp.asarray(rng.normal(size=(B, N, 1)).astype(np.float32) * 0.2)
    xs, _ = Dmod._rollout_stacked(p, c, jnp.float32(0.0), x0s, us)
    Ds, VxT, VxxT = jax.vmap(
        functools.partial(Dmod._derivative_sweep, p, c),
        in_axes=(None, 0, 0))(jnp.float32(0.0), xs, us)
    S = stack_derivs(Ds.Fx, Ds.Fu, Ds.Lx, Ds.Lu, Ds.Lxx, Ds.Luu, Ds.Lxu)
    lam = jnp.full((B,), 1e-4, jnp.float32)
    return c, S, jnp.moveaxis(VxT, 0, -1), jnp.moveaxis(VxxT, 0, -1), lam


def _ddp_boxed_case(B=1024, N=100):
    """First-iteration vertical-motion boxed data, default BoxQP config."""
    from nmpc_tpu import DDPConfig
    from nmpc_tpu.models.vertical import make_vertical_problem
    from nmpc_tpu.solvers import ddp as Dmod
    from nmpc_tpu.kernels.ddp_backward import StackedBounds, StackedDerivs
    from nmpc_tpu.kernels.lanes import block_lanes, lane_factors

    p = make_vertical_problem(0.01)
    c = DDPConfig(horizon_steps=N, max_iter=3, initial_lambda=1e-6,
                  with_input_constraint=True)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray((np.tile([1.2, 0.0], (B, 1))
                       + 0.05 * rng.normal(size=(B, 2))).astype(np.float32))
    us0 = jnp.asarray(0.02 * rng.normal(size=(B, N, 2)).astype(np.float32))
    t0 = jnp.float32(0.0)
    S, L = lane_factors(B)
    xs_l, _ = Dmod._rollout_lanes(p, c, t0, block_lanes(x0s, 0, S, L),
                                  block_lanes(us0, 0, S, L))
    D, VxT, VxxT = Dmod._derivative_sweep_lanes(
        p, c, t0, xs_l, block_lanes(us0, 0, S, L))
    flat = lambda a: a.reshape(a.shape[:-2] + (B,))
    Dst = StackedDerivs(Fx=flat(D.Fx), Fu=flat(D.Fu), Lx=flat(D.Lx),
                        Lu=flat(D.Lu), Lxx=flat(D.Lxx), Luu=flat(D.Luu),
                        Lxu=flat(D.Lxu))
    bounds = StackedBounds(lower=flat(D.lower), upper=flat(D.upper),
                           u=flat(D.u))
    lam = jnp.full((B,), 1e-6, jnp.float32)
    return c, Dst, bounds, flat(VxT), flat(VxxT), lam


def _fmpc_case(B=4096, N=20):
    """First-iteration oscillator FMPC coefficients (batch-minor)."""
    from nmpc_tpu.core.types import FmpcConfig, fmpc_variable_reset
    from nmpc_tpu.models.oscillator import make_oscillator_problem
    from nmpc_tpu.solvers import fmpc as F

    p = make_oscillator_problem(0.01)
    c = FmpcConfig(horizon_steps=N, max_iter=5)
    nx, nu, ng = p.state_dim, p.input_dim, p.ineq_dim
    var1 = fmpc_variable_reset(N, nx, nu, ng, dtype=jnp.float32)
    vars_b = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), var1)
    eps0 = jnp.full((B,), 1e-4, jnp.float32)
    t0 = jnp.float32(0.0)
    bm = lambda a: jnp.moveaxis(a, 0, -1)
    var = jax.tree_util.tree_map(bm, vars_b)
    ts = t0 + p.dt * jnp.arange(N, dtype=jnp.float32)
    gms = jax.vmap(lambda t: p.ineq_mask_at(t).astype(jnp.float32))(ts)
    ineq_b = jax.vmap(p.ineq_const, in_axes=(None, -1, -1), out_axes=-1)
    g0 = jax.vmap(ineq_b)(ts, var.xs[:-1], var.us)
    ss = 1.01 * jnp.maximum(-g0, 1e-2)
    nus = 1.01 * jnp.maximum(eps0[None, None, :] / ss, 1e-2)
    var = type(var)(var.xs, var.us, var.lambdas, ss, nus)
    co = F._coeffs_bm(p, c, t0, var)
    return p, c, co, var, gms, eps0


def _norm_errs(o1, o2, names):
    """Per-output normalized error max|a-b| / (1 + max|a|) — scale-aware
    (dV sums over the horizon and is orders larger than ks)."""
    out = {}
    for i, n in enumerate(names):
        a = np.asarray(o1[i]).astype(np.float64)
        b = np.asarray(o2[i]).astype(np.float64)
        out[n] = float(np.max(np.abs(a - b)) / (1.0 + np.max(np.abs(a))))
    return out


def run_parity_gate() -> dict:
    """Compiled pallas-vs-stacked parity at the bench shapes.  Returns
    ``{kernel: {max_err, tol, pass}}`` plus an overall ``pass`` bool."""
    from nmpc_tpu.kernels.ddp_backward import (backward_stacked,
                                               backward_stacked_boxed)
    from nmpc_tpu.kernels.ddp_backward_pallas import (backward_pallas,
                                                      backward_pallas_boxed)
    from nmpc_tpu.kernels.fmpc_backward_pallas import backward_fmpc_pallas
    from nmpc_tpu.solvers import fmpc as F

    out = {}

    c, S, VxT, VxxT, lam = _ddp_unconstrained_case()
    o1 = backward_stacked(c, S, VxT, VxxT, lam)
    o2 = backward_pallas(c, S, VxT, VxxT, lam)
    errs = _norm_errs(o1, o2, ("ks", "Ks", "dV"))
    ok_eq = bool((np.asarray(o1[3]) == np.asarray(o2[3])).all())
    err = max(errs.values())
    out["ddp_unconstrained"] = {
        "errs": errs, "max_err": err, "tol": TOL_DDP_UNCONSTRAINED,
        "ok_equal": ok_eq,
        "pass": bool(err <= TOL_DDP_UNCONSTRAINED and ok_eq)}

    c, Dst, bounds, VxT, VxxT, lam = _ddp_boxed_case()
    o1 = backward_stacked_boxed(c, Dst, bounds, VxT, VxxT, lam)
    o2 = backward_pallas_boxed(c, Dst, bounds, VxT, VxxT, lam)
    errs = _norm_errs(o1, o2, ("ks", "Ks", "dV"))
    ok_eq = bool((np.asarray(o1[3]) == np.asarray(o2[3])).all())
    err = max(errs.values())
    out["ddp_boxed"] = {
        "errs": errs, "max_err": err, "tol": TOL_DDP_BOXED,
        "ok_equal": ok_eq,
        "pass": bool(err <= TOL_DDP_BOXED and ok_eq)}

    p, c, co, var, gms, eps0 = _fmpc_case()
    o1 = F._backward_bm(p, c, co, var.ss, var.nus, gms, eps0)
    o2 = backward_fmpc_pallas(p, c, co, var.ss, var.nus, gms, eps0)
    errs = _norm_errs(o1, o2, ("ks", "Ks", "Ps", "ss"))
    err = max(errs.values())
    out["fmpc"] = {"errs": errs, "max_err": err, "tol": TOL_FMPC,
                   "pass": bool(err <= TOL_FMPC)}

    out["pass"] = all(v["pass"] for v in out.values()
                      if isinstance(v, dict))
    return out


if __name__ == "__main__":
    import json

    print(json.dumps(run_parity_gate(), indent=1))
