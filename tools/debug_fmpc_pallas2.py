"""Check pallas-vs-stacked parity at CONVERGENCE (the meaningful contract)."""
import functools
import os

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

from nmpc_tpu.core.types import FmpcConfig, FmpcStatus, fmpc_variable_reset
from nmpc_tpu.models.oscillator import make_oscillator_problem
from nmpc_tpu.solvers.fmpc import FmpcSolver

p = make_oscillator_problem(0.01)
N, B = 20, 128
rng = np.random.default_rng(2)

for scale, mi in ((0.5, 20), (0.3, 20), (0.3, 10)):
    x0s = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32) * scale)
    var1 = fmpc_variable_reset(N, 2, 1, 3, dtype=jnp.float32)
    vars_b = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), var1)
    eps0 = jnp.full((B,), 1e-4, jnp.float32)
    outs = {}
    for impl in ("stacked", "pallas"):
        c = FmpcConfig(horizon_steps=N, max_iter=mi, backward_impl=impl,
                       init_complementary_variable=True)
        outs[impl] = FmpcSolver(p, c).solve_batch(0.0, x0s, vars_b, eps0)
    a, b = outs["stacked"], outs["pallas"]
    st = np.asarray(a.status)
    n_succ = int((st == int(FmpcStatus.SUCCEEDED)).sum())
    same_status = np.array_equal(st, np.asarray(b.status))
    same_iters = np.array_equal(np.asarray(a.iters), np.asarray(b.iters))
    du = np.abs(np.asarray(a.variable.us, np.float64)
                - np.asarray(b.variable.us, np.float64))
    # parity on converged lanes only
    mask = (st == int(FmpcStatus.SUCCEEDED))
    du_conv = du[mask].max() if mask.any() else float("nan")
    print(f"scale={scale} max_iter={mi}: succ={n_succ}/{B} "
          f"status_eq={same_status} iters_eq={same_iters} "
          f"max|du|_all={du.max():.3e} max|du|_converged={du_conv:.3e} "
          f"kkt_max={np.asarray(a.kkt_error).max():.3e} "
          f"iters_max={np.asarray(a.iters).max()}")
