"""Pallas fused backward vs stacked XLA backward, on real TPU hardware.

VERDICT r1 item #1: benchmark ``backward_impl="pallas"`` vs ``"stacked"``
at the headline config (B=4096, N=100, cart-pole) on the chip, kernel-level
and end-to-end, and make the winner the default.

Run: python benchmarks/bench_backward.py
"""

import dataclasses
import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from nmpc_tpu import DDPConfig, DDPSolver
from nmpc_tpu.models.cartpole import make_cartpole_problem


def main():
    from benchmarks.timing import device_time_min

    problem = make_cartpole_problem(0.01)
    B, N = 4096, 100
    nx, nu = 4, 1

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        (np.tile(np.array([0.0, np.pi, 0.0, 0.0]), (B, 1))
         + 0.05 * rng.normal(size=(B, 4))).astype(np.float32))
    us0 = jnp.zeros((B, N, nu), jnp.float32)
    t0 = jnp.float32(0.0)

    results = {}

    # ---- kernel-level: backward pass only on synthetic stage data --------
    from nmpc_tpu.kernels.ddp_backward import StackedDerivs, backward_stacked
    from nmpc_tpu.kernels.ddp_backward_pallas import backward_pallas

    def synth(dtype=jnp.float32):
        r = np.random.default_rng(1)
        mk = lambda *s: jnp.asarray(0.1 * r.normal(size=s).astype(np.float32))
        eye = np.eye(nx, dtype=np.float32)
        Lxx = 0.01 * np.tile(eye[None], (N, 1, 1))
        Luu = 0.01 * np.tile(np.eye(nu, dtype=np.float32)[None], (N, 1, 1))
        D = StackedDerivs(
            Fx=jnp.asarray(np.tile(eye[None], (N, 1, 1)))[..., None]
            + mk(N, nx, nx, B) * 0.01,
            Fu=mk(N, nx, nu, B) * 0.1,
            Lx=mk(N, nx, B),
            Lu=mk(N, nu, B),
            Lxx=jnp.asarray(Lxx)[..., None] + 0 * mk(N, nx, nx, B),
            Luu=jnp.asarray(Luu)[..., None] + 0 * mk(N, nu, nu, B),
            Lxu=mk(N, nx, nu, B) * 0.001,
        )
        VxT = mk(nx, B)
        VxxT = jnp.asarray(eye)[..., None] + 0 * mk(nx, nx, B)
        lam = jnp.full((B,), 1e-4, dtype)
        return D, VxT, VxxT, lam

    config = DDPConfig(horizon_steps=N, max_iter=10)
    D, VxT, VxxT, lam = synth()

    f_stacked = jax.jit(lambda *a: backward_stacked(config, *a))
    f_pallas = jax.jit(lambda *a: backward_pallas(config, *a))

    t_st = device_time_min(f_stacked, D, VxT, VxxT, lam, reps=10, trials=3)
    results["backward_stacked_ms"] = t_st * 1e3
    try:
        # parity check on-chip first
        o1 = jax.tree.map(np.asarray, f_stacked(D, VxT, VxxT, lam))
        o2 = jax.tree.map(np.asarray, f_pallas(D, VxT, VxxT, lam))
        err = max(float(np.max(np.abs(o1[i] - o2[i]))) for i in range(3))
        results["pallas_vs_stacked_max_abs_err"] = err
        t_pl = device_time_min(f_pallas, D, VxT, VxxT, lam, reps=10, trials=3)
        results["backward_pallas_ms"] = t_pl * 1e3
        results["pallas_speedup_kernel"] = t_st / t_pl
    except Exception as e:  # noqa: BLE001
        results["pallas_error"] = repr(e)[:500]

    # ---- end-to-end solve with each backward_impl ------------------------
    for impl in ("stacked", "pallas"):
        cfg = dataclasses.replace(config, backward_impl=impl)
        solver = DDPSolver(problem, cfg)
        try:
            t = device_time_min(solver.solve_batch, t0, x0s, us0,
                                reps=6, trials=3)
            results[f"solve_{impl}_ms"] = t * 1e3
            results[f"solve_{impl}_solves_per_s"] = B / t
        except Exception as e:  # noqa: BLE001
            results[f"solve_{impl}_error"] = repr(e)[:500]

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
