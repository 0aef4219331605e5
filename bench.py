"""Benchmark: batched cart-pole DDP solves/s on one chip.

BASELINE.md target: >= 10,000 batched DDP cart-pole solves/s/chip
(state 4, input 1, horizon 100), u-trajectories matching the reference
algorithm (golden-parity enforced separately in tests/).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from nmpc_tpu import DDPConfig, DDPSolver
from nmpc_tpu.models.cartpole import make_cartpole_problem

BASELINE_SOLVES_PER_S = 10_000.0


def main():
    # BASELINE.json config #1: cart-pole swing-up, horizon 100.
    problem = make_cartpole_problem(0.01)
    config = DDPConfig(horizon_steps=100, max_iter=10)
    solver = DDPSolver(problem, config)

    B = 4096
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        (np.tile(np.array([0.0, np.pi, 0.0, 0.0]), (B, 1))
         + 0.05 * rng.normal(size=(B, 4))).astype(np.float32)
    )
    us0 = jnp.zeros((B, 100, 1), jnp.float32)
    t0 = jnp.float32(0.0)

    # warmup / compile
    for _ in range(3):
        res = solver.solve_batch(t0, x0s, us0)
        jax.block_until_ready(res)

    # Queue all reps, sync once: per-call host sync pays a ~20 ms tunnel
    # round-trip in this environment and would understate device throughput.
    n_rep = 5
    start = time.perf_counter()
    for _ in range(n_rep):
        res = solver.solve_batch(t0, x0s, us0)
    jax.block_until_ready(res)
    elapsed = time.perf_counter() - start

    solves_per_s = B * n_rep / elapsed
    print(json.dumps({
        "metric": "ddp_cartpole_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
