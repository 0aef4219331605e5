"""Example: a fleet of 4096 MPC controllers on one chip.

Every controller runs a full receding-horizon loop entirely on device
(solve -> apply -> shift), batched through the stacked kernels.

Run:  python examples/fleet.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from nmpc_tpu import DDPConfig, DDPSolver
from nmpc_tpu.models.cartpole import make_cartpole_problem
from nmpc_tpu.mpc.closed_loop import make_closed_loop_batch


def main():
    problem = make_cartpole_problem(dt=0.01)
    solver = DDPSolver(problem, DDPConfig(horizon_steps=100, max_iter=3))
    B, n_steps = 4096, 100

    rng = np.random.default_rng(0)
    x0s = jnp.asarray((np.tile([0.0, np.pi, 0.0, 0.0], (B, 1))
                       + 0.2 * rng.normal(size=(B, 4))).astype(np.float32))
    us0 = jnp.zeros((B, 100, 1), jnp.float32)

    sim = make_closed_loop_batch(solver, n_steps=n_steps)
    log = sim(jnp.float32(0.0), x0s, us0)   # compile
    jax.block_until_ready(log)

    start = time.perf_counter()
    log = sim(jnp.float32(0.0), x0s, us0)
    jax.block_until_ready(log)
    wall = time.perf_counter() - start

    thetas = np.abs(((np.asarray(log.xs[:, -1, 1]) + np.pi) % (2 * np.pi))
                    - np.pi)
    print(f"{B} controllers x {n_steps} MPC ticks in {wall:.2f} s "
          f"({B * n_steps / wall:,.0f} controller-ticks/s)")
    print(f"upright after 1 s: {(thetas < 0.5).mean() * 100:.1f}% of fleet")


if __name__ == "__main__":
    main()
