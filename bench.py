"""Benchmark: batched cart-pole DDP solves/s on one chip.

BASELINE.md target: >= 10,000 batched DDP cart-pole solves/s/chip
(state 4, input 1, horizon 100), u-trajectories matching the reference
algorithm (golden-parity enforced separately in tests/).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing methodology (benchmarks/timing.py): queue repetitions back-to-back
and fence on a VALUE FETCH from the last output, subtracting the measured
host<->device round trip.  ``jax.block_until_ready`` is not a reliable
execution fence through this environment's device tunnel (it acknowledges
dispatch, not completion) — naive timing loops built on it were off by
large factors in both directions.
"""

import json

import numpy as np
import jax.numpy as jnp

from nmpc_tpu import DDPConfig, DDPSolver
from nmpc_tpu.models.cartpole import make_cartpole_problem

BASELINE_SOLVES_PER_S = 10_000.0


def main():
    import jax

    from benchmarks.timing import device_time_min

    # On-chip pallas-vs-stacked parity gate (VERDICT r3 item #2): rounds 2
    # and 3 each shipped a default fast path whose compiled kernel diverged
    # from the stacked reference path; this asserts, on the real chip and
    # BEFORE timing, that every default Pallas kernel matches the stacked
    # kernel at the bench shapes, and records pass/fail + max-err in the
    # bench JSON the driver archives every round.
    parity = None
    if jax.default_backend() == "tpu":
        from benchmarks.parity_gate import run_parity_gate

        try:
            parity = run_parity_gate()
        except Exception as e:  # noqa: BLE001
            parity = {"pass": False, "error": repr(e)[:300]}
        if not parity.get("pass", False):
            # STRUCTURAL gate (VERDICT r4 weak #3): a red parity gate
            # refuses the headline — no perf number is printed and the
            # process exits nonzero, so a divergent default kernel fails
            # the round loudly instead of hiding in a JSON field.
            print(json.dumps({
                "metric": "ddp_cartpole_solves_per_s_per_chip",
                "error": "parity gate FAILED — headline refused",
                "parity": parity,
            }))
            raise SystemExit(1)

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

    # reps=24: at >1M solves/s a 6-rep window (~19 ms) is smaller than the
    # ~23 ms tunnel RTT being subtracted and produced ±50% outliers
    # (BENCH_RESULTS.md round-5 methodology note); 24 reps ≈ 75 ms.
    t = device_time_min(solver.solve_batch, t0, x0s, us0, reps=24, trials=3)
    solves_per_s = B / t
    out = {
        "metric": "ddp_cartpole_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 3),
    }
    if parity is not None:
        out["parity"] = parity
    print(json.dumps(out))


if __name__ == "__main__":
    main()
