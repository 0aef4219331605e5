"""Device-time measurement that is correct over RPC-tunneled backends.

On tunneled/relayed JAX backends (as well as plain async dispatch),
``jax.block_until_ready`` can return before the computation has actually
executed on the device: it waits for the *dispatch* to be acknowledged, not
for the result buffers to be produced.  Timing loops built on it measure
dispatch overhead, not device time (we measured 8192^3 bf16 matmuls
"completing" at 36 PFLOP/s that way — 180x over v5e peak).

The only reliable fence is a value dependency crossing the host boundary:
fetch a scalar reduced from the outputs.  That costs one host<->device
round trip (~20-25 ms through this environment's tunnel), so:

  * queue ``reps`` executions back-to-back (they serialize on the device),
  * fetch a scalar derived from the last output,
  * subtract the measured round-trip time (median of several trivial
    fetches), and divide by ``reps``.

Sanity anchor: this methodology reproduces the v5e bf16 matmul roofline
(~190 TFLOP/s measured vs 197 peak) where block_until_ready-based timing
was off by two orders of magnitude.
"""

from __future__ import annotations

import statistics
import time
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def _first_elems(leaves):
    """One element per leaf, summed — forces execution of the producing
    computation without paying for full-output reductions."""
    acc = jnp.float32(0.0)
    for l in leaves:
        acc = acc + jnp.ravel(l)[0].astype(jnp.float32)
    return acc


def fence(tree) -> float:
    """Block until ``tree`` is actually computed (value fetch)."""
    leaves = tuple(l for l in jax.tree_util.tree_leaves(tree)
                   if hasattr(l, "dtype") and l.size > 0)
    return float(np.asarray(_first_elems(leaves)))


def measure_rtt(n: int = 7) -> float:
    """Median host<->device round-trip of a trivial fetch [s]."""
    a = jnp.ones((8,), jnp.float32)
    f = jax.jit(jnp.sum)
    _ = float(np.asarray(f(a)))
    ts = []
    for _ in range(n):
        s = time.perf_counter()
        _ = float(np.asarray(f(a)))
        ts.append(time.perf_counter() - s)
    return statistics.median(ts)


def device_time(f: Callable, *args, reps: int = 8, warmup: int = 2,
                rtt: float | None = None) -> float:
    """Per-call device execution time of ``f(*args)`` in seconds.

    Queues ``reps`` identical calls (serialized on device), fences on the
    last output, subtracts the fetch round trip.
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = f(*args)
    fence(out)
    if rtt is None:
        rtt = measure_rtt()
    start = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    fence(out)
    elapsed = time.perf_counter() - start - rtt
    return max(elapsed, 1e-9) / reps


def device_time_min(f: Callable, *args, reps: int = 8, trials: int = 3,
                    warmup: int = 2, min_elapsed: float = 0.25) -> float:
    """Min-of-trials :func:`device_time` (robust to tunnel jitter).

    ``reps`` is auto-scaled so each trial accumulates at least
    ``min_elapsed`` seconds of device work: the RTT subtraction is only
    sound when the measured window dwarfs the RTT jitter (~±2-3 ms through
    the tunnel).  With the old fixed ``reps``, sub-millisecond kernels were
    measured inside a window smaller than the jitter, flipping speedup
    ratios between runs by ±50%.
    """
    rtt = measure_rtt()
    # pilot to estimate per-call time, then scale reps to the target window
    t_pilot = device_time(f, *args, reps=reps, warmup=warmup, rtt=rtt)
    need = int(min(20000, max(reps, -(-min_elapsed // max(t_pilot, 1e-8)))))
    ts = []
    for _ in range(trials):
        ts.append(device_time(f, *args, reps=need, warmup=1, rtt=rtt))
    return min(ts)
