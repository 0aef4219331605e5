"""Device mesh construction and sharded batch solving.

The reference has **zero parallelism** — every solver is a single-threaded
loop (SURVEY.md §2.5; e.g. ``DDPSolver.hpp:367``).  This module is the
TPU-native replacement for what would be a NCCL/MPI backend in a GPU port:
a `jax.sharding.Mesh` over the chips, `NamedSharding` annotations on the
batch axis, and XLA collectives over ICI/DCN for reductions.  No hand-rolled
communication — mesh + shardings are the deliverable.

Axes
----
``dp``  — data/scenario parallelism: batch of independent solves sharded
          across chips (the dominant axis for MPC workloads).
``sp``  — reserved sequence/horizon axis for the parallel-in-time Riccati
          components (solvers/parallel_riccati.py); size 1 for stock solves.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Multi-host launcher: initialize the JAX distributed runtime so that
    ``jax.devices()`` spans every host's chips and meshes/collectives ride
    ICI within a slice and DCN across slices (SURVEY §2.5).

    On single-host (or already-initialized) setups this is a no-op.  On a
    pod slice, call once per process before building meshes; arguments
    default to the cluster environment (TPU metadata / env vars).
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # single-process environment: nothing to initialize
        pass


def make_mesh(
    devices: Optional[Sequence] = None,
    dp: Optional[int] = None,
    sp: int = 1,
) -> Mesh:
    """Build a (dp, sp) mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // sp
    assert dp * sp == n, f"dp*sp={dp * sp} must equal device count {n}"
    dev_array = np.array(devices).reshape(dp, sp)
    return Mesh(dev_array, axis_names=("dp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays whose leading axis is the solve batch."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of batch-leading arrays onto the mesh, sharded on dp."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def make_sharded_solve(solver, mesh: Mesh):
    """jit the solver's batched solve with batch sharded over ``dp``.

    XLA inserts the (trivially parallel) partitioning; collective reductions
    only appear in cross-batch statistics (see ``convergence_stats``).
    Returns solve(t0, x0s [B,nx], us0s [B,N,nu]) with B divisible by dp.
    """
    sh = batch_sharding(mesh)
    return jax.jit(
        solver.raw_solve_batch,
        in_shardings=(None, sh, sh),
        out_shardings=sh,
    )


def convergence_stats(mesh: Mesh, result):
    """Global success-rate / mean-iteration statistics with an explicit
    psum over the ``dp`` axis (shard_map), exercising ICI collectives —
    the batched analog of the reference's per-solve status reporting."""
    import jax.numpy as jnp
    from jax import shard_map

    def local_stats(status, iters):
        n = jnp.asarray(status.shape[0], jnp.float32)
        succ = jnp.sum((status == 1).astype(jnp.float32))
        it_sum = jnp.sum(iters.astype(jnp.float32))
        stats = jnp.stack([n, succ, it_sum])
        return jax.lax.psum(stats, axis_name="dp")

    f = shard_map(
        local_stats,
        mesh=mesh,
        in_specs=(P("dp"), P("dp")),
        out_specs=P(),
    )
    total, succ, it_sum = f(result.status, result.iters)
    return {
        "n": total,
        "success_rate": succ / total,
        "mean_iters": it_sum / total,
    }
