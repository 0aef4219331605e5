"""Multi-device sharding tests on the 8-way virtual CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np

from nmpc_tpu import DDPConfig, DDPSolver
from nmpc_tpu.models.cartpole import make_cartpole_problem
from nmpc_tpu.parallel.mesh import (
    batch_sharding,
    convergence_stats,
    make_mesh,
    make_sharded_solve,
    shard_batch,
)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("dp", "sp")


def test_sharded_solve_matches_local():
    problem = make_cartpole_problem(0.01)
    solver = DDPSolver(problem, DDPConfig(horizon_steps=30, max_iter=10))
    mesh = make_mesh()
    B = 16
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.stack([[0.0, np.pi, 0.0, 0.0]] * B) + 0.1 * rng.normal(size=(B, 4))
    )
    us0 = jnp.zeros((B, 30, 1))
    x0s_sh, us0_sh = shard_batch(mesh, (x0s, us0))
    sharded = make_sharded_solve(solver, mesh)
    res_sh = sharded(0.0, x0s_sh, us0_sh)
    res_local = solver.solve_batch(0.0, x0s, us0)
    np.testing.assert_allclose(
        np.asarray(res_sh.us), np.asarray(res_local.us), atol=1e-10
    )
    np.testing.assert_array_equal(
        np.asarray(res_sh.status), np.asarray(res_local.status)
    )
    # outputs actually sharded over dp
    assert res_sh.us.sharding.spec == batch_sharding(mesh).spec


def test_convergence_stats_psum():
    problem = make_cartpole_problem(0.01)
    solver = DDPSolver(problem, DDPConfig(horizon_steps=30, max_iter=10))
    mesh = make_mesh()
    B = 8
    x0s = jnp.asarray(np.stack([[0.0, np.pi, 0.0, 0.0]] * B))
    us0 = jnp.zeros((B, 30, 1))
    res = make_sharded_solve(solver, mesh)(0.0, *shard_batch(mesh, (x0s, us0)))
    stats = convergence_stats(mesh, res)
    assert float(stats["n"]) == B
    assert 0.0 <= float(stats["success_rate"]) <= 1.0
