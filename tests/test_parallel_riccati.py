"""Parallel (associative-scan) Riccati vs sequential recursion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmpc_tpu.solvers.parallel_riccati import (
    LQRStage,
    solve_lqr_parallel,
    solve_lqr_sequential,
)


def _random_stage(rng, N, nx, nu, affine=True):
    A = jnp.asarray(rng.normal(size=(N, nx, nx)) * 0.3
                    + np.eye(nx)[None])
    B = jnp.asarray(rng.normal(size=(N, nx, nu)) * 0.3)
    c = jnp.asarray(rng.normal(size=(N, nx)) * (0.1 if affine else 0.0))
    W = rng.normal(size=(N, nx, nx)) * 0.3
    Qxx = jnp.asarray(W @ W.transpose(0, 2, 1) + 0.5 * np.eye(nx)[None])
    Wu = rng.normal(size=(N, nu, nu)) * 0.3
    Quu = jnp.asarray(Wu @ Wu.transpose(0, 2, 1) + 1.0 * np.eye(nu)[None])
    Qux = jnp.asarray(rng.normal(size=(N, nu, nx)) * 0.2)
    q = jnp.asarray(rng.normal(size=(N, nx)) * (0.2 if affine else 0.0))
    r = jnp.asarray(rng.normal(size=(N, nu)) * (0.2 if affine else 0.0))
    return LQRStage(A, B, c, Qxx, Quu, Qux, q, r)


@pytest.mark.parametrize("affine", [False, True])
@pytest.mark.parametrize("N", [1, 7, 64, 257])
def test_parallel_matches_sequential(N, affine):
    rng = np.random.default_rng(N)
    nx, nu = 4, 2
    stage = _random_stage(rng, N, nx, nu, affine)
    W = rng.normal(size=(nx, nx))
    S_T = jnp.asarray(W @ W.T + np.eye(nx))
    v_T = jnp.asarray(rng.normal(size=nx) * (1.0 if affine else 0.0))

    Ks_s, ks_s = solve_lqr_sequential(stage, S_T, v_T)
    Ks_p, ks_p, Ss = solve_lqr_parallel(stage, S_T, v_T)

    np.testing.assert_allclose(np.asarray(Ks_p), np.asarray(Ks_s),
                               atol=1e-8, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(ks_p), np.asarray(ks_s),
                               atol=1e-8, rtol=1e-8)


def test_value_matrices_match_rollout():
    """S_0 from the parallel solve equals the cost of simulating the optimal
    policy (quadratic value identity check on a random problem)."""
    rng = np.random.default_rng(0)
    nx, nu, N = 3, 2, 30
    stage = _random_stage(rng, N, nx, nu, affine=True)
    S_T = jnp.eye(nx)
    v_T = jnp.zeros(nx)
    Ks, ks, Ss = solve_lqr_parallel(stage, S_T, v_T)

    x0 = jnp.asarray(rng.normal(size=nx))
    # simulate optimal policy and accumulate cost
    x = x0
    total = 0.0
    for i in range(N):
        u = Ks[i] @ x + ks[i]
        total += (0.5 * x @ stage.Qxx[i] @ x + stage.q[i] @ x
                  + 0.5 * u @ stage.Quu[i] @ u + stage.r[i] @ u
                  + u @ stage.Qux[i] @ x)
        x = stage.A[i] @ x + stage.B[i] @ u + stage.c[i]
    total += 0.5 * x @ S_T @ x

    z0 = jnp.concatenate([x0, jnp.ones(1)])
    value = 0.5 * z0 @ Ss[0] @ z0
    # Ss constant term only defined up to the accumulated scalar offset in
    # the extended parametrization; compare value differences of two states
    x1 = jnp.asarray(rng.normal(size=nx))
    x = x1
    total1 = 0.0
    for i in range(N):
        u = Ks[i] @ x + ks[i]
        total1 += (0.5 * x @ stage.Qxx[i] @ x + stage.q[i] @ x
                   + 0.5 * u @ stage.Quu[i] @ u + stage.r[i] @ u
                   + u @ stage.Qux[i] @ x)
        x = stage.A[i] @ x + stage.B[i] @ u + stage.c[i]
    total1 += 0.5 * x @ S_T @ x
    z1 = jnp.concatenate([x1, jnp.ones(1)])
    value1 = 0.5 * z1 @ Ss[0] @ z1
    np.testing.assert_allclose(float(value - value1), float(total - total1),
                               rtol=1e-7)
