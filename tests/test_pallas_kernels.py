"""Pallas kernel parity tests (interpreter mode on CPU; the compiled path
is exercised on real TPU hardware by the benchmark suite)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl


@pytest.fixture()
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))


def test_pallas_backward_matches_stacked(interpret_pallas):
    from nmpc_tpu.core.types import DDPConfig
    from nmpc_tpu.models.cartpole import make_cartpole_problem
    from nmpc_tpu.solvers import ddp as D
    from nmpc_tpu.kernels.ddp_backward import backward_stacked, stack_derivs
    import nmpc_tpu.kernels.ddp_backward_pallas as P

    p = make_cartpole_problem(0.01)
    c = DDPConfig(horizon_steps=12, max_iter=10)
    B = 256
    rng = np.random.default_rng(0)
    x0s = jnp.asarray((np.tile([0.0, np.pi, 0.0, 0.0], (B, 1))
                       + 0.05 * rng.normal(size=(B, 4))).astype(np.float32))
    us = jnp.asarray(rng.normal(size=(B, 12, 1)).astype(np.float32) * 0.2)
    xs, _ = D._rollout_stacked(p, c, 0.0, x0s, us)
    Ds, VxT, VxxT = jax.vmap(
        functools.partial(D._derivative_sweep, p, c),
        in_axes=(None, 0, 0))(0.0, xs, us)
    S = stack_derivs(Ds.Fx, Ds.Fu, Ds.Lx, Ds.Lu, Ds.Lxx, Ds.Luu, Ds.Lxu)
    VxTs = jnp.moveaxis(VxT, 0, -1)
    VxxTs = jnp.moveaxis(VxxT, 0, -1)
    lam = jnp.full((B,), 1e-4, jnp.float32)

    o1 = backward_stacked(c, S, VxTs, VxxTs, lam)
    o2 = P.backward_pallas(c, S, VxTs, VxxTs, lam)
    np.testing.assert_allclose(np.asarray(o2[0]), np.asarray(o1[0]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(o2[1]), np.asarray(o1[1]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(o2[2]), np.asarray(o1[2]),
                               atol=2e-4)
    assert bool(jnp.all(o1[3] == o2[3]))


def test_pallas_backward_reg_type2(interpret_pallas):
    from nmpc_tpu.core.types import DDPConfig
    from nmpc_tpu.models.cartpole import make_cartpole_problem
    from nmpc_tpu.solvers import ddp as D
    from nmpc_tpu.kernels.ddp_backward import backward_stacked, stack_derivs
    import nmpc_tpu.kernels.ddp_backward_pallas as P

    p = make_cartpole_problem(0.01)
    c = DDPConfig(horizon_steps=6, max_iter=10, reg_type=2)
    B = 128
    rng = np.random.default_rng(1)
    x0s = jnp.asarray((np.tile([0.0, np.pi, 0.0, 0.0], (B, 1))
                       + 0.05 * rng.normal(size=(B, 4))).astype(np.float32))
    us = jnp.asarray(rng.normal(size=(B, 6, 1)).astype(np.float32) * 0.2)
    xs, _ = D._rollout_stacked(p, c, 0.0, x0s, us)
    Ds, VxT, VxxT = jax.vmap(
        functools.partial(D._derivative_sweep, p, c),
        in_axes=(None, 0, 0))(0.0, xs, us)
    S = stack_derivs(Ds.Fx, Ds.Fu, Ds.Lx, Ds.Lu, Ds.Lxx, Ds.Luu, Ds.Lxu)
    lam = jnp.full((B,), 0.5, jnp.float32)
    o1 = backward_stacked(c, S, jnp.moveaxis(VxT, 0, -1),
                          jnp.moveaxis(VxxT, 0, -1), lam)
    o2 = P.backward_pallas(c, S, jnp.moveaxis(VxT, 0, -1),
                           jnp.moveaxis(VxxT, 0, -1), lam)
    np.testing.assert_allclose(np.asarray(o2[0]), np.asarray(o1[0]),
                               atol=2e-5)
