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


def _fmpc_backward_case(break_if_llt_fails):
    from nmpc_tpu.core.types import FmpcConfig, FmpcVariable
    from nmpc_tpu.models.oscillator import make_oscillator_problem
    from nmpc_tpu.solvers import fmpc as F
    from nmpc_tpu.kernels.fmpc_backward_pallas import backward_fmpc_pallas

    p = make_oscillator_problem(0.01)
    N, B = 10, 128
    c = FmpcConfig(horizon_steps=N, max_iter=10,
                   break_if_llt_fails=break_if_llt_fails)
    rng = np.random.default_rng(0)
    f32 = np.float32
    var = FmpcVariable(
        xs=jnp.asarray(rng.normal(size=(N + 1, 2, B)).astype(f32) * 0.3),
        us=jnp.asarray(rng.normal(size=(N, 1, B)).astype(f32) * 0.3),
        lambdas=jnp.asarray(rng.normal(size=(N + 1, 2, B)).astype(f32) * 0.3),
        ss=jnp.asarray(0.2 + rng.uniform(size=(N, 3, B)).astype(f32)),
        nus=jnp.asarray(0.2 + rng.uniform(size=(N, 3, B)).astype(f32)),
    )
    ts = jnp.float32(0.0) + p.dt * jnp.arange(N, dtype=jnp.float32)
    gms = jax.vmap(lambda t: p.ineq_mask_at(t).astype(jnp.float32))(ts)
    eps = jnp.full((B,), 1e-4, jnp.float32)
    co = F._coeffs_bm(p, c, jnp.float32(0.0), var)

    o1 = F._backward_bm(p, c, co, var.ss, var.nus, gms, eps)
    o2 = backward_fmpc_pallas(p, c, co, var.ss, var.nus, gms, eps)
    return o1, o2


@pytest.mark.parametrize("break_if_llt_fails", [False, True])
def test_pallas_fmpc_backward_matches_stacked(interpret_pallas,
                                              break_if_llt_fails):
    """Fused FMPC condensed-Riccati kernel vs the stacked XLA scan
    (solvers/fmpc.py::_backward_bm; reference FmpcSolver.hpp:524-665)."""
    o1, o2 = _fmpc_backward_case(break_if_llt_fails)
    names = ["ks", "Ks", "svecs", "Ps"]
    for name, a, b in zip(names, o1[:4], o2[:4]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-5, err_msg=name)
    assert bool(jnp.all(o1[4] == o2[4]))  # ok_pd
    assert bool(jnp.all(o1[5] == o2[5]))  # finite


def test_pallas_fmpc_solve_batch_end_to_end(interpret_pallas):
    """Full batched PDIP solve with backward_impl='pallas' equals the
    stacked path lane-for-lane (status, iters, all variables)."""
    from nmpc_tpu.core.types import FmpcConfig, fmpc_variable_reset
    from nmpc_tpu.models.oscillator import make_oscillator_problem
    from nmpc_tpu.solvers.fmpc import FmpcSolver

    p = make_oscillator_problem(0.01)
    N, B = 20, 128
    rng = np.random.default_rng(2)
    x0s = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32) * 0.5)
    var1 = fmpc_variable_reset(N, 2, 1, 3, dtype=jnp.float32)
    vars_b = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), var1)
    eps0 = jnp.full((B,), 1e-4, jnp.float32)

    outs = {}
    for impl in ("stacked", "pallas"):
        c = FmpcConfig(horizon_steps=N, max_iter=5, backward_impl=impl)
        outs[impl] = FmpcSolver(p, c).solve_batch(0.0, x0s, vars_b, eps0)

    a, b = outs["stacked"], outs["pallas"]
    assert np.array_equal(np.asarray(a.status), np.asarray(b.status))
    assert np.array_equal(np.asarray(a.iters), np.asarray(b.iters))
    np.testing.assert_allclose(np.asarray(b.variable.us),
                               np.asarray(a.variable.us), atol=1e-4)
    np.testing.assert_allclose(np.asarray(b.kkt_error),
                               np.asarray(a.kkt_error), rtol=2e-2)


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
