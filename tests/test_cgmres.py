"""C/GMRES solver tests: GMRES kernel, autodiff-vs-analytic Hamiltonian
derivatives, golden parity, closed-loop convergence.

Mirrors the reference tests: ``TestGmres.cpp`` (random systems vs dense
solvers), ``TestCgmresSolver.cpp`` (semiactive damper convergence
``x.norm() < 0.1``), derivative cross-checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nmpc_tpu.solvers.gmres import gmres
from nmpc_tpu.solvers.cgmres import CgmresConfig, CgmresSolver
from nmpc_tpu.models.damper import make_damper_problem
from nmpc_tpu.models.cartpole_cgmres import make_cartpole_cgmres_problem

from golden.cgmres_numpy import DamperGolden, GoldenCgmres


# ---------------------------------------------------------------- GMRES unit

@pytest.mark.parametrize("n", [10, 50, 100])
def test_gmres_random_dense(n):
    """Random dense systems vs numpy.linalg.solve, residual < 1e-10
    (reference ``TestGmres.cpp:98-156``)."""
    rng = np.random.default_rng(n)
    A = rng.normal(size=(n, n)) + n * np.eye(n)
    b = rng.normal(size=n)
    x_true = np.linalg.solve(A, b)
    Aj = jnp.asarray(A)
    res = gmres(lambda v: Aj @ v, jnp.asarray(b), jnp.zeros(n), k_max=n)
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-8)
    r = np.linalg.norm(b - A @ np.asarray(res.x))
    assert r < 1e-10 * np.linalg.norm(b) + 1e-12


def test_gmres_truncated():
    """Truncated k_max (reference tests k_max=20 on n=500): residual
    decreases monotonically and matches the k-step Krylov optimum."""
    n, k = 120, 20
    rng = np.random.default_rng(0)
    A = rng.normal(size=(n, n)) + 0.2 * n * np.eye(n)  # slow convergence
    b = rng.normal(size=n)
    res = gmres(lambda v: jnp.asarray(A) @ v, jnp.asarray(b), jnp.zeros(n),
                k_max=k)
    errs = np.asarray(res.err_history)
    errs = errs[~np.isnan(errs)]
    assert 0 < int(res.iters) <= k
    assert np.all(np.diff(errs) <= 1e-9)  # monotone decrease
    # true residual matches the tracked Givens estimate
    r_true = np.linalg.norm(b - A @ np.asarray(res.x))
    np.testing.assert_allclose(r_true, float(res.residual), rtol=1e-6)


@pytest.mark.parametrize("n", [10, 50, 100])
@pytest.mark.parametrize("make_triangular", [True, False])
@pytest.mark.parametrize("reorth", [True, False])
def test_gmres_variants(n, make_triangular, reorth):
    """All four solver variants — Givens triangularization on/off
    (Kelley Alg. 3.5.1 / 3.4.2) x reorthogonalization on/off — against the
    dense solution, like the reference's variant matrix
    (``TestGmres.cpp:114-155``, ``Gmres.h:170-176``)."""
    rng = np.random.default_rng(100 * n + make_triangular)
    A = rng.normal(size=(n, n)) + n * np.eye(n)
    b = rng.normal(size=n)
    x_true = np.linalg.solve(A, b)
    from nmpc_tpu.solvers.gmres import gmres_dense
    res = gmres_dense(jnp.asarray(A), jnp.asarray(b), jnp.zeros(n), k_max=n,
                      reorth=reorth, make_triangular=make_triangular)
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-8)
    r = np.linalg.norm(b - A @ np.asarray(res.x))
    assert r < 1e-10 * np.linalg.norm(b) + 1e-12


def test_gmres_least_squares_truncated_matches_givens():
    """Truncated runs of the two algorithms produce the same Krylov-optimal
    iterate (they minimize the same least-squares problem)."""
    n, k = 80, 12
    rng = np.random.default_rng(3)
    A = rng.normal(size=(n, n)) + 0.3 * n * np.eye(n)
    b = rng.normal(size=n)
    from nmpc_tpu.solvers.gmres import gmres_dense
    r1 = gmres_dense(jnp.asarray(A), jnp.asarray(b), jnp.zeros(n), k_max=k,
                     make_triangular=True)
    r2 = gmres_dense(jnp.asarray(A), jnp.asarray(b), jnp.zeros(n), k_max=k,
                     make_triangular=False)
    np.testing.assert_allclose(np.asarray(r2.x), np.asarray(r1.x), atol=1e-8)
    # the LS-mode rho is the true residual; the Givens estimate agrees
    np.testing.assert_allclose(float(r2.residual), float(r1.residual),
                               rtol=1e-6)


def test_gmres_warm_start():
    n = 30
    rng = np.random.default_rng(1)
    A = rng.normal(size=(n, n)) + n * np.eye(n)
    b = rng.normal(size=n)
    x_true = np.linalg.solve(A, b)
    x0 = jnp.asarray(x_true + 1e-3 * rng.normal(size=n))
    res = gmres(lambda v: jnp.asarray(A) @ v, jnp.asarray(b), x0, k_max=5)
    assert np.linalg.norm(np.asarray(res.x) - x_true) < 1e-5


# ------------------------------------------- Hamiltonian autodiff derivation

def test_damper_autodiff_matches_analytic():
    """Autodiff costate / dH/du / dphi/dx from the Hamiltonian vs the
    reference's hand-derived expressions."""
    auto = make_damper_problem(analytic=False)
    ana = make_damper_problem(analytic=True)
    rng = np.random.default_rng(2)
    for _ in range(10):
        t = float(rng.uniform(0, 1))
        x = jnp.asarray(rng.normal(size=2))
        uc = jnp.asarray(rng.uniform(0.1, 0.9, size=3))
        lmd = jnp.asarray(rng.normal(size=2))
        np.testing.assert_allclose(
            np.asarray(auto.costate_eq_at(t, lmd, x, uc)),
            np.asarray(ana.costate_eq_at(t, lmd, x, uc)), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(auto.dh_du_at(t, x, uc, lmd)),
            np.asarray(ana.dh_du_at(t, x, uc, lmd)), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(auto.dphi_dx_at(t, x)),
            np.asarray(ana.dphi_dx_at(t, x)), atol=1e-12)


# ----------------------------------------------------------- golden parity

def test_damper_control_steps_match_golden():
    """First 30 closed-loop control steps match the independent NumPy
    implementation (both use forward-Euler horizon + RK4 plant)."""
    problem = make_damper_problem(analytic=True)
    config = CgmresConfig(sim_ode_solver="rk4")
    solver = CgmresSolver(problem, config)

    gp = DamperGolden()
    golden = GoldenCgmres(gp)

    state = solver.setup()
    u_g = golden.setup(0.0, gp.x_initial.copy(), gp.u_initial.copy())
    np.testing.assert_allclose(np.asarray(state.u), u_g, atol=1e-8)

    # plant: RK4 on the damper dynamics
    def rk4(t, x, u, h):
        f = lambda tt, xx: gp.state_eq(tt, xx, u[:2])
        k1 = f(t, x)
        k2 = f(t + h / 2, x + h / 2 * k1)
        k3 = f(t + h / 2, x + h / 2 * k2)
        k4 = f(t + h, x + h * k3)
        return x + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    x = jnp.asarray(gp.x_initial)
    xg = gp.x_initial.copy()
    t = 0.0
    for step in range(30):
        next_xg = rk4(t, xg, np.asarray(state.u), config.dt)
        next_x = jnp.asarray(next_xg)
        state = solver.control_step(t, x, next_x, state)
        ug, err_g = golden.control_step(t, xg, next_xg)
        np.testing.assert_allclose(np.asarray(state.u), ug, atol=1e-7,
                                   err_msg=f"step {step}")
        x, xg = next_x, next_xg
        t += config.dt


# ----------------------------------------------------- closed-loop behavior

def test_damper_simulation_converges():
    """Full 20 s on-device simulation: final ||x|| < 0.1
    (reference ``TestCgmresSolver.cpp:10-18``, sim_duration = 20 s) and input
    bound u1 in [0, u_max] maintained via the dummy-variable encoding."""
    solver = CgmresSolver(make_damper_problem(), CgmresConfig(sim_duration=20.0))
    ts, xs, us, errs = solver.simulate()
    xs = np.asarray(xs)
    us = np.asarray(us)
    assert np.linalg.norm(xs[-1]) < 0.1
    assert us[:, 0].min() >= -1e-6
    assert us[:, 0].max() <= 1.0 + 1e-6
    # optimality error stays bounded and small at the end
    assert np.asarray(errs)[-1] < 1e-2


def test_cartpole_cgmres_unbounded_smoke():
    """Unbounded cart-pole variant: 1 s smoke — finite states, bounded
    optimality error."""
    solver = CgmresSolver(
        make_cartpole_cgmres_problem(with_input_bound=False),
        CgmresConfig(sim_duration=1.0),
    )
    ts, xs, us, errs = solver.simulate()
    assert np.all(np.isfinite(np.asarray(xs)))
    assert np.all(np.isfinite(np.asarray(errs)))


def test_cartpole_cgmres_with_input_bound_swingup():
    """Reference assertion: 20 s sim, final ||x|| < 0.1 with the dummy-input
    force bound (``TestCgmresSolver.cpp:25-28``); |f| <= f_max throughout."""
    solver = CgmresSolver(
        make_cartpole_cgmres_problem(with_input_bound=True),
        CgmresConfig(sim_duration=20.0),
    )
    ts, xs, us, errs = solver.simulate()
    us = np.asarray(us)
    xs = np.asarray(xs)
    assert np.linalg.norm(xs[-1]) < 0.1
    assert np.abs(us[:, 0]).max() <= 100.0 + 1e-3  # |f| <= f_max


def test_use_jvp_mode():
    """Exact-JVP directional products track the FD variant closely."""
    p = make_damper_problem()
    s_fd = CgmresSolver(p, CgmresConfig(sim_duration=0.05))
    s_jvp = CgmresSolver(p, CgmresConfig(sim_duration=0.05, use_jvp=True))
    _, xs1, us1, _ = s_fd.simulate()
    _, xs2, us2, _ = s_jvp.simulate()
    np.testing.assert_allclose(np.asarray(us1), np.asarray(us2), atol=1e-3)


def test_lane_blocked_fleet_matches_vmap():
    """The batch-minor fleet kernel (gmres_bm + batch-minor sweeps) matches
    vmap-of-single control steps per lane."""
    import jax
    problem = make_damper_problem()
    config = CgmresConfig()
    solver = CgmresSolver(problem, config)
    state = solver.setup()
    B = 5
    rng = np.random.default_rng(2)
    xs = jnp.asarray(np.tile([2.0, 0.0], (B, 1))
                     + 0.1 * rng.normal(size=(B, 2)))
    next_xs = xs + 0.001 * rng.normal(size=(B, 2))
    states = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), state)

    out_bm = solver.control_step_batch(0.1, xs, next_xs, states)
    out_vm = solver._step_batch_vmap(jnp.asarray(0.1), xs, next_xs, states)
    for leaf_bm, leaf_vm in zip(out_bm, out_vm):
        np.testing.assert_allclose(np.asarray(leaf_bm), np.asarray(leaf_vm),
                                   atol=1e-9)

    # several chained steps stay in lockstep
    st_bm, st_vm = states, states
    t = 0.1
    for _ in range(5):
        st_bm = solver.control_step_batch(t, xs, next_xs, st_bm)
        st_vm = solver._step_batch_vmap(jnp.asarray(t), xs, next_xs, st_vm)
        t += config.dt
    np.testing.assert_allclose(np.asarray(st_bm.u_list),
                               np.asarray(st_vm.u_list), atol=1e-8)


def test_batched_controllers():
    """Batched control steps / simulations match per-instance results."""
    import jax
    problem = make_damper_problem()
    config = CgmresConfig(sim_duration=0.05)
    solver = CgmresSolver(problem, config)
    state = solver.setup()
    B = 3
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.tile([2.0, 0.0], (B, 1))
                      + 0.1 * rng.normal(size=(B, 2)))
    states = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), state)
    ts_b, xs_b, us_b, errs_b = solver.simulate_batch(0.0, x0s, states, 20)
    for i in range(B):
        ts, xs, us, errs = solver._sim(jnp.asarray(0.0), x0s[i], state,
                                       n_steps=20)
        np.testing.assert_allclose(np.asarray(xs_b[i]), np.asarray(xs),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(us_b[i]), np.asarray(us),
                                   atol=1e-12)


# ------------------------------------------------------- gmres_bm unit tests

def _gmres_bm_vs_single(As, bs, x0s, k_max):
    """Run gmres_bm on the stacked systems and per-lane gmres on each."""
    from nmpc_tpu.solvers.cgmres import gmres_bm

    B = len(As)
    A_b = jnp.asarray(np.stack(As, axis=-1))     # [n, n, B]
    b_b = jnp.asarray(np.stack(bs, axis=-1))     # [n, B]
    x0_b = jnp.asarray(np.stack(x0s, axis=-1))

    def Amul(v):                                  # [n, B] -> [n, B]
        return jnp.einsum("ijb,jb->ib", A_b, v)

    x_bm, iters, rho = gmres_bm(Amul, b_b, x0_b, k_max=k_max)

    xs_single, iters_single = [], []
    for i in range(B):
        A = jnp.asarray(As[i])
        res = gmres(lambda v, A=A: A @ v, jnp.asarray(bs[i]),
                    jnp.asarray(x0s[i]), k_max=k_max)
        xs_single.append(np.asarray(res.x))
        iters_single.append(int(res.iters))
    return (np.asarray(x_bm), np.asarray(iters), np.asarray(rho),
            np.stack(xs_single, axis=-1), np.asarray(iters_single))


def test_gmres_bm_random_dense():
    """Random dense systems, full k_max: parity vs per-lane gmres and
    vs numpy.linalg.solve (TestGmres.cpp:98-156 semantics under batching)."""
    n, B = 12, 5
    rng = np.random.default_rng(3)
    As = [rng.normal(size=(n, n)) + n * np.eye(n) for _ in range(B)]
    bs = [rng.normal(size=n) for _ in range(B)]
    x0s = [np.zeros(n) for _ in range(B)]
    x_bm, _, _, x_single, _ = _gmres_bm_vs_single(As, bs, x0s, k_max=n)
    assert np.isfinite(x_bm).all()
    np.testing.assert_allclose(x_bm, x_single, atol=1e-8)
    for i in range(B):
        np.testing.assert_allclose(x_bm[:, i], np.linalg.solve(As[i], bs[i]),
                                   atol=1e-8)


def test_gmres_bm_truncated():
    """k_max < n (the C/GMRES regime, k_max=5 at CgmresSolver.h:75):
    truncated solutions match per-lane gmres exactly."""
    n, B, k_max = 20, 4, 5
    rng = np.random.default_rng(4)
    As = [rng.normal(size=(n, n)) + 2 * n * np.eye(n) for _ in range(B)]
    bs = [rng.normal(size=n) for _ in range(B)]
    x0s = [0.1 * rng.normal(size=n) for _ in range(B)]
    x_bm, iters, _, x_single, it_single = _gmres_bm_vs_single(
        As, bs, x0s, k_max=k_max)
    assert np.isfinite(x_bm).all()
    np.testing.assert_allclose(x_bm, x_single, atol=1e-8)
    np.testing.assert_array_equal(iters, it_single)


def test_gmres_bm_mixed_convergence():
    """The r2 NaN reproduction: one identity-like lane converging at k=1
    batched with a stiff lane running to k_max.  The early lane's frozen
    Hessenberg block must not poison its back-substitution."""
    n, k_max = 8, 5
    rng = np.random.default_rng(5)
    A_easy = np.eye(n)                                  # converges at k=1
    A_stiff = rng.normal(size=(n, n)) + 3 * np.eye(n)   # runs to k_max
    b = rng.normal(size=n)
    x_bm, iters, rho, x_single, it_single = _gmres_bm_vs_single(
        [A_easy, A_stiff], [b, b], [np.zeros(n)] * 2, k_max=k_max)
    assert np.isfinite(x_bm).all(), "early-converging lane produced NaN"
    np.testing.assert_allclose(x_bm, x_single, atol=1e-8)
    np.testing.assert_array_equal(iters, it_single)
    assert iters[0] == 1 and iters[1] > 1
    np.testing.assert_allclose(x_bm[:, 0], b, atol=1e-10)
