"""C/GMRES real-time NMPC solver (Ohtsuka's continuation method), TPU-native.

Algorithmic equivalent of the reference ``nmpc_cgmres::CgmresSolver``
(``nmpc_cgmres/src/CgmresSolver.cpp``; Ohtsuka, Automatica 2004):

  * setup: initial input from Newton iterations with GMRES on
    dH/du = 0 (``CgmresSolver.cpp:8-64``),
  * shrinking -> steady horizon T(t) = T_s (1 - e^{-alpha t})
    (``CgmresSolver.cpp:151``),
  * per control step: forward state rollout over the horizon, backward
    costate integration, dH/du per division (``CgmresSolver.cpp:146-183``),
  * continuation linear system b = ((1 - zeta*dlt) DhDu - DhDu(t+dlt))/dlt
    solved matrix-free by GMRES with finite-difference directional products
    (``CgmresSolver.cpp:111-143, 186-202``), warm-started from the previous
    step's solution,
  * integration of u̇ into the input trajectory (``CgmresSolver.cpp:137-140``).

TPU-first: the whole control step (2 + k_max GMRES iterations, each a full
horizon sweep) fuses into ONE jitted XLA computation; horizon sweeps are
``lax.scan``; the closed-loop simulation is available as a host loop
(:meth:`run`) or a fully-on-device ``lax.scan`` (:meth:`simulate`) for
batched/benchmark use.  Optionally the finite-difference directional
products can use exact JVPs (``use_jvp=True``) — an honest improvement the
continuation math allows (the reference is FD-only).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from nmpc_tpu.core.integrators import INTEGRATORS
from nmpc_tpu.core.problem import ContinuousProblem
from nmpc_tpu.solvers.gmres import gmres


@dataclasses.dataclass(frozen=True)
class CgmresConfig:
    """Parameters of the C/GMRES method, defaults matching the reference
    (``nmpc_cgmres/include/nmpc_cgmres/CgmresSolver.h:66-79``)."""

    sim_duration: float = 10.0
    steady_horizon_duration: float = 1.0
    horizon_divide_num: int = 25
    horizon_increase_ratio: float = 0.5
    dt: float = 0.001
    eq_zeta: float = 1000.0
    k_max: int = 5
    finite_diff_delta: float = 0.002
    ode_solver: str = "euler"        # horizon integration (reference: Euler)
    sim_ode_solver: str = "rk4"      # plant simulation (tests use RK4)
    use_jvp: bool = False            # exact JVPs instead of finite differences
    setup_newton_iters: int = 100    # CgmresSolver.cpp:31
    setup_tol: float = 1e-6
    # host-loop diagnostics gate (the reference streams progress to stdout
    # and /tmp dumps from run(), CgmresSolver.cpp:66-103)
    print_level: int = 0
    # every dump_step-th control step is written by run(dump_prefix=...)
    dump_step: int = 1


class CgmresState(NamedTuple):
    """Carry across control steps (the reference's mutable members)."""

    u_list: jnp.ndarray       # [N, dim_uc] input trajectory over horizon
    delta_u_vec: jnp.ndarray  # [N * dim_uc] GMRES warm start
    u: jnp.ndarray            # [dim_uc] current input
    err: jnp.ndarray          # ||dH/du|| optimality error


class CgmresSolver:
    def __init__(self, problem: ContinuousProblem,
                 config: CgmresConfig = CgmresConfig()):
        self.problem = problem
        self.config = config
        self._setup = jax.jit(functools.partial(_setup, problem, config))
        self._step = jax.jit(functools.partial(_control_step, problem, config))
        self._sim = jax.jit(functools.partial(_simulate, problem, config),
                            static_argnames=("n_steps",))
        # batched controllers: vmap over (x, next_x, state) / (x0, state)
        self._step_batch = jax.jit(jax.vmap(
            functools.partial(_control_step, problem, config),
            in_axes=(None, 0, 0, 0)))
        def _sim_batch(t0, x0s, states, n_steps):
            return jax.vmap(
                lambda x0, st: _simulate(problem, config, t0, x0, st,
                                         n_steps=n_steps))(x0s, states)

        self._sim_batch = jax.jit(_sim_batch, static_argnames=("n_steps",))

    def setup(self, t0=0.0, x0=None, u0=None) -> CgmresState:
        """Initial input via Newton+GMRES on dH/du = 0
        (``CgmresSolver::setup``, ``CgmresSolver.cpp:8-64``)."""
        x0 = self.problem.x_initial if x0 is None else x0
        u0 = self.problem.u_initial if u0 is None else u0
        return self._setup(jnp.asarray(t0, jnp.asarray(x0).dtype),
                           jnp.asarray(x0), jnp.asarray(u0))

    def control_step(self, t, x, next_x, state: CgmresState) -> CgmresState:
        """One ``calcControlInput`` (``CgmresSolver.cpp:111-143``)."""
        return self._step(t, x, next_x, state)

    def control_step_batch(self, t, xs, next_xs, states) -> CgmresState:
        """Batched continuation updates for many controllers at once
        (state leaves and x arrays carry a leading batch axis)."""
        return self._step_batch(t, xs, next_xs, states)

    def simulate_batch(self, t0, x0s, states, n_steps: int):
        """Batched on-device closed-loop simulations."""
        return self._sim_batch(jnp.asarray(t0, x0s.dtype), x0s, states,
                               n_steps)

    def simulate(self, t0=0.0, x0=None, n_steps: Optional[int] = None):
        """Fully-on-device closed-loop simulation (``CgmresSolver::run``,
        ``CgmresSolver.cpp:66-109``). Returns (ts, xs, us, errs)."""
        x0 = self.problem.x_initial if x0 is None else x0
        if n_steps is None:
            n_steps = int(round(self.config.sim_duration / self.config.dt)) + 1
        state = self.setup(t0, x0)
        return self._sim(jnp.asarray(t0, jnp.asarray(x0).dtype),
                         jnp.asarray(x0), state, n_steps=n_steps)

    def run(self, t0=0.0, x0=None, callback=None, dump_prefix=None):
        """Host-loop variant of :meth:`simulate` with per-step callback.

        ``dump_prefix`` (e.g. ``"/tmp/cgmres"``) streams
        ``{prefix}_{x,u,err,param}.dat`` in the reference's format
        (``CgmresSolver::run``, ``CgmresSolver.cpp:68-103``).
        """
        import numpy as np

        cfg = self.config
        x0 = self.problem.x_initial if x0 is None else x0
        x = jnp.asarray(x0)
        state = self.setup(t0, x)
        sim_f = INTEGRATORS[cfg.sim_ode_solver]
        f = lambda t, x, u: self.problem.state_eq(t, x, u[: self.problem.dim_u])
        ts, xs, us, errs = [], [], [], []
        t = t0
        n = int(round(cfg.sim_duration / cfg.dt)) + 1
        for i in range(n):
            next_x = sim_f(f, t, x, state.u, cfg.dt)
            state = self.control_step(t, x, next_x, state)
            ts.append(t)
            xs.append(np.asarray(x))
            us.append(np.asarray(state.u))
            errs.append(float(state.err))
            if cfg.print_level >= 3 and i % max(cfg.dump_step, 1) == 0:
                print(f"[CGMRES] t {t:.4f}: err {float(state.err):.6e}")
            if callback is not None:
                callback(t, x, state)
            x = next_x
            t += cfg.dt
        out = (np.asarray(ts), np.stack(xs), np.stack(us), np.asarray(errs))
        if dump_prefix is not None:
            from nmpc_tpu.utils.trace import dump_cgmres_data

            dump_cgmres_data(*out, prefix=dump_prefix,
                             dump_step=cfg.dump_step,
                             log_dt=cfg.dt * cfg.dump_step)
        return out


# --------------------------------------------------------------------------


def _calc_dhdu_list(problem: ContinuousProblem, config: CgmresConfig,
                    t, x, u_list):
    """Horizon sweep: forward states, backward costates, dH/du per division
    (``CgmresSolver::calcDhDuList``, ``CgmresSolver.cpp:146-183``)."""
    N = config.horizon_divide_num
    dtype = x.dtype
    ode = INTEGRATORS[config.ode_solver]
    f = lambda tau, xx, uc: problem.state_eq(tau, xx, uc[: problem.dim_u])

    T = config.steady_horizon_duration * (
        1.0 - jnp.exp(-config.horizon_increase_ratio * t))
    h = T / N

    taus = t + h * jnp.arange(N, dtype=dtype)

    def fwd(xx, tu):
        tau, u = tu
        xn = ode(f, tau, xx, u, h)
        return xn, xn

    xN, xs_tail = lax.scan(fwd, x, (taus, u_list))
    xs = jnp.concatenate([x[None], xs_tail], axis=0)  # [N+1, dim_x]

    lmd_N = problem.dphi_dx_at(t + T, xs[N])

    # backward costate integration at time tau_{i+1}, step -h, with (x_i, u_i)
    # (CgmresSolver.cpp:171-179)
    costate = lambda tau, lmd, xu: problem.costate_eq_at(
        tau, lmd, xu[: problem.dim_x], xu[problem.dim_x:])

    def bwd(lmd_next, inp):
        tau_next, xx, u = inp
        xu = jnp.concatenate([xx, u])
        lmd = ode(costate, tau_next, lmd_next, xu, -h)
        return lmd, lmd_next  # emit lambda_{i+1} for the DhDu eval

    taus_next = t + h * (1.0 + jnp.arange(N, dtype=dtype))
    _, lmd_next_list = lax.scan(bwd, lmd_N, (taus_next, xs[:-1], u_list),
                                reverse=True)

    # DhDu_i at (tau_i, x_i, u_i, lambda_{i+1}) (CgmresSolver.cpp:182)
    dhdu = jax.vmap(problem.dh_du_at)(taus, xs[:-1], u_list, lmd_next_list)
    return dhdu  # [N, dim_uc]


def _control_step(problem: ContinuousProblem, config: CgmresConfig,
                  t, x, next_x, state: CgmresState) -> CgmresState:
    """One continuation update (``CgmresSolver::calcControlInput``,
    ``CgmresSolver.cpp:111-143``)."""
    N = config.horizon_divide_num
    dlt = config.finite_diff_delta
    dt = config.dt
    u_list = state.u_list

    dhdu = _calc_dhdu_list(problem, config, t, x, u_list)

    t_wd = t + dlt
    x_wd = (1.0 - dlt / dt) * x + (dlt / dt) * next_x
    dhdu_wd = _calc_dhdu_list(problem, config, t_wd, x_wd, u_list)

    b = ((1.0 - config.eq_zeta * dlt) * dhdu.ravel() - dhdu_wd.ravel()) / dlt

    if config.use_jvp:
        # exact directional derivative of u_list -> DhDu_list at (t_wd, x_wd)
        def F(ul):
            return _calc_dhdu_list(problem, config, t_wd, x_wd, ul).ravel()

        def Amul(v):
            return jax.jvp(F, (u_list,), (v.reshape(N, -1),))[1]
    else:
        def Amul(v):
            ul = u_list + dlt * v.reshape(N, -1)
            dh = _calc_dhdu_list(problem, config, t_wd, x_wd, ul)
            return (dh.ravel() - dhdu_wd.ravel()) / dlt

    sol = gmres(Amul, b, state.delta_u_vec, k_max=config.k_max, eps=1e-10)

    u_list_new = u_list + dt * sol.x.reshape(N, -1)
    return CgmresState(
        u_list=u_list_new,
        delta_u_vec=sol.x,
        u=u_list_new[0],
        err=jnp.linalg.norm(dhdu),
    )


def _setup(problem: ContinuousProblem, config: CgmresConfig, t0, x0, u0
           ) -> CgmresState:
    """Initial input via Newton + GMRES (``CgmresSolver::setup``,
    ``CgmresSolver.cpp:8-64``)."""
    N = config.horizon_divide_num
    dlt = config.finite_diff_delta
    dtype = x0.dtype

    lmd0 = problem.dphi_dx_at(t0, x0)

    def newton_cond(carry):
        u, it, err = carry
        return (err > config.setup_tol) & (it < config.setup_newton_iters)

    def newton_body(carry):
        u, it, _ = carry
        dhdu = problem.dh_du_at(t0, x0, u, lmd0)

        def Amul(v):
            d = problem.dh_du_at(t0, x0, u + dlt * v, lmd0)
            return (d - dhdu) / dlt

        sol = gmres(Amul, -dhdu, jnp.zeros_like(u), k_max=problem.dim_uc,
                    eps=1e-10)
        u_new = u + sol.x
        err_new = jnp.linalg.norm(problem.dh_du_at(t0, x0, u_new, lmd0))
        return (u_new, it + 1, err_new)

    err0 = jnp.linalg.norm(problem.dh_du_at(t0, x0, u0, lmd0))
    u, _, err = lax.while_loop(newton_cond, newton_body,
                               (jnp.asarray(u0, dtype), jnp.int32(0), err0))

    u_list = jnp.tile(u[None], (N, 1))
    return CgmresState(
        u_list=u_list,
        delta_u_vec=jnp.zeros((N * problem.dim_uc,), dtype),
        u=u,
        err=err,
    )


def _simulate(problem: ContinuousProblem, config: CgmresConfig,
              t0, x0, state: CgmresState, *, n_steps: int):
    """Closed-loop simulation as one on-device scan (``CgmresSolver::run``)."""
    sim_f = INTEGRATORS[config.sim_ode_solver]
    f = lambda t, x, u: problem.state_eq(t, x, u[: problem.dim_u])

    def step(carry, i):
        t, x, st = carry
        next_x = sim_f(f, t, x, st.u, config.dt)
        st = _control_step(problem, config, t, x, next_x, st)
        return (t + config.dt, next_x, st), (t, x, st.u, st.err)

    (_, _, _), (ts, xs, us, errs) = lax.scan(
        step, (t0, x0, state), jnp.arange(n_steps))
    return ts, xs, us, errs
