"""Trusted, independent NumPy fp64 DDP implementation for golden-parity tests.

This is deliberately a straight-line, loop-based transcription of the
published iLQG/DDP algorithm (Tassa et al. 2012/2014) with the same
configuration semantics as the reference C++ solver
(``nmpc_ddp/include/nmpc_ddp/DDPSolver.hpp``): LM regularization with retry,
alpha-list backtracking, expected/actual cost-ratio acceptance, and the same
termination rules.  The JAX solver must match its u-trajectories to tight
tolerance (BASELINE.md: 1e-4; in fp64 we check much tighter).

It is test scaffolding only — slow, simple, and easy to audit.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class GoldenConfig:
    horizon_steps: int = 100
    max_iter: int = 500
    reg_type: int = 1
    initial_lambda: float = 1e-4
    initial_dlambda: float = 1.0
    lambda_factor: float = 1.6
    lambda_min: float = 1e-6
    lambda_max: float = 1e10
    k_rel_norm_thre: float = 1e-4
    lambda_thre: float = 1e-5
    cost_update_ratio_thre: float = 0.0
    cost_update_thre: float = 1e-7

    @property
    def alpha_list(self):
        return list(10.0 ** np.linspace(0.0, -3.0, 11))


class GoldenDDP:
    """problem must provide: dt, dynamics(t,x,u), running_cost(t,x,u),
    terminal_cost(t,x), and derivative callables fx_fu(t,x,u),
    lderivs(t,x,u) -> (Lx,Lu,Lxx,Luu,Lxu), vderivs(t,x) -> (Vx,Vxx)."""

    def __init__(self, problem, config: GoldenConfig):
        self.p = problem
        self.c = config

    def rollout(self, t0, x0, us):
        p, N = self.p, self.c.horizon_steps
        xs = [np.asarray(x0, float)]
        costs = []
        for i in range(N):
            t = t0 + i * p.dt
            costs.append(p.running_cost(t, xs[-1], us[i]))
            xs.append(p.dynamics(t, xs[-1], us[i]))
        costs.append(p.terminal_cost(t0 + N * p.dt, xs[-1]))
        return np.array(xs), np.array(costs)

    def backward(self, t0, xs, us, lam):
        p, c, N = self.p, self.c, self.c.horizon_steps
        Vx, Vxx = p.vderivs(t0 + N * p.dt, xs[-1])
        nx = len(Vx)
        dV = np.zeros(2)
        ks, Ks = [None] * N, [None] * N
        for i in reversed(range(N)):
            t = t0 + i * p.dt
            Fx, Fu = p.fx_fu(t, xs[i], us[i])
            Lx, Lu, Lxx, Luu, Lxu = p.lderivs(t, xs[i], us[i])
            Qu = Lu + Fu.T @ Vx
            Qx = Lx + Fx.T @ Vx
            Qux = Lxu.T + Fu.T @ Vxx @ Fx
            Quu = Luu + Fu.T @ Vxx @ Fu
            Qxx = Lxx + Fx.T @ Vxx @ Fx
            Vxx_reg = Vxx + (lam * np.eye(nx) if c.reg_type == 2 else 0.0)
            Qux_reg = Lxu.T + Fu.T @ Vxx_reg @ Fx
            Quu_F = Luu + Fu.T @ Vxx_reg @ Fu
            if c.reg_type == 1:
                Quu_F = Quu_F + lam * np.eye(Quu_F.shape[0])
            try:
                L = np.linalg.cholesky(Quu_F)
            except np.linalg.LinAlgError:
                return None
            k = -np.linalg.solve(Quu_F, Qu)
            K = -np.linalg.solve(Quu_F, Qux_reg)
            dV += np.array([k @ Qu, 0.5 * k @ Quu @ k])
            Vx = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
            Vxx = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx = 0.5 * (Vxx + Vxx.T)
            ks[i], Ks[i] = k, K
        return np.array(ks), np.array(Ks), dV

    def forward(self, t0, xs, us, ks, Ks, alpha):
        p, N = self.p, self.c.horizon_steps
        xs_new = [xs[0]]
        us_new, costs = [], []
        for i in range(N):
            t = t0 + i * p.dt
            u = us[i] + alpha * ks[i] + Ks[i] @ (xs_new[i] - xs[i])
            us_new.append(u)
            costs.append(p.running_cost(t, xs_new[i], u))
            xs_new.append(p.dynamics(t, xs_new[i], u))
        costs.append(p.terminal_cost(t0 + N * p.dt, xs_new[-1]))
        return np.array(xs_new), np.array(us_new), np.array(costs)

    def solve(self, t0, x0, us_init):
        c = self.c
        lam, dlam = c.initial_lambda, c.initial_dlambda
        us = np.array(us_init, float)
        xs, costs = self.rollout(t0, x0, us)
        trace = [dict(iter=0, cost=costs.sum(), lam=lam, dlam=dlam)]
        status = "max_iter"
        n_iter = 0
        for it in range(1, c.max_iter + 1):
            n_iter = it
            # backward with lambda retry
            while True:
                bw = self.backward(t0, xs, us, lam)
                if bw is not None:
                    break
                dlam = max(dlam * c.lambda_factor, c.lambda_factor)
                lam = max(lam * dlam, c.lambda_min)
                if lam > c.lambda_max:
                    return dict(status="fail_backward", xs=xs, us=us,
                                costs=costs, trace=trace, iters=it,
                                lam=lam, dlam=dlam)
            ks, Ks, dV = bw
            k_rel = max(
                np.linalg.norm(ks[i]) / (np.linalg.norm(us[i]) + 1.0)
                for i in range(c.horizon_steps)
            )
            if k_rel < c.k_rel_norm_thre and lam < c.lambda_thre:
                status = "succeeded"
                trace.append(dict(iter=it, k_rel=k_rel))
                break
            # forward line search
            success = False
            for alpha in c.alpha_list:
                xs_c, us_c, costs_c = self.forward(t0, xs, us, ks, Ks, alpha)
                actual = costs.sum() - costs_c.sum()
                expected = -alpha * (dV[0] + alpha * dV[1])
                ratio = (1.0 if actual >= 0 else -1.0) if expected < 0 \
                    else actual / expected
                if ratio > c.cost_update_ratio_thre:
                    success = True
                    break
            if success:
                xs, us, costs = xs_c, us_c, costs_c
                terminate = actual < c.cost_update_thre
                dlam = min(dlam / c.lambda_factor, 1.0 / c.lambda_factor)
                lam = lam * dlam if lam >= c.lambda_min else 0.0
                trace.append(dict(iter=it, cost=costs.sum(), lam=lam,
                                  dlam=dlam, alpha=alpha, k_rel=k_rel,
                                  actual=actual, expected=expected))
                if terminate:
                    status = "succeeded"
                    break
            else:
                dlam = max(dlam * c.lambda_factor, c.lambda_factor)
                lam = max(lam * dlam, c.lambda_min)
                trace.append(dict(iter=it, cost=costs.sum(), lam=lam,
                                  dlam=dlam, alpha=alpha, k_rel=k_rel))
                if lam > c.lambda_max:
                    return dict(status="fail_forward", xs=xs, us=us,
                                costs=costs, trace=trace, iters=it,
                                lam=lam, dlam=dlam)
        return dict(status=status, xs=xs, us=us, costs=costs, trace=trace,
                    iters=n_iter, lam=lam, dlam=dlam)


class NumericalProblem:
    """Adapter building golden-compatible problems from plain callables with
    central finite-difference derivatives (eps 1e-6, like the reference's
    derivative cross-check tests, ``TestDDPCartPole.cpp:609-649``)."""

    def __init__(self, dt, dynamics, running_cost, terminal_cost, nx, nu,
                 eps=1e-6):
        self.dt = dt
        self.dynamics = dynamics
        self.running_cost = running_cost
        self.terminal_cost = terminal_cost
        self.nx, self.nu, self.eps = nx, nu, eps

    def fx_fu(self, t, x, u):
        e = self.eps
        Fx = np.zeros((self.nx, self.nx))
        Fu = np.zeros((self.nx, self.nu))
        for j in range(self.nx):
            d = np.eye(self.nx)[j] * e
            Fx[:, j] = (self.dynamics(t, x + d, u) - self.dynamics(t, x - d, u)) / (2 * e)
        for j in range(self.nu):
            d = np.eye(self.nu)[j] * e
            Fu[:, j] = (self.dynamics(t, x, u + d) - self.dynamics(t, x, u - d)) / (2 * e)
        return Fx, Fu

    def _grad(self, f, z, e):
        g = np.zeros(len(z))
        for j in range(len(z)):
            d = np.eye(len(z))[j] * e
            g[j] = (f(z + d) - f(z - d)) / (2 * e)
        return g

    def lderivs(self, t, x, u):
        e = 1e-5
        Lx = self._grad(lambda z: self.running_cost(t, z, u), x, e)
        Lu = self._grad(lambda z: self.running_cost(t, x, z), u, e)
        Lxx = np.zeros((self.nx, self.nx))
        Luu = np.zeros((self.nu, self.nu))
        Lxu = np.zeros((self.nx, self.nu))
        for j in range(self.nx):
            d = np.eye(self.nx)[j] * e
            Lxx[:, j] = (
                self._grad(lambda z: self.running_cost(t, z, u), x + d, e)
                - self._grad(lambda z: self.running_cost(t, z, u), x - d, e)
            ) / (2 * e)
        for j in range(self.nu):
            d = np.eye(self.nu)[j] * e
            Luu[:, j] = (
                self._grad(lambda z: self.running_cost(t, x, z), u + d, e)
                - self._grad(lambda z: self.running_cost(t, x, z), u - d, e)
            ) / (2 * e)
            Lxu[:, j] = (
                self._grad(lambda z: self.running_cost(t, z, u + d), x, e)
                - self._grad(lambda z: self.running_cost(t, z, u - d), x, e)
            ) / (2 * e)
        return Lx, Lu, Lxx, Luu, Lxu

    def vderivs(self, t, x):
        e = 1e-5
        Vx = self._grad(lambda z: self.terminal_cost(t, z), x, e)
        Vxx = np.zeros((self.nx, self.nx))
        for j in range(self.nx):
            d = np.eye(self.nx)[j] * e
            Vxx[:, j] = (
                self._grad(lambda z: self.terminal_cost(t, z), x + d, e)
                - self._grad(lambda z: self.terminal_cost(t, z), x - d, e)
            ) / (2 * e)
        return Vx, Vxx
