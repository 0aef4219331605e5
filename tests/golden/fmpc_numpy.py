"""Trusted, independent NumPy fp64 FMPC implementation for golden parity.

Straight-line transcription of the DMS + primal-dual interior-point +
Riccati algorithm (Katayama thesis §2.2) with the same configuration
semantics as the reference ``nmpc_fmpc::FmpcSolver``
(``nmpc_fmpc/include/nmpc_fmpc/FmpcSolver.hpp``): barrier update
eps = clamp(0.5 avg(s'nu)), KKT termination with eps=0 complementarity,
condensed Riccati, fraction-to-boundary with margin 0.995, full step
(no line search by default).  Test scaffolding only.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class GoldenFmpcConfig:
    horizon_steps: int = 100
    max_iter: int = 10
    kkt_error_thre: float = 1e-4
    update_barrier_eps: bool = True
    init_complementary_variable: bool = False


class GoldenFmpc:
    """problem must provide: dt, dynamics(t,x,u), running_cost(t,x,u),
    terminal_cost(t,x), ineq(t,x,u), and derivative callables
    fx_fu(t,x,u) -> (A,B), ineq_derivs(t,x,u) -> (C,D),
    lderivs(t,x,u) -> (Lx,Lu,Lxx,Luu,Lxu), vderivs(t,x) -> (Vx,Vxx)."""

    STATUS_SUCCEEDED = 1
    STATUS_MAX_ITER = 5

    def __init__(self, problem, config: GoldenFmpcConfig):
        self.p = problem
        self.c = config
        self.barrier_eps = 1e-4

    def solve(self, t0, x0, var):
        """var: dict with xs [N+1,nx], us [N,nu], lambdas [N+1,nx],
        ss [N,ng], nus [N,ng] (all copied)."""
        p, c = self.p, self.c
        N, dt = c.horizon_steps, p.dt
        xs = var["xs"].copy()
        us = var["us"].copy()
        lams = var["lambdas"].copy()
        ss = var["ss"].copy()
        nus = var["nus"].copy()
        kkt_trace = []
        status = None
        ks = Ks = None

        for it in range(1, c.max_iter + 1):
            if c.update_barrier_eps:
                s_nu_ave = sum(ss[i] @ nus[i] for i in range(N)) / (
                    N * ss.shape[1])
                self.barrier_eps = float(np.clip(0.5 * s_nu_ave, 1e-8, 1e6))
            eps = self.barrier_eps

            # coefficients
            A = np.zeros((N, xs.shape[1], xs.shape[1]))
            B = np.zeros((N, xs.shape[1], us.shape[1]))
            C = np.zeros((N, ss.shape[1], xs.shape[1]))
            D = np.zeros((N, ss.shape[1], us.shape[1]))
            Lxx = np.zeros((N, xs.shape[1], xs.shape[1]))
            Luu = np.zeros((N, us.shape[1], us.shape[1]))
            Lxu = np.zeros((N, xs.shape[1], us.shape[1]))
            Lx = np.zeros((N, xs.shape[1]))
            Lu = np.zeros((N, us.shape[1]))
            x_bar = np.zeros((N, xs.shape[1]))
            g_bar = np.zeros((N, ss.shape[1]))
            Lx_bar = np.zeros((N, xs.shape[1]))
            Lu_bar = np.zeros((N, us.shape[1]))
            for i in range(N):
                t = t0 + i * dt
                A[i], B[i] = p.fx_fu(t, xs[i], us[i])
                C[i], D[i] = p.ineq_derivs(t, xs[i], us[i])
                Lx[i], Lu[i], Lxx[i], Luu[i], Lxu[i] = p.lderivs(t, xs[i], us[i])
                x_bar[i] = p.dynamics(t, xs[i], us[i]) - xs[i + 1]
                g_bar[i] = p.ineq(t, xs[i], us[i]) + ss[i]
                Lx_bar[i] = (-lams[i] + dt * Lx[i] + A[i].T @ lams[i + 1]
                             + C[i].T @ nus[i])
                Lu_bar[i] = dt * Lu[i] + B[i].T @ lams[i + 1] + D[i].T @ nus[i]
            Vx_T, Vxx_T = p.vderivs(t0 + N * dt, xs[N])
            Lx_bar_T = Vx_T - lams[N]

            # KKT error (barrier eps = 0)
            e = np.sum((x0 - xs[0]) ** 2)
            e += np.sum(x_bar**2) + np.sum(g_bar**2)
            e += np.sum(Lx_bar**2) + np.sum(Lu_bar**2)
            e += np.sum(np.maximum(ss * nus, 0.0) ** 2)
            e += np.sum(Lx_bar_T**2)
            kkt = np.sqrt(e)
            kkt_trace.append(kkt)
            if kkt <= c.kkt_error_thre:
                status = self.STATUS_SUCCEEDED
                break

            # backward Riccati
            s_vec = -Lx_bar_T
            P = Vxx_T.copy()
            ks = np.zeros_like(us)
            Ks = np.zeros((N, us.shape[1], xs.shape[1]))
            svs = np.zeros((N + 1, xs.shape[1]))
            Ps = np.zeros((N + 1, xs.shape[1], xs.shape[1]))
            svs[N], Ps[N] = s_vec, P
            for i in reversed(range(N)):
                nu_s = nus[i] / ss[i]
                tilde_sub = nu_s * g_bar[i] - nus[i] + eps / ss[i]
                Qxx_t = dt * Lxx[i] + C[i].T @ np.diag(nu_s) @ C[i]
                Quu_t = dt * Luu[i] + D[i].T @ np.diag(nu_s) @ D[i]
                Qxu_t = dt * Lxu[i] + C[i].T @ np.diag(nu_s) @ D[i]
                Lx_t = Lx_bar[i] + C[i].T @ tilde_sub
                Lu_t = Lu_bar[i] + D[i].T @ tilde_sub
                F = Qxx_t + A[i].T @ P @ A[i]
                Hm = Qxu_t + A[i].T @ P @ B[i]
                G = Quu_t + B[i].T @ P @ B[i]
                rhs = B[i].T @ (P @ x_bar[i] - s_vec) + Lu_t
                ks[i] = -np.linalg.solve(G, rhs)
                Ks[i] = -np.linalg.solve(G, Hm.T)
                s_vec = A[i].T @ (s_vec - P @ x_bar[i]) - Lx_t - Hm @ ks[i]
                P = F - Ks[i].T @ G @ Ks[i]
                P = 0.5 * (P + P.T)
                svs[i], Ps[i] = s_vec, P

            # forward
            dxs = np.zeros_like(xs)
            dus = np.zeros_like(us)
            dlams = np.zeros_like(lams)
            dxs[0] = x0 - xs[0]
            for i in range(N + 1):
                dlams[i] = Ps[i] @ dxs[i] - svs[i]
                if i < N:
                    dus[i] = Ks[i] @ dxs[i] + ks[i]
                    dxs[i + 1] = A[i] @ dxs[i] + B[i] @ dus[i] + x_bar[i]
            dss = np.zeros_like(ss)
            dnus = np.zeros_like(nus)
            for i in range(N):
                dss[i] = -(C[i] @ dxs[i] + D[i] @ dus[i] + g_bar[i])
                dnus[i] = -(nus[i] * (dss[i] + ss[i]) - eps) / ss[i]

            # fraction-to-boundary
            alpha_s = alpha_nu = 1.0
            for i in range(N):
                for j in range(ss.shape[1]):
                    if dss[i, j] < 0:
                        alpha_s = min(alpha_s, -0.995 * ss[i, j] / dss[i, j])
                    if dnus[i, j] < 0:
                        alpha_nu = min(alpha_nu, -0.995 * nus[i, j] / dnus[i, j])

            xs += alpha_s * dxs
            us += alpha_s * dus
            lams += alpha_nu * dlams
            ss += alpha_s * dss
            nus += alpha_nu * dnus

        if status is None:
            status = self.STATUS_MAX_ITER
        return dict(status=status, xs=xs, us=us, lambdas=lams, ss=ss,
                    nus=nus, kkt_trace=kkt_trace, iters=it, ks=ks, Ks=Ks,
                    barrier_eps=self.barrier_eps)


class OscillatorGolden:
    """Van der Pol with analytic derivatives (TestFmpcOscillator.cpp:18-135)."""

    def __init__(self, dt):
        self.dt = dt

    def dynamics(self, t, x, u):
        xdot = np.array([(1.0 - x[1] ** 2) * x[0] - x[1] + u[0], x[0]])
        return x + self.dt * xdot

    def running_cost(self, t, x, u):
        return 0.5 * (x @ x + u @ u)

    def terminal_cost(self, t, x):
        return 0.0

    def ineq(self, t, x, u):
        return np.array([-x[1] - 0.05, -u[0] - 1.0, u[0] - 0.9])

    def fx_fu(self, t, x, u):
        A = np.eye(2) + self.dt * np.array(
            [[1.0 - x[1] ** 2, -2.0 * x[0] * x[1] - 1.0], [1.0, 0.0]])
        B = self.dt * np.array([[1.0], [0.0]])
        return A, B

    def ineq_derivs(self, t, x, u):
        C = np.array([[0.0, -1.0], [0.0, 0.0], [0.0, 0.0]])
        D = np.array([[0.0], [-1.0], [1.0]])
        return C, D

    def lderivs(self, t, x, u):
        return x.copy(), u.copy(), np.eye(2), np.eye(1), np.zeros((2, 1))

    def vderivs(self, t, x):
        return np.zeros(2), np.zeros((2, 2))
