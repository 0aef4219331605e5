"""Trusted, independent NumPy fp64 C/GMRES implementation for golden parity.

Straight-line transcription of Ohtsuka's continuation/GMRES method with the
same parameterization as the reference ``nmpc_cgmres::CgmresSolver``
(``nmpc_cgmres/src/CgmresSolver.cpp``): shrinking horizon, forward-Euler
horizon rollout, backward costate integration, FD continuation system,
plain restarted-free GMRES (standard textbook implementation with full
Arnoldi + least squares — intentionally a *different* GMRES realization than
the framework's Givens version, so agreement validates both).
"""

from __future__ import annotations

import numpy as np


def gmres_np(Amul, b, x0, k_max, eps=1e-10):
    """Textbook GMRES via Arnoldi + dense least squares."""
    n = len(b)
    k_max = min(k_max, n)
    r = b - Amul(x0)
    rho = np.linalg.norm(r)
    b_norm = np.linalg.norm(b)
    if rho <= eps * b_norm or rho == 0.0:
        return x0.copy()
    V = [r / rho]
    H = np.zeros((k_max + 1, k_max))
    k = 0
    while k < k_max and rho > eps * b_norm:
        w = Amul(V[k])
        for j in range(k + 1):
            H[j, k] = w @ V[j]
            w = w - H[j, k] * V[j]
        H[k + 1, k] = np.linalg.norm(w)
        V.append(w / H[k + 1, k] if H[k + 1, k] > 0 else w)
        k += 1
        e1 = np.zeros(k + 1)
        e1[0] = rho0 = np.linalg.norm(r)
        y, *_ = np.linalg.lstsq(H[: k + 1, :k], e1, rcond=None)
        rho = np.linalg.norm(e1 - H[: k + 1, :k] @ y)
    x = x0.copy()
    for i in range(k):
        x = x + y[i] * V[i]
    return x


class GoldenCgmres:
    """problem must provide: dim_x, dim_u, dim_c, dim_uc, state_eq(t,x,u),
    costate_eq(t,lmd,x,uc), dphi_dx(t,x), dh_du(t,x,uc,lmd),
    x_initial, u_initial (NumPy)."""

    def __init__(self, problem, steady_horizon=1.0, divide_num=25,
                 increase_ratio=0.5, dt=1e-3, zeta=1000.0, k_max=5,
                 fd_delta=0.002):
        self.p = problem
        self.Ts = steady_horizon
        self.N = divide_num
        self.alpha = increase_ratio
        self.dt = dt
        self.zeta = zeta
        self.k_max = k_max
        self.dlt = fd_delta

    def setup(self, t0, x0, u0):
        p = self.p
        lmd0 = p.dphi_dx(t0, x0)
        u = u0.copy()
        for _ in range(100):
            dhdu = p.dh_du(t0, x0, u, lmd0)
            if np.linalg.norm(dhdu) <= 1e-6:
                break

            def Amul(v):
                return (p.dh_du(t0, x0, u + self.dlt * v, lmd0) - dhdu) / self.dlt

            du = gmres_np(Amul, -dhdu, np.zeros_like(u), p.dim_uc)
            u = u + du
        self.u_list = np.tile(u, (self.N, 1))
        self.delta_u_vec = np.zeros(self.N * p.dim_uc)
        return u

    def calc_dhdu_list(self, t, x, u_list):
        p, N = self.p, self.N
        T = self.Ts * (1.0 - np.exp(-self.alpha * t))
        h = T / N
        xs = np.zeros((N + 1, p.dim_x))
        xs[0] = x
        tau = t
        for i in range(N):
            xs[i + 1] = xs[i] + h * p.state_eq(tau, xs[i], u_list[i][: p.dim_u])
            tau += h
        lmd = np.zeros((N + 1, p.dim_x))
        lmd[N] = p.dphi_dx(tau, xs[N])
        dhdu = np.zeros((N, p.dim_uc))
        for i in reversed(range(N)):
            lmd[i] = lmd[i + 1] + (-h) * p.costate_eq(tau, lmd[i + 1], xs[i],
                                                      u_list[i])
            tau -= h
            dhdu[i] = p.dh_du(tau, xs[i], u_list[i], lmd[i + 1])
        return dhdu

    def control_step(self, t, x, next_x):
        p, N = self.p, self.N
        dlt, dt = self.dlt, self.dt
        dhdu = self.calc_dhdu_list(t, x, self.u_list)
        t_wd = t + dlt
        x_wd = (1.0 - dlt / dt) * x + (dlt / dt) * next_x
        dhdu_wd = self.calc_dhdu_list(t_wd, x_wd, self.u_list)
        b = ((1.0 - self.zeta * dlt) * dhdu.ravel() - dhdu_wd.ravel()) / dlt

        def Amul(v):
            ul = self.u_list + dlt * v.reshape(N, -1)
            dh = self.calc_dhdu_list(t_wd, x_wd, ul)
            return (dh.ravel() - dhdu_wd.ravel()) / dlt

        self.delta_u_vec = gmres_np(Amul, b, self.delta_u_vec, self.k_max)
        self.u_list = self.u_list + dt * self.delta_u_vec.reshape(N, -1)
        return self.u_list[0], np.linalg.norm(dhdu)


class DamperGolden:
    """Semiactive damper, analytic (SemiactiveDamperProblem.h:10-109)."""

    dim_x, dim_u, dim_c = 2, 2, 1
    dim_uc = 3
    a, b, u_max = -1.0, -1.0, 1.0
    q1, q2, r1, r2 = 1.0, 10.0, 1.0, 1e-1
    sf1, sf2 = 1.0, 10.0
    x_initial = np.array([2.0, 0.0])
    u_initial = np.array([0.01, 0.9, 0.03])

    def state_eq(self, t, x, u):
        return np.array([x[1], self.a * x[0] + self.b * x[1] * u[0]])

    def costate_eq(self, t, lmd, x, uc):
        return np.array([
            -self.a * lmd[1] - self.q1 * x[0],
            -self.b * lmd[1] * uc[0] - self.q2 * x[1] - lmd[0],
        ])

    def dphi_dx(self, t, x):
        return np.array([self.sf1 * x[0], self.sf2 * x[1]])

    def dh_du(self, t, x, uc, lmd):
        mu = uc[2]
        return np.array([
            self.r1 * uc[0] + self.b * lmd[1] * x[1]
            + mu * (2.0 * uc[0] - self.u_max),
            -self.r2 + 2.0 * mu * uc[1],
            (uc[0] - self.u_max / 2.0) ** 2 + uc[1] ** 2
            - self.u_max**2 / 4.0,
        ])
