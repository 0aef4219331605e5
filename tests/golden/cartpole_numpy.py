"""NumPy fp64 cart-pole problem with hand-derived analytic derivatives,
for the golden DDP implementation (mirrors the reference example's analytic
derivative set, ``nmpc_ddp/tests/src/TestDDPCartPole.cpp:63-227``)."""

from __future__ import annotations

import numpy as np

G = 9.80665


class CartPoleGolden:
    def __init__(self, dt, m1=1.0, m2=0.5, l=2.0,
                 wrx=(0.1, 1.0, 0.01, 0.1), wru=(0.001,),
                 wtx=(0.1, 1.0, 0.01, 0.1), ref_pos=0.0):
        self.dt = dt
        self.m1, self.m2, self.l = m1, m2, l
        self.wrx = np.array(wrx)
        self.wru = np.array(wru)
        self.wtx = np.array(wtx)
        self.ref_pos = ref_pos

    def _xdot(self, x, u):
        m1, m2, l = self.m1, self.m2, self.l
        th, vel, om = x[1], x[2], x[3]
        f = u[0]
        s, c = np.sin(th), np.cos(th)
        D = m1 + m2 * s**2
        return np.array([
            vel,
            om,
            (f - m2 * l * om**2 * s + m2 * G * s * c) / D,
            (f * c - m2 * l * om**2 * s * c + G * (m1 + m2) * s) / (l * D),
        ])

    def dynamics(self, t, x, u):
        return x + self.dt * self._xdot(x, u)

    def _ref(self, t):
        return np.array([self.ref_pos, 0.0, 0.0, 0.0])

    def running_cost(self, t, x, u):
        dx = x - self._ref(t)
        return 0.5 * self.wrx @ dx**2 + 0.5 * self.wru @ u**2

    def terminal_cost(self, t, x):
        dx = x - self._ref(t)
        return 0.5 * self.wtx @ dx**2

    def fx_fu(self, t, x, u):
        m1, m2, l = self.m1, self.m2, self.l
        th, om = x[1], x[3]
        f = u[0]
        s, c = np.sin(th), np.cos(th)
        om2 = om**2
        D = m1 + m2 * s**2
        Jx = np.zeros((4, 4))
        Jx[0, 2] = 1.0
        Jx[1, 3] = 1.0
        num2 = f - m2 * l * om2 * s + m2 * G * s * c
        Jx[2, 1] = ((-m2 * l * om2 * c + m2 * G * (c**2 - s**2)) * D
                    - num2 * (2 * m2 * s * c)) / D**2
        Jx[2, 3] = -2 * m2 * l * om * s / D
        num3 = f * c - m2 * l * om2 * s * c + G * (m1 + m2) * s
        Jx[3, 1] = ((-f * s - m2 * l * om2 * (c**2 - s**2)
                     + G * (m1 + m2) * c) * D
                    - num3 * (2 * m2 * s * c)) / (l * D**2)
        Jx[3, 3] = -2 * m2 * om * s * c / D
        Fx = np.eye(4) + self.dt * Jx
        Fu = self.dt * np.array([[0.0], [0.0], [1.0 / D], [c / (l * D)]])
        return Fx, Fu

    def lderivs(self, t, x, u):
        dx = x - self._ref(t)
        return (self.wrx * dx, self.wru * u,
                np.diag(self.wrx), np.diag(self.wru), np.zeros((4, 1)))

    def vderivs(self, t, x):
        dx = x - self._ref(t)
        return self.wtx * dx, np.diag(self.wtx)
