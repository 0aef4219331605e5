"""ctypes binding for the native real-time MPC executor (src/nmpc_runtime.cpp).

Usage::

    ex = MpcExecutor(sim_dt=0.002, mpc_dt=0.004)
    ex.set_cartpole_plant(x0=[0, pi, 0, 0])
    def solve(t, x):
        res = solver.solve(t, x, warm_start)     # JAX solve
        return res.us[0], res.Ks[0], res.xs[0]   # u_ff, K, x_pred
    log, stats = ex.run(solve, duration=2.0, realtime=False)

The native library is compiled on demand with g++ (no external deps).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Callable, NamedTuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "nmpc_runtime.cpp")
_LIB = os.path.join(_DIR, "libnmpc_runtime.so")


def build(force: bool = False) -> str:
    """Compile the runtime shared library if missing/stale."""
    if (not force and os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


_SOLVE_CB = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.c_double, ctypes.POINTER(ctypes.c_double),
    ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ctypes.POINTER(ctypes.c_double))


def _load():
    lib = ctypes.CDLL(build())
    lib.nmpc_executor_create.restype = ctypes.c_void_p
    lib.nmpc_executor_create.argtypes = [ctypes.c_int, ctypes.c_int,
                                         ctypes.c_double, ctypes.c_double]
    lib.nmpc_executor_destroy.argtypes = [ctypes.c_void_p]
    lib.nmpc_executor_set_cartpole_plant.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double)]
    lib.nmpc_executor_set_input_limits.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_double]
    lib.nmpc_executor_set_feedback.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.nmpc_executor_run.restype = ctypes.c_int
    lib.nmpc_executor_run.argtypes = [ctypes.c_void_p, _SOLVE_CB,
                                      ctypes.c_double, ctypes.c_int]
    lib.nmpc_executor_log_size.restype = ctypes.c_long
    lib.nmpc_executor_log_size.argtypes = [ctypes.c_void_p]
    lib.nmpc_executor_get_log.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_double)] * 3
    lib.nmpc_executor_get_state.argtypes = [ctypes.c_void_p,
                                            ctypes.POINTER(ctypes.c_double)]
    lib.nmpc_executor_stats.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long)]
    return lib


class ExecutorStats(NamedTuple):
    p50_ms: float
    p99_ms: float
    max_ms: float
    n_solves: int
    deadline_misses: int


class ExecutorLog(NamedTuple):
    ts: np.ndarray
    xs: np.ndarray
    us: np.ndarray


class MpcExecutor:
    """Native asynchronous MPC executor (see module docstring)."""

    def __init__(self, nx: int = 4, nu: int = 1, sim_dt: float = 0.002,
                 mpc_dt: float = 0.004):
        self._lib = _load()
        self._h = self._lib.nmpc_executor_create(nx, nu, sim_dt, mpc_dt)
        if not self._h:
            raise RuntimeError("failed to create executor")
        self.nx, self.nu = nx, nu

    def set_cartpole_plant(self, x0, m1=1.0, m2=0.5, l=2.0):
        x0 = np.ascontiguousarray(np.asarray(x0, float))
        self._lib.nmpc_executor_set_cartpole_plant(
            self._h, m1, m2, l, x0.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))

    def set_input_limits(self, lo: float, hi: float):
        self._lib.nmpc_executor_set_input_limits(self._h, lo, hi)

    def set_feedback(self, enabled: bool):
        self._lib.nmpc_executor_set_feedback(self._h, int(enabled))

    def run(self, solve: Callable, duration: float, realtime: bool = False):
        """solve(t, x[nx]) -> (u_ff[nu], K[nu,nx], x_pred[nx]).

        realtime=False: deterministic virtual-time interleaving (the
        reference's mpc_dt/sim_dt ratio).  realtime=True: two threads with
        wall-clock pacing and the seqlock packet buffer."""
        nx, nu = self.nx, self.nu

        @_SOLVE_CB
        def cb(t, x_ptr, uff_ptr, K_ptr, xpred_ptr):
            try:
                x = np.ctypeslib.as_array(x_ptr, shape=(nx,)).copy()
                u_ff, K, x_pred = solve(float(t), x)
                u_ff = np.asarray(u_ff, float).reshape(nu)
                K = np.asarray(K, float).reshape(nu, nx)
                x_pred = np.asarray(x_pred, float).reshape(nx)
                for i in range(nu):
                    uff_ptr[i] = u_ff[i]
                for i in range(nu * nx):
                    K_ptr[i] = K.ravel()[i]
                for i in range(nx):
                    xpred_ptr[i] = x_pred[i]
                return 0
            except Exception:
                import traceback
                traceback.print_exc()
                return -1

        rc = self._lib.nmpc_executor_run(self._h, cb, duration, int(realtime))
        if rc < 0:
            raise RuntimeError(f"solve callback failed (rc={rc})")
        return self.log(), self.stats()

    def log(self) -> ExecutorLog:
        n = self._lib.nmpc_executor_log_size(self._h)
        ts = np.zeros(n)
        xs = np.zeros(n * self.nx)
        us = np.zeros(n)
        P = ctypes.POINTER(ctypes.c_double)
        self._lib.nmpc_executor_get_log(self._h, ts.ctypes.data_as(P),
                                        xs.ctypes.data_as(P),
                                        us.ctypes.data_as(P))
        return ExecutorLog(ts, xs.reshape(n, self.nx), us)

    def state(self) -> np.ndarray:
        x = np.zeros(self.nx)
        self._lib.nmpc_executor_get_state(
            self._h, x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return x

    def stats(self) -> ExecutorStats:
        p50 = ctypes.c_double()
        p99 = ctypes.c_double()
        mx = ctypes.c_double()
        n = ctypes.c_long()
        miss = ctypes.c_long()
        self._lib.nmpc_executor_stats(self._h, ctypes.byref(p50),
                                      ctypes.byref(p99), ctypes.byref(mx),
                                      ctypes.byref(n), ctypes.byref(miss))
        return ExecutorStats(p50.value, p99.value, mx.value, n.value,
                             miss.value)

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.nmpc_executor_destroy(self._h)
                self._h = None
        except Exception:
            pass
