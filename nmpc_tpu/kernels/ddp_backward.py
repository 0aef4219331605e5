"""Batch-minor ("stacked") DDP backward pass — the hot kernel.

Why this exists: under plain ``vmap`` the backward scan's stage matrices are
``[B, nx, nx]`` and XLA tiles the *tiny minor dims* onto the TPU's (8, 128)
vector tiles — 16 useful elements per 1024-element tile (1.6 % utilization),
with every intermediate round-tripping HBM in padded form.  Profiling showed
the backward pass at ~23 ms for B=4096, N=100 (80 % of the solve).

TPU-first layout: put the batch on the lanes.  Every stage quantity is
stored ``[..., small_dims..., B]`` so the minor two dims of every
intermediate are (small_dim, B) — full lanes, 50-100 % sublanes — and the
small-matrix contractions unroll into elementwise VPU ops over the batch.
This is the "single fused, batch-wide kernel" shape SURVEY.md §7 calls the
central engineering risk of the port.

Math is identical to ``solvers/ddp.py::_backward`` (reference
``DDPSolver.hpp:343-534``), minus the boxed-input and second-order paths
(those fall back to the scan implementation).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from nmpc_tpu.core.types import DDPConfig


class StackedDerivs(NamedTuple):
    """Stage derivatives, batch-minor: leading axis N, trailing axis B."""

    Fx: jnp.ndarray   # [N, nx, nx, B]
    Fu: jnp.ndarray   # [N, nx, nu, B]
    Lx: jnp.ndarray   # [N, nx, B]
    Lu: jnp.ndarray   # [N, nu, B]
    Lxx: jnp.ndarray  # [N, nx, nx, B]
    Luu: jnp.ndarray  # [N, nu, nu, B]
    Lxu: jnp.ndarray  # [N, nx, nu, B]


def _mm(A, B):
    """[i, k, B] @ [k, j, B] -> [i, j, B] (broadcast-multiply + reduce,
    keeps the batch on the lanes; no dot_general)."""
    return jnp.sum(A[:, :, None, :] * B[None, :, :, :], axis=1)


def _mT(A):
    return jnp.swapaxes(A, 0, 1)


def _mv(A, v):
    """[i, k, B] @ [k, B] -> [i, B]."""
    return jnp.sum(A * v[None, :, :], axis=1)


def _chol_bl(A):
    """Cholesky of [n, n, B] SPD, unrolled; returns (L rows list, ok [B])."""
    n = A.shape[0]
    ok = jnp.ones(A.shape[-1], dtype=bool)
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        d = A[j, j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        ok = ok & (d > 0) & jnp.isfinite(d)
        Ljj = jnp.sqrt(jnp.where(d > 0, d, 1.0))
        L[j][j] = Ljj
        inv = 1.0 / Ljj
        for i in range(j + 1, n):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    return L, ok


def _chol_solve_bl(L, B):
    """Solve (L L^T) X = B for [n, m, B] rhs with L from :func:`_chol_bl`."""
    n = len(L)
    y = [None] * n
    for i in range(n):
        s = B[i]
        for k in range(i):
            s = s - L[i][k][None, :] * y[k]
        y[i] = s / L[i][i][None, :]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i][None, :] * x[k]
        x[i] = s / L[i][i][None, :]
    return jnp.stack(x, axis=0)


def backward_stacked(config: DDPConfig, D: StackedDerivs, Vx_T, Vxx_T, lam):
    """Backward pass, batch-minor.

    Args: Vx_T [nx, B], Vxx_T [nx, nx, B], lam [B] (per-lane regularization).
    Returns (ks [N, nu, B], Ks [N, nu, nx, B], dV [2, B], ok [B]).
    """
    nx = D.Fx.shape[1]
    nu = D.Fu.shape[2]
    B = Vx_T.shape[-1]
    dtype = Vx_T.dtype
    eye_nx = jnp.eye(nx, dtype=dtype)[:, :, None]

    reg1 = config.reg_type == 1
    reg2 = config.reg_type == 2

    def bstep(carry, d):
        Vx, Vxx, dV, ok = carry
        Fx, Fu, Lx, Lu, Lxx, Luu, Lxu = d

        FuT = _mT(Fu)          # [nu, nx, B]
        FxT = _mT(Fx)          # [nx, nx, B]
        Qu = Lu + _mv(FuT, Vx)
        Qx = Lx + _mv(FxT, Vx)
        FuT_Vxx = _mm(FuT, Vxx)
        Qux = _mT(Lxu) + _mm(FuT_Vxx, Fx)
        Quu = Luu + _mm(FuT_Vxx, Fu)
        FxT_Vxx = _mm(FxT, Vxx)
        Qxx = Lxx + _mm(FxT_Vxx, Fx)

        if reg2:
            Vxx_reg = Vxx + lam[None, None, :] * eye_nx
            FuT_Vr = _mm(FuT, Vxx_reg)
            Qux_reg = _mT(Lxu) + _mm(FuT_Vr, Fx)
            Quu_F = Luu + _mm(FuT_Vr, Fu)
        else:
            Qux_reg = Qux
            Quu_F = Quu
        if reg1:
            Quu_F = Quu_F + lam[None, None, :] * jnp.eye(nu, dtype=dtype)[:, :, None]

        L, ok_i = _chol_bl(Quu_F)
        k = -_chol_solve_bl(L, Qu[:, None, :])[:, 0, :]        # [nu, B]
        K = -_chol_solve_bl(L, Qux_reg)                        # [nu, nx, B]

        Quu_k = _mv(Quu, k)                                    # [nu, B]
        KT = _mT(K)                                            # [nx, nu, B]
        dV = dV + jnp.stack([
            jnp.sum(k * Qu, axis=0),
            0.5 * jnp.sum(k * Quu_k, axis=0),
        ])
        Vx_new = Qx + _mv(KT, Quu_k) + _mv(KT, Qu) + _mv(_mT(Qux), k)
        Vxx_new = (Qxx + _mm(KT, _mm(Quu, K)) + _mm(KT, Qux)
                   + _mm(_mT(Qux), K))
        Vxx_new = 0.5 * (Vxx_new + _mT(Vxx_new))

        return (Vx_new, Vxx_new, dV, ok & ok_i), (k, K)

    init = (Vx_T, Vxx_T, jnp.zeros((2, B), dtype), jnp.ones((B,), dtype=bool))
    (_, _, dV, ok), (ks, Ks) = lax.scan(bstep, init, tuple(D), reverse=True)
    return ks, Ks, dV, ok


def stack_derivs(Fx, Fu, Lx, Lu, Lxx, Luu, Lxu) -> StackedDerivs:
    """[B, N, ...] (vmap layout) -> [N, ..., B] (batch-minor layout)."""
    mv = lambda a: jnp.moveaxis(a, 0, -1)
    return StackedDerivs(Fx=mv(Fx), Fu=mv(Fu), Lx=mv(Lx), Lu=mv(Lu),
                         Lxx=mv(Lxx), Luu=mv(Luu), Lxu=mv(Lxu))
