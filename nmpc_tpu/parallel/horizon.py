"""Horizon-sharded (sequence-parallel) Riccati over the ``sp`` mesh axis.

This is the framework's ring-attention-shaped component (SURVEY.md §5): the
reference processes the horizon strictly sequentially on one thread
(``DDPSolver.hpp:367``, ``FmpcSolver.hpp:551``); here the horizon is
sharded across devices and the backward value recursion is evaluated as a
*distributed* suffix scan of Riccati flows:

  1. each device runs a local ``lax.associative_scan`` over its horizon
     block (O(log L) depth, no communication);
  2. one ``all_gather`` over ``sp`` exchanges the P block-total flows
     (3 matrices of size nz², tiny — rides ICI);
  3. each device composes the suffix of the *later* blocks (O(P) small
     combines, replicated) and applies it to its local flows;
  4. gain recovery is stagewise and embarrassingly parallel.

Total communication: one nz²-sized all-gather per solve, independent of N —
the horizon analog of a reduce-then-broadcast. The flow algebra (extended
state, square completion, composition law) lives in
``solvers/parallel_riccati.py``; this module only adds the distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from nmpc_tpu.solvers.parallel_riccati import LQRStage, _combine, _extend


def _identity_flow(nz, dtype):
    """The flow phi(S) = S: F = I, C = 0, J = 0."""
    return (jnp.eye(nz, dtype=dtype),
            jnp.zeros((nz, nz), dtype),
            jnp.zeros((nz, nz), dtype))


def _apply_flow(F, C, J, S):
    """phi(S) = J + Fᵀ S (I + C S)⁻¹ F, batched over a leading axis."""
    nz = F.shape[-1]
    eye = jnp.eye(nz, dtype=F.dtype)
    W = jnp.linalg.solve(eye + C @ S, F)           # (I + C S)⁻¹ F
    out = J + jnp.swapaxes(F, -1, -2) @ S @ W
    return 0.5 * (out + jnp.swapaxes(out, -1, -2))


def solve_lqr_horizon_sharded(stage: LQRStage, S_T, v_T=None, *,
                              mesh: Mesh, axis_name: str = "sp"):
    """All-stage LQR gains with the horizon sharded over ``axis_name``.

    ``stage`` arrays have leading axis N (divisible by the ``sp`` mesh
    size); the returned ``Ks [N, nu, nx]``, ``ks [N, nu]`` and extended
    value matrices ``Ss [N, nz, nz]`` (S_i for i = 0..N-1) come back
    sharded on the same axis.  Exactly matches
    :func:`solvers.parallel_riccati.solve_lqr_sequential` (tested to 1e-8).
    """
    N, nx, nu = stage.B.shape
    nz = nx + 1
    dtype = stage.A.dtype
    if v_T is None:
        v_T = jnp.zeros((nx,), dtype)

    (F, C, J), (Az, Bz, Mz) = _extend(stage)

    Sz_T = jnp.zeros((nz, nz), dtype)
    Sz_T = Sz_T.at[:nx, :nx].set(S_T)
    Sz_T = Sz_T.at[:nx, nx].set(v_T)
    Sz_T = Sz_T.at[nx, :nx].set(v_T)

    sp = mesh.shape[axis_name]
    assert N % sp == 0, f"horizon {N} must be divisible by sp={sp}"

    def shard_fn(F, C, J, Az, Bz, Mz, Quu, Sz_T):
        # ---- 1. local suffix scan within this block -------------------
        # associative_scan(reverse=True) passes (later-combined, earlier);
        # _combine takes (earlier, later) — flip (same as parallel_riccati).
        Fs, Cs, Js = lax.associative_scan(
            lambda a, b: _combine(b, a), (F, C, J), reverse=True)

        # ---- 2. exchange block totals over sp (ICI all_gather) --------
        totals = jax.tree_util.tree_map(
            lambda x: lax.all_gather(x[0], axis_name),   # [P, nz, nz]
            (Fs, Cs, Js))

        # ---- 3. suffix composition of the LATER blocks ----------------
        suf = lax.associative_scan(
            lambda a, b: _combine(b, a), totals, reverse=True)
        ident = _identity_flow(F.shape[-1], F.dtype)
        suf_ext = jax.tree_util.tree_map(
            lambda s, i: jnp.concatenate([s, i[None]], axis=0), suf, ident)
        p = lax.axis_index(axis_name)
        R = jax.tree_util.tree_map(lambda s: s[p + 1], suf_ext)

        # global suffix flows: local block suffix ∘ everything after block
        Fg, Cg, Jg = _combine((Fs, Cs, Js), tuple(x[None] for x in R))

        # ---- 4. value matrices + stagewise gain recovery ---------------
        Ss = _apply_flow(Fg, Cg, Jg, Sz_T)                   # [L, nz, nz]
        S_bound = _apply_flow(*R, Sz_T)                      # S at block end
        S_next = jnp.concatenate([Ss[1:], S_bound[None]], axis=0)

        G = Quu + jnp.einsum("nji,njk,nkl->nil", Bz, S_next, Bz)
        H = jnp.einsum("nji,njk,nkl->nil", Bz, S_next, Az) + Mz
        Kz = -jnp.linalg.solve(G, H)
        return Kz[:, :, :nx], Kz[:, :, nx], Ss

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis_name),) * 7 + (P(),),
        out_specs=P(axis_name),
    )
    return sharded(F, C, J, Az, Bz, Mz, stage.Quu, Sz_T)
