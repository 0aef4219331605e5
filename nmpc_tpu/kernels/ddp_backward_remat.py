"""Pallas TPU kernel: whole-iteration fused DDP backward with in-kernel
derivative REMATERIALIZATION.

The round-4 fused backward (``ddp_backward_pallas.py``) is at its HBM
bound — but the bound itself is set by the ~75 MB per-iteration stage
derivative buffer (Fx, Fu, Lx, Lu, Lxx, Luu, Lxu) that the vmapped
autodiff sweep writes and the kernel immediately re-reads.  This kernel
removes that buffer entirely: it streams only the TRAJECTORY
(x_i, u_i — (nx+nu) lane-tiles per stage instead of
2nx² + 2nx·nu + nx + nu + nu² ≈ 46 at the cart-pole shape) and
recomputes each stage's derivatives from (x_i, u_i) as it walks the
horizon.  This fuses the reference's two hot loops —
``DDPSolver.hpp:160-178`` (derivative sweep) and ``:343-534`` (backward
recursion) — into ONE kernel program with the value-function carry
resident in VMEM.

How the derivatives are computed in-kernel (kernels/tileval.py): the
problem's dynamics-jvp / cost-gradient / gradient-jvp functions are
traced ONCE at scalar shapes, dead-code-eliminated, and then the jaxprs
are **interpreted on (SUB, 128) lane tiles** — every small-vector value
becomes a flat list of tiles, transposes/slices are free re-indexing,
model constants inline as python literals, and evaluating the jvp
jaxprs with one-hot LITERAL seeds constant-folds into exactly the
analytic partial-derivative expressions.  Designs measured and rejected
first (2026-08-21, on chip, headline shape B=4096 N=100 cart-pole):

* replaying the full ``_stage_derivs`` jaxpr under ``vmap`` inside the
  kernel — the stacked [seeds, dims, SUB, 128] autodiff intermediates
  demanded 33-74 MB of Mosaic scoped vmem and Mosaic compile time blew
  up super-linearly in the block height (SUB=32 >10 min, SUB=1 15 s);
* grid-over-stages layout (grid = (B-blocks, N), per-stage in/out
  blocks, carry in scratch) — compiled and matched (3.6e-6) but paid
  ~24 us per grid step of pipeline overhead (9.5 ms total);
* fori_loop + manual DMA with the vmapped replay — compiled once the
  operand/result VMEM promotion was budgeted, matched (3.6e-6), but ran
  at 9.45 ms: vmap keeps small vectors 1-D and its batching rules force
  Mosaic relayouts per op.  With the **tile interpreter** the identical
  kernel with stubbed fields runs at 0.156 ms — the streaming + Riccati
  framework itself is faster than the sweep-fed kernel (fewer bytes).

Semantics contract: the same derivative math as
``_derivative_sweep_lanes`` (jvp columns of the same callables on the
same (t_i, x_i, u_i) values; ``t_i = t0 + dt * i`` uses the same fp32
ops as the sweep's ``t0 + dt * arange(N)``), followed by the same
unrolled tile Riccati stage as ``backward_pallas`` (boxed: including
the full-semantics in-kernel BoxQP ``_boxqp_t``).  Parity is pinned in
interpreter mode by tests/test_pallas_kernels.py / tests/test_tileval.py
and on-chip by benchmarks/parity_gate.py.

Eligibility (enforced by the solver's ``auto`` rule via
:func:`remat_supported`): fp32, ``deriv_dtype == "same"``, first-order
only, B % 128 == 0, and problem callbacks whose traces the tile
interpreter supports (plain jnp algebra; no gathers/scans/big tables).
Problems outside that set keep the round-4 sweep+kernel split
(``backward_impl="pallas"``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nmpc_tpu.core.types import DDPConfig
from nmpc_tpu.kernels.ddp_backward_pallas import (_riccati_stage,
                                                  _riccati_stage_boxed)
from nmpc_tpu.kernels.tileval import (TileVal, _Ctx, eval_jaxpr_tiles,
                                      jaxpr_tile_supported)


@functools.lru_cache(maxsize=256)
def _hoist(problem, which: str, nx: int, nu: int, dtype_name: str):
    """Trace one scalar stage callable, DCE it, and package it for the
    tile interpreter: returns (closed_jaxpr, used_args, out_tree,
    n_eqns).  ``used_args`` marks which of the declared scalar inputs
    survived DCE (the interpreter is fed only those)."""
    dtype = jnp.dtype(dtype_name)
    sd = jax.ShapeDtypeStruct

    t_av, x_av, u_av = sd((), dtype), sd((nx,), dtype), sd((nu,), dtype)
    if which == "dyn_jvp":
        def f(t, x, u, dx, du):
            _, tang = jax.jvp(lambda xx, uu: problem.dynamics(t, xx, uu),
                              (x, u), (dx, du))
            return tang
        avals = (t_av, x_av, u_av, x_av, u_av)
    elif which == "dyn_derivs":
        f = problem.dynamics_derivs
        avals = (t_av, x_av, u_av)
    elif which == "cost_grad":
        def f(t, x, u):
            return (jax.grad(problem.running_cost, argnums=1)(t, x, u),
                    jax.grad(problem.running_cost, argnums=2)(t, x, u))
        avals = (t_av, x_av, u_av)
    elif which == "cost_grad_jvp":
        def f(t, x, u, dx, du):
            def g(xx, uu):
                return (jax.grad(problem.running_cost, argnums=1)(t, xx, uu),
                        jax.grad(problem.running_cost, argnums=2)(t, xx, uu))
            _, tang = jax.jvp(g, (x, u), (dx, du))
            return tang
        avals = (t_av, x_av, u_av, x_av, u_av)
    elif which == "cost_derivs":
        f = problem.running_cost_derivs
        avals = (t_av, x_av, u_av)
    elif which == "dyn":
        f = problem.dynamics
        avals = (t_av, x_av, u_av)
    elif which == "cost":
        f = problem.running_cost
        avals = (t_av, x_av, u_av)
    elif which == "term":
        f = problem.terminal_cost
        avals = (t_av, x_av)
    elif which == "aux":
        # mask + box bounds, mirrors solvers/ddp.py::_stage_derivs
        def f(t, x, u):
            mask = problem.input_mask_at(t).astype(x.dtype)
            if problem.input_limits is not None:
                lower, upper = problem.input_limits(t)
                lower = jnp.asarray(lower, x.dtype)
                upper = jnp.asarray(upper, x.dtype)
                if problem.input_mask is not None:
                    lower = jnp.where(mask > 0, lower,
                                      -jnp.ones_like(lower))
                    upper = jnp.where(mask > 0, upper, jnp.ones_like(upper))
            else:
                lower = jnp.full((nu,), -jnp.inf, x.dtype)
                upper = jnp.full((nu,), jnp.inf, x.dtype)
            return mask, lower, upper
        avals = (t_av, x_av, u_av)
    else:  # pragma: no cover
        raise ValueError(which)

    closed = jax.make_jaxpr(f)(*avals)
    tree = jax.tree_util.tree_structure(jax.eval_shape(f, *avals))
    # DCE before in-kernel interpretation: autodiff traces record large
    # dead primal computations (the raw cost-gradient-jvp trace is ~3x
    # its live size)
    try:
        from jax._src.interpreters.partial_eval import dce_jaxpr_consts
        from jax.extend.core import ClosedJaxpr

        new_jaxpr, used_c, used_args = dce_jaxpr_consts(
            closed.jaxpr, [True] * len(closed.jaxpr.outvars))
        consts = [c for c, u_ in zip(closed.consts, used_c) if u_]
        closed = ClosedJaxpr(new_jaxpr, consts)
    except ImportError:  # pragma: no cover — private API moved; no DCE
        used_args = [True] * len(avals)
    return closed, tuple(used_args), tree, len(closed.jaxpr.eqns)


def _hoist_groups(problem, nx: int, nu: int, boxed: bool, dtype_name: str):
    groups = {}
    if problem.dynamics_derivs is not None:
        groups["dyn_derivs"] = _hoist(problem, "dyn_derivs", nx, nu,
                                      dtype_name)
    else:
        groups["dyn_jvp"] = _hoist(problem, "dyn_jvp", nx, nu, dtype_name)
    if problem.running_cost_derivs is not None:
        groups["cost_derivs"] = _hoist(problem, "cost_derivs", nx, nu,
                                       dtype_name)
    else:
        groups["cost_grad"] = _hoist(problem, "cost_grad", nx, nu,
                                     dtype_name)
        groups["cost_grad_jvp"] = _hoist(problem, "cost_grad_jvp", nx, nu,
                                         dtype_name)
    if problem.input_mask is not None or boxed:
        groups["aux"] = _hoist(problem, "aux", nx, nu, dtype_name)
    return groups


def remat_supported(problem, nx: int, nu: int, boxed: bool,
                    dtype_name: str = "float32") -> bool:
    """Static gate for the solver's ``auto`` rule: True iff every stage
    callable's (DCE'd) trace can be tile-interpreted in-kernel."""
    try:
        groups = _hoist_groups(problem, nx, nu, boxed, dtype_name)
    except Exception:  # noqa: BLE001 — untraceable callables
        return False
    return all(jaxpr_tile_supported(g[0]) for g in groups.values())


def _tile_call(group, args, ctx):
    closed, used_args, tree, _ = group
    kept = [a for a, u_ in zip(args, used_args) if u_]
    out = eval_jaxpr_tiles(closed, kept, ctx)
    return jax.tree_util.tree_unflatten(tree, out)


def _stage_fields_tile(problem, groups, ctx, t, x, u, nx: int, nu: int,
                       boxed: bool, dtype):
    """Rematerialize one stage's Riccati fields from tile LISTS
    x (nx tiles), u (nu tiles) via the tile interpreter.  Field entries
    may be python literals (folded constants) — downstream jnp arithmetic
    broadcasts them and Mosaic constant-folds."""
    tv = lambda shape, elems: TileVal(shape, dtype, elems)
    t_v = tv((), [t])
    x_v = tv((nx,), x)
    u_v = tv((nu,), u)

    def onehot(dim, c):
        return tv((dim,), [1.0 if a == c else 0.0 for a in range(dim)])

    zx, zu = tv((nx,), [0.0] * nx), tv((nu,), [0.0] * nu)

    # ---- dynamics first derivatives ------------------------------------
    if "dyn_derivs" in groups:
        FxV, FuV = _tile_call(groups["dyn_derivs"], (t_v, x_v, u_v), ctx)
        Fx = [[FxV.at((r, c)) for c in range(nx)] for r in range(nx)]
        Fu = [[FuV.at((r, c)) for c in range(nu)] for r in range(nx)]
    else:
        g = groups["dyn_jvp"]
        Fx = [[None] * nx for _ in range(nx)]
        Fu = [[None] * nu for _ in range(nx)]
        for c in range(nx):
            col = _tile_call(g, (t_v, x_v, u_v, onehot(nx, c), zu), ctx)
            for r in range(nx):
                Fx[r][c] = col.elems[r]
        for c in range(nu):
            col = _tile_call(g, (t_v, x_v, u_v, zx, onehot(nu, c)), ctx)
            for r in range(nx):
                Fu[r][c] = col.elems[r]

    # ---- running-cost expansion ----------------------------------------
    if "cost_derivs" in groups:
        LxV, LuV, LxxV, LuuV, LxuV = _tile_call(
            groups["cost_derivs"], (t_v, x_v, u_v), ctx)
        Lx = [LxV.elems[a] for a in range(nx)]
        Lu = [LuV.elems[a] for a in range(nu)]
        Lxx = [[LxxV.at((r, c)) for c in range(nx)] for r in range(nx)]
        Luu = [[LuuV.at((r, c)) for c in range(nu)] for r in range(nu)]
        Lxu = [[LxuV.at((r, c)) for c in range(nu)] for r in range(nx)]
    else:
        LxV, LuV = _tile_call(groups["cost_grad"], (t_v, x_v, u_v), ctx)
        Lx = [LxV.elems[a] for a in range(nx)]
        Lu = [LuV.elems[a] for a in range(nu)]
        gj = groups["cost_grad_jvp"]
        Lxx = [[None] * nx for _ in range(nx)]
        Luu = [[None] * nu for _ in range(nu)]
        Lxu = [[None] * nu for _ in range(nx)]
        for c in range(nx):
            gx, gu = _tile_call(gj, (t_v, x_v, u_v, onehot(nx, c), zu), ctx)
            for r in range(nx):
                Lxx[r][c] = gx.elems[r]
            for r in range(nu):
                Lxu[c][r] = gu.elems[r]   # d2l / dx_c du_r
        for c in range(nu):
            gx, gu = _tile_call(gj, (t_v, x_v, u_v, zx, onehot(nu, c)), ctx)
            for r in range(nu):
                Luu[r][c] = gu.elems[r]

    fields = {"Fx": Fx, "Fu": Fu, "Lx": Lx, "Lu": Lu,
              "Lxx": Lxx, "Luu": Luu, "Lxu": Lxu}

    # ---- mask + bounds (mirror of _stage_derivs) -----------------------
    if "aux" in groups:
        maskV, lowerV, upperV = _tile_call(groups["aux"], (t_v, x_v, u_v),
                                           ctx)
        m = [maskV.elems[a] for a in range(nu)]
        if problem.input_mask is not None:
            fields["Fu"] = [[Fu[r][c] * m[c] for c in range(nu)]
                            for r in range(nx)]
            fields["Lu"] = [Lu[c] * m[c] for c in range(nu)]
            fields["Luu"] = [[Luu[r][c] * m[r] * m[c]
                              + ((1.0 - m[r]) if r == c else 0.0)
                              for c in range(nu)] for r in range(nu)]
            fields["Lxu"] = [[Lxu[r][c] * m[c] for c in range(nu)]
                             for r in range(nx)]
        if boxed:
            fields["lower"] = [lowerV.elems[a] for a in range(nu)]
            fields["upper"] = [upperV.elems[a] for a in range(nu)]
            fields["u"] = list(u)
    elif boxed:  # pragma: no cover — boxed without limits is degenerate
        fields["lower"] = [-jnp.inf] * nu
        fields["upper"] = [jnp.inf] * nu
        fields["u"] = list(u)

    # literal field entries are fine for the Riccati algebra (python
    # floats broadcast); promote them to f32 scalars only where masked
    # arithmetic above could have produced exact python ints
    return fields


def _make_kernel_remat(problem, config: DDPConfig, nx: int, nu: int,
                       N: int, SUB: int, boxed: bool, groups):
    """Streaming layout of ``ddp_backward_pallas._make_kernel``: manual
    double-buffered per-stage DMA of (x_i, u_i) inside one fori_loop
    program, fields tile-interpreted in-kernel."""
    dt = float(problem.dt)

    def kernel(xs_hbm, us_hbm, VxT_ref, VxxT_ref, lam_ref, t0_ref,
               ks_ref, Ks_ref, dV_ref, ok_ref, x_s, u_s, sems):
        g = pl.program_id(0)
        b0 = g * SUB
        lam = lam_ref[:, :]
        t0 = t0_ref[0, 0]
        dtype = lam.dtype
        ctx = _Ctx()   # shared CSE memo: primals unify across jvp columns

        def stage_dmas(slot, i):
            return [
                pltpu.make_async_copy(
                    xs_hbm.at[i, :, pl.ds(b0, SUB), :], x_s.at[slot],
                    sems.at[0, slot]),
                pltpu.make_async_copy(
                    us_hbm.at[i, :, pl.ds(b0, SUB), :], u_s.at[slot],
                    sems.at[1, slot]),
            ]

        for d in stage_dmas(0, N - 1):
            d.start()

        Vx = [VxT_ref[a] for a in range(nx)]
        Vxx = [[VxxT_ref[a, b] for b in range(nx)] for a in range(nx)]
        zeros = jnp.zeros_like(lam)
        if boxed:
            carry0 = (Vx, Vxx, zeros, zeros, jnp.ones_like(lam),
                      [zeros for _ in range(nu)])   # k_next warm start = 0
        else:
            carry0 = (Vx, Vxx, zeros, zeros, jnp.ones_like(lam))

        def body(j, carry):
            i = N - 1 - j
            slot = lax.rem(j, 2)
            next_slot = lax.rem(j + 1, 2)

            @pl.when(j + 1 < N)
            def _():
                for d in stage_dmas(next_slot, i - 1):
                    d.start()

            for d in stage_dmas(slot, i):
                d.wait()

            # same fp32 ops as the sweep's t0 + dt * arange(N)
            t_i = t0 + jnp.float32(dt) * i.astype(jnp.float32)
            x_t = [x_s[slot, a] for a in range(nx)]
            u_t = [u_s[slot, a] for a in range(nu)]
            fields = _stage_fields_tile(problem, groups, ctx, t_i, x_t,
                                        u_t, nx, nu, boxed, dtype)
            if boxed:
                new_carry, kvec, K = _riccati_stage_boxed(
                    config, nx, nu, lam, zeros, fields, carry)
            else:
                new_carry, kvec, K = _riccati_stage(
                    config, nx, nu, lam, zeros, fields, carry)

            for a in range(nu):
                ks_ref[i, a] = kvec[a]
                for b in range(nx):
                    Ks_ref[i, a, b] = K[a][b]

            return new_carry

        out = lax.fori_loop(0, N, body, carry0)
        dV_ref[0] = out[2]
        dV_ref[1] = out[3]
        ok_ref[:, :] = out[4]

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _backward_remat_call(problem, config: DDPConfig, nx, nu, N, boxed,
                         xs, us, VxT, VxxT, lam, t0):
    """xs [N+1, nx, B4, 128] (stage N's terminal state rides along unused
    — passing the full array avoids a slice copy), us [N, nu, B4, 128],
    VxT [nx, B4, 128], VxxT [nx, nx, B4, 128], lam [B4, 128], t0 scalar."""
    B4 = lam.shape[0]
    dtype = xs.dtype
    groups = _hoist_groups(problem, nx, nu, boxed, jnp.dtype(dtype).name)
    # SUB = one native sublane tile (8): larger blocks blew Mosaic compile
    # time super-linearly on the VMAPPED body (SUB=32 >10 min, SUB=1 15 s);
    # the tile-interpreted body compiles fine at 16 and measures parity,
    # but end-to-end SUB=16 is speed-neutral (1.369M vs 1.366M solves/s,
    # reps=40 — the forward scans dominate the iteration now), so 8 stays
    # the default (smaller VMEM window).  NMPC_REMAT_SUB overrides.
    import os

    SUB = min(int(os.environ.get("NMPC_REMAT_SUB", "8")), B4)
    while B4 % SUB != 0:
        SUB //= 2
    grid = (B4 // SUB,)

    def vspec(*dims):
        block = tuple(dims) + (SUB, 128)
        nlead = len(dims)
        return pl.BlockSpec(block,
                            lambda i, nlead=nlead: (0,) * nlead + (i, 0),
                            memory_space=pltpu.VMEM)

    kernel = _make_kernel_remat(problem, config, nx, nu, N, SUB, boxed,
                                groups)
    out_shape = (
        jax.ShapeDtypeStruct((N, nu, B4, 128), dtype),
        jax.ShapeDtypeStruct((N, nu, nx, B4, 128), dtype),
        jax.ShapeDtypeStruct((2, B4, 128), dtype),
        jax.ShapeDtypeStruct((B4, 128), jnp.float32),
    )
    out_specs = (vspec(N, nu), vspec(N, nu, nx), vspec(2), vspec())
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)] * 2 + [
        vspec(nx), vspec(nx, nx), vspec(),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)]
    scratch = [
        pltpu.VMEM((2, nx, SUB, 128), dtype),   # x_i
        pltpu.VMEM((2, nu, SUB, 128), dtype),   # u_i
        pltpu.SemaphoreType.DMA((2, 2)),
    ]

    ks, Ks, dV, okf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        # XLA promotes this call's operands+results into scoped vmem when
        # they fit (measured: exactly operands+results = 16.87 MB at the
        # headline shape against the default 16 MB scoped limit).  Raising
        # the limit admits the promotion — I/O served from VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(xs, us, VxT, VxxT, lam,
      jnp.reshape(t0, (1, 1)).astype(jnp.float32))
    return ks, Ks, dV, okf


def backward_remat(problem, config: DDPConfig, t0, xs, us, Vx_T, Vxx_T,
                   lam, boxed: bool = False):
    """Drop-in for ``backward_stacked`` / ``backward_stacked_boxed`` that
    takes the TRAJECTORY instead of precomputed stage derivatives.

    Args (batch-minor, trailing axis B): xs [N+1, nx, B], us [N, nu, B],
    Vx_T [nx, B], Vxx_T [nx, nx, B], lam [B]; t0 scalar.
    Returns (ks [N, nu, B], Ks [N, nu, nx, B], dV [2, B], ok [B]).

    Requires B % 128 == 0.  ``boxed=True`` runs the in-kernel BoxQP
    (full stacked semantics, ``ddp_backward_pallas._boxqp_t``) with the
    per-stage bounds rematerialized from ``problem.input_limits`` —
    covering ``DDPSolver.hpp:450-497`` without the bounds buffers either.
    """
    N = us.shape[0]
    nx = xs.shape[1]
    nu = us.shape[1]
    B = lam.shape[-1]
    assert B % 128 == 0, "remat backward requires B % 128 == 0"
    B4 = B // 128

    r = lambda a: a.reshape(a.shape[:-1] + (B4, 128))
    ks, Ks, dV, okf = _backward_remat_call(
        problem, config, nx, nu, N, boxed,
        r(xs), r(us), r(Vx_T), r(Vxx_T), r(lam), t0)
    unr = lambda a: a.reshape(a.shape[:-2] + (B,))
    return unr(ks), unr(Ks), unr(dV), unr(okf) > 0.5
