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
horizon, by re-tracing the problem's own derivative callables
(``solvers/ddp.py::_stage_derivs`` — autodiff jvps, masking and all) on
(SUB, 128) lane-tile values inside the kernel.  The problem callbacks
are plain jnp algebra, so the traced jacfwd/grad primitives lower to
elementwise VPU ops exactly like the hand-unrolled Riccati math.

This fuses the reference's two hot loops —
``DDPSolver.hpp:160-178`` (derivative sweep) and ``:343-534`` (backward
recursion) — into ONE kernel program with the value-function carry
resident in VMEM.  HBM traffic for the sweep+backward segment drops ~10x
at the cart-pole shape (measured figures in BENCH_RESULTS.md).

Model-constant plumbing: Pallas kernels may not capture array constants,
and Mosaic cannot vectorize the 1-D weight vectors user callbacks close
over (measured: a rebuilt f32[4] inside the kernel fails to lower).
``_hoist_consts`` therefore extracts every captured array from the
stage-derivative trace via ``jax.make_jaxpr``; the call layer broadcasts
each one to lane-tile shape ``const.shape + (B4, 128)`` (loop-invariant,
hoisted out of the solve loop by XLA) and feeds them to the kernel as
ordinary VMEM inputs, where the re-traced callback consumes them as
lane-batched values — no 1-D arrays anywhere in the lowered kernel.

Semantics contract: identical to ``_derivative_sweep_lanes`` +
``backward_stacked`` / ``backward_stacked_boxed`` — the same
``_stage_derivs`` jaxpr evaluated on the same (t_i, x_i, u_i) values
(the in-kernel ``t_i = t0 + dt * i`` is computed with the same fp32 ops
as the sweep's ``t0 + dt * arange(N)``), followed by the same unrolled
tile Riccati stage as ``backward_pallas`` (boxed: including the
full-semantics in-kernel BoxQP ``_boxqp_t``).  Parity is pinned in
interpreter mode by tests/test_pallas_kernels.py and on-chip by
benchmarks/parity_gate.py.

Eligibility (enforced by the solver's ``auto`` rule): fp32,
``deriv_dtype == "same"`` (no fp64 islands on the TPU VPU), first-order
only, B % 128 == 0.  Problems whose callbacks are not Mosaic-traceable
(e.g. gather-heavy table interpolation) can force
``backward_impl="pallas"`` to keep the round-4 sweep+kernel split.
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

try:  # jax>=0.5 moved eval_jaxpr's home; keep both spellings working
    from jax.core import eval_jaxpr as _eval_jaxpr
except ImportError:  # pragma: no cover
    from jax.extend.core import eval_jaxpr as _eval_jaxpr


@functools.lru_cache(maxsize=256)
def _hoist(problem, which: str, nx: int, nu: int, dtype_name: str):
    """Trace ONE small scalar stage callable and hoist its captured array
    constants (model weights, plant parameters) into explicit arguments:
    returns (pure_fn(t, x, u, *consts) -> outputs, consts tuple).

    Kept deliberately small-grained (dynamics / cost gradient / analytic
    derivative callables / mask+bounds separately): the first remat build
    replayed the FULL ``_stage_derivs`` jaxpr (jacfwd/hessian inside) and
    its stacked [seeds, dims, SUB, 128] intermediates blew Mosaic's
    scoped-vmem stack (~33 MB) and compile time; the kernel instead
    differentiates these small functions per-column with ``jax.jvp`` on
    lane tiles, so every intermediate stays tile-shaped."""
    dtype = jnp.dtype(dtype_name)

    if which == "dyn":
        f = problem.dynamics
    elif which == "dyn_derivs":
        f = problem.dynamics_derivs
    elif which == "cost_grad":
        def f(t, x, u):
            return (jax.grad(problem.running_cost, argnums=1)(t, x, u),
                    jax.grad(problem.running_cost, argnums=2)(t, x, u))
    elif which == "cost_hess":
        def f(t, x, u):
            gx = jax.grad(problem.running_cost, argnums=1)
            return (jax.jacfwd(gx, argnums=1)(t, x, u),
                    jax.hessian(problem.running_cost, argnums=2)(t, x, u),
                    jax.jacfwd(gx, argnums=2)(t, x, u))
    elif which == "cost_derivs":
        f = problem.running_cost_derivs
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
    else:  # pragma: no cover
        raise ValueError(which)

    closed = jax.make_jaxpr(f)(
        jax.ShapeDtypeStruct((), dtype),
        jax.ShapeDtypeStruct((nx,), dtype),
        jax.ShapeDtypeStruct((nu,), dtype))
    consts = tuple(closed.consts)
    tree = jax.tree_util.tree_structure(
        jax.eval_shape(f, jax.ShapeDtypeStruct((), dtype),
                       jax.ShapeDtypeStruct((nx,), dtype),
                       jax.ShapeDtypeStruct((nu,), dtype)))

    def pure_fn(t, x, u, *cs):
        out = _eval_jaxpr(closed.jaxpr, cs, t, x, u)
        return jax.tree_util.tree_unflatten(tree, out)

    return pure_fn, consts, len(closed.jaxpr.eqns)


# When the traced cost-Hessian jaxpr has at most this many equations
# (true for the quadratic costs every in-repo model uses — the Hessian is
# x-independent, so the trace is consts + a few broadcasts), the kernel
# calls it DIRECTLY instead of rematerializing curvature per-column with
# jvp-of-grad: ~600 fewer tile-ops per stage, and small stacked
# intermediates of this size lower fine in Mosaic.
_HESS_DIRECT_MAX_EQNS = 48


def _hoist_groups(problem, config: DDPConfig, boxed: bool, nx: int, nu: int,
                  dtype_name: str):
    """The const-hoisted callables the remat kernel needs, plus the
    concatenated const list and per-group offsets."""
    groups = {}
    if problem.dynamics_derivs is not None:
        groups["dyn_derivs"] = _hoist(problem, "dyn_derivs", nx, nu,
                                      dtype_name)
    else:
        groups["dyn"] = _hoist(problem, "dyn", nx, nu, dtype_name)
    if problem.running_cost_derivs is not None:
        groups["cost_derivs"] = _hoist(problem, "cost_derivs", nx, nu,
                                       dtype_name)
    else:
        groups["cost_grad"] = _hoist(problem, "cost_grad", nx, nu,
                                     dtype_name)
        hess = _hoist(problem, "cost_hess", nx, nu, dtype_name)
        if hess[2] <= _HESS_DIRECT_MAX_EQNS:
            groups["cost_hess"] = hess
    if problem.input_mask is not None or boxed:
        groups["aux"] = _hoist(problem, "aux", nx, nu, dtype_name)

    fns, offsets, consts = {}, {}, []
    for name, (fn, cs, _n) in groups.items():
        fns[name] = fn
        offsets[name] = (len(consts), len(cs))
        consts.extend(cs)
    return fns, offsets, tuple(consts)


def _stage_fields_slim(problem, config: DDPConfig, fns, offsets, consts,
                       t, x, u, nx: int, nu: int, boxed: bool):
    """Rematerialize one stage's Riccati fields from tile values
    x [nx, SUB, 128], u [nu, SUB, 128] — per-column jvp seeds unrolled in
    Python so every intermediate is a lane tile.  Matches
    ``solvers/ddp.py::_stage_derivs`` (same callables, same masking)."""
    from nmpc_tpu.kernels.lanes import vmap_lanes

    def call(name, *args):
        fn = fns[name]
        o, n = offsets[name]
        cs = consts[o:o + n]
        return vmap_lanes(fn, len(args) - 1 + n)(*args, *cs)

    zeros = jnp.zeros_like(x[0])
    ones = jnp.ones_like(x[0])

    def seed(dim, c):
        return jnp.stack([ones if a == c else zeros for a in range(dim)])

    mat = lambda A, n, m: [[A[a, b] for b in range(m)] for a in range(n)]
    vec = lambda V, n: [V[a] for a in range(n)]

    # ---- dynamics first derivatives ------------------------------------
    if "dyn_derivs" in fns:
        FxA, FuA = call("dyn_derivs", t, x, u)
        Fx = mat(FxA, nx, nx)
        Fu = mat(FuA, nx, nu)
    else:
        zx, zu = jnp.zeros_like(x), jnp.zeros_like(u)
        # linearize: the primal (incl. transcendentals) is evaluated ONCE
        # and the per-column tangent calls replay only linear ops
        _, dyn_lin = jax.linearize(lambda a, b: call("dyn", t, a, b), x, u)
        Fx = [[None] * nx for _ in range(nx)]
        Fu = [[None] * nu for _ in range(nx)]
        for c in range(nx):
            col = dyn_lin(seed(nx, c), zu)
            for r in range(nx):
                Fx[r][c] = col[r]
        for c in range(nu):
            col = dyn_lin(zx, seed(nu, c))
            for r in range(nx):
                Fu[r][c] = col[r]

    # ---- running-cost expansion ----------------------------------------
    if "cost_derivs" in fns:
        LxA, LuA, LxxA, LuuA, LxuA = call("cost_derivs", t, x, u)
        Lx, Lu = vec(LxA, nx), vec(LuA, nu)
        Lxx, Luu = mat(LxxA, nx, nx), mat(LuuA, nu, nu)
        Lxu = mat(LxuA, nx, nu)
    else:
        zx, zu = jnp.zeros_like(x), jnp.zeros_like(u)
        LxA, LuA = call("cost_grad", t, x, u)
        Lx, Lu = vec(LxA, nx), vec(LuA, nu)
        if "cost_hess" in fns:
            # quadratic-cost fast path: the Hessian trace is tiny
            # (x-independent), call it directly
            LxxA, LuuA, LxuA = call("cost_hess", t, x, u)
            Lxx, Luu = mat(LxxA, nx, nx), mat(LuuA, nu, nu)
            Lxu = mat(LxuA, nx, nu)
        else:
            _, grad_lin = jax.linearize(
                lambda a, b: call("cost_grad", t, a, b), x, u)
            Lxx = [[None] * nx for _ in range(nx)]
            Luu = [[None] * nu for _ in range(nu)]
            Lxu = [[None] * nu for _ in range(nx)]
            for c in range(nx):
                gx, gu = grad_lin(seed(nx, c), zu)
                for r in range(nx):
                    Lxx[r][c] = gx[r]
                for r in range(nu):
                    Lxu[c][r] = gu[r]  # Lxu[nx][nu] = d2l / dx_c du_r
            for c in range(nu):
                gx, gu = grad_lin(zx, seed(nu, c))
                for r in range(nu):
                    Luu[r][c] = gu[r]

    fields = {"Fx": Fx, "Fu": Fu, "Lx": Lx, "Lu": Lu,
              "Lxx": Lxx, "Luu": Luu, "Lxu": Lxu}

    # ---- mask + bounds (mirror of _stage_derivs) -----------------------
    if "aux" in fns:
        maskA, lowerA, upperA = call("aux", t, x, u)
        m = vec(maskA, nu)
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
            fields["lower"] = vec(lowerA, nu)
            fields["upper"] = vec(upperA, nu)
            fields["u"] = [u[a] for a in range(nu)]
    elif boxed:
        # unmasked problem without input_limits cannot be boxed-solved
        # meaningfully, but keep semantics: infinite bounds
        inf = jnp.full_like(zeros, jnp.inf)
        fields["lower"] = [-inf for _ in range(nu)]
        fields["upper"] = [inf for _ in range(nu)]
        fields["u"] = [u[a] for a in range(nu)]
    return fields


def _make_kernel_remat(problem, config: DDPConfig, nx: int, nu: int,
                       N: int, SUB: int, boxed: bool, fns, offsets,
                       n_consts: int):
    """Streaming layout of ``ddp_backward_pallas._make_kernel`` (manual
    double-buffered per-stage DMA inside one fori_loop program) with the
    7 derivative-field DMAs replaced by 2 trajectory DMAs (x_i, u_i) and
    the fields rematerialized in-kernel by ``_stage_fields_slim``.

    Two designs were measured and rejected before this one
    (2026-08-21, on chip):

    * fori_loop + full ``_stage_derivs`` jaxpr replay -- the stacked
      [seeds, dims, SUB, 128] autodiff intermediates blew Mosaic's 16 MB
      scoped-vmem stack (33-74 MB demanded, roughly constant in N).
    * grid-over-stages (grid = (B-blocks, N), per-stage in/out blocks,
      carry in scratch) -- compiled and matched (3.6e-6) but paid ~24 us
      PER GRID STEP (9.5 ms total at the headline shape vs 0.31 ms for
      the sweep-fed fused kernel): per-step pipeline overhead dwarfs the
      sub-us of useful work, and the reversed (N-1-j) index maps defeat
      the revolving-window prefetcher.
    """
    dt = float(problem.dt)

    def kernel(*refs):
        (xs_hbm, us_hbm, VxT_ref, VxxT_ref, lam_ref, t0_ref) = refs[:6]
        const_refs = refs[6:6 + n_consts]
        (ks_ref, Ks_ref, dV_ref, ok_ref, x_s, u_s, sems) = refs[6 + n_consts:]

        g = pl.program_id(0)
        b0 = g * SUB
        lam = lam_ref[:, :]
        t0 = t0_ref[0, 0]
        consts = [c[...] for c in const_refs]   # loop-invariant VMEM reads

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
            fields = _stage_fields_slim(problem, config, fns, offsets,
                                        consts, t_i, x_s[slot], u_s[slot],
                                        nx, nu, boxed)
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
    -- passing the full array avoids a slice copy), us [N, nu, B4, 128],
    VxT [nx, B4, 128], VxxT [nx, nx, B4, 128], lam [B4, 128], t0 scalar."""
    B4 = lam.shape[0]
    dtype = xs.dtype
    fns, offsets, consts = _hoist_groups(problem, config, boxed, nx, nu,
                                         jnp.dtype(dtype).name)
    # SUB is capped at one native sublane tile (8): Mosaic compile time on
    # the remat body explodes super-linearly in the block height (measured
    # 2026-08-21: SUB=1 compiles in 15 s, SUB=32 did not finish in 10 min
    # at the SAME horizon).  The VMEM budget still has to hold the
    # double-buffered [N, ...] output blocks plus the slim trace's live
    # set, so SUB degrades further for very long horizons.
    # SUB is 8 (one native sublane tile) — the only legal choice: larger
    # blocks blow Mosaic's compile time super-linearly (SUB=32 did not
    # finish in 10 min; SUB=1 compiled in 15 s), smaller blocks violate
    # the Pallas block rule (second-to-last dim divisible by 8 or equal
    # to the array dim).  Mosaic's scoped-vmem stack allocates one slot
    # per live trace value (no aggressive reuse), so the body is kept
    # slim: linearized dynamics tangents, direct tiny-Hessian calls for
    # quadratic costs (2026-08-21: the pre-cut body measured 16.87 MB at
    # this shape, 888 KB over the 16 MB limit; the cuts brought it under).
    SUB = min(8, B4)
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
                                fns, offsets, len(consts))
    out_shape = (
        jax.ShapeDtypeStruct((N, nu, B4, 128), dtype),
        jax.ShapeDtypeStruct((N, nu, nx, B4, 128), dtype),
        jax.ShapeDtypeStruct((2, B4, 128), dtype),
        jax.ShapeDtypeStruct((B4, 128), jnp.float32),
    )
    out_specs = (vspec(N, nu), vspec(N, nu, nx), vspec(2), vspec())
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2 + [
        vspec(nx), vspec(nx, nx), vspec(),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ] + [vspec(*c.shape) for c in consts]
    scratch = [
        pltpu.VMEM((2, nx, SUB, 128), dtype),   # x_i
        pltpu.VMEM((2, nu, SUB, 128), dtype),   # u_i
        pltpu.SemaphoreType.DMA((2, 2)),
    ]

    # model constants, lane-broadcast (loop-invariant; XLA hoists the
    # broadcasts out of the solve's while_loop)
    consts_b = [jnp.broadcast_to(
                    jnp.asarray(c).reshape(jnp.shape(c) + (1, 1)),
                    jnp.shape(c) + (B4, 128))
                for c in consts]

    ks, Ks, dV, okf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(xs, us, VxT, VxxT, lam,
      jnp.reshape(t0, (1, 1)).astype(jnp.float32), *consts_b)
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
