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


def _stage_scalar_fn(problem, config: DDPConfig, boxed: bool):
    """Single-instance stage-derivative function with a fixed output
    order (the 7 Riccati fields, plus bounds when boxed)."""
    from nmpc_tpu.solvers.ddp import _stage_derivs

    def f(t, x, u):
        D = _stage_derivs(problem, config, t, x, u)
        base = (D.Fx, D.Fu, D.Lx, D.Lu, D.Lxx, D.Luu, D.Lxu)
        return base + ((D.lower, D.upper, D.u) if boxed else ())

    return f


@functools.lru_cache(maxsize=64)
def _hoist_consts(problem, config: DDPConfig, boxed: bool, nx: int, nu: int,
                  dtype_name: str):
    """Trace the scalar stage function once and hoist its captured array
    constants (model weights, plant parameters) into explicit arguments:
    returns (pure_fn(t, x, u, *consts) -> field tuple, consts tuple).
    Cached per (problem, config) so the trace cost is paid once."""
    dtype = jnp.dtype(dtype_name)
    f = _stage_scalar_fn(problem, config, boxed)
    closed = jax.make_jaxpr(f)(
        jax.ShapeDtypeStruct((), dtype),
        jax.ShapeDtypeStruct((nx,), dtype),
        jax.ShapeDtypeStruct((nu,), dtype))
    consts = tuple(closed.consts)
    n_out = 10 if boxed else 7

    def pure_fn(t, x, u, *cs):
        out = _eval_jaxpr(closed.jaxpr, cs, t, x, u)
        return tuple(out[:n_out])

    return pure_fn, consts


def _make_kernel_remat(problem, config: DDPConfig, nx: int, nu: int,
                       N: int, SUB: int, boxed: bool, pure_fn,
                       n_consts: int):
    """Grid-over-stages kernel: the horizon is the FASTEST grid dimension
    (grid = (B-blocks, N), sequential on TPU), so Pallas streams the
    per-stage (x_i, u_i) input blocks and (k_i, K_i) output blocks with
    its own double-buffered pipeline — only ONE stage of data is resident
    at a time, and VMEM stays O(1) in the horizon.  (A fori_loop-inside-
    one-program variant with N-leading output blocks was built first and
    hit Mosaic's 16 MB scoped-vmem wall at ~N*80 floats/lane — the
    per-stage remat temporaries were given whole-horizon live ranges.)
    The value-function carry persists across grid steps in scratch,
    reset at stage N-1 (grid j == 0) for each batch block."""
    from nmpc_tpu.kernels.lanes import vmap_lanes

    dt = float(problem.dt)
    f2 = vmap_lanes(pure_fn, 2 + n_consts)

    def kernel(*refs):
        (x_ref, u_ref, VxT_ref, VxxT_ref, lam_ref, t0_ref) = refs[:6]
        const_refs = refs[6:6 + n_consts]
        (ks_ref, Ks_ref, dV_ref, ok_ref,
         Vx_s, Vxx_s, acc_s, knext_s) = refs[6 + n_consts:]

        j = pl.program_id(1)
        i = N - 1 - j                      # stage index, walked backward
        lam = lam_ref[:, :]
        t0 = t0_ref[0, 0]
        consts = [c[...] for c in const_refs]

        @pl.when(j == 0)
        def _():
            # new batch block: seed the carry from the terminal expansion
            Vx_s[...] = VxT_ref[...]
            Vxx_s[...] = VxxT_ref[...]
            acc_s[...] = jnp.stack(
                [jnp.zeros_like(lam), jnp.zeros_like(lam),
                 jnp.ones_like(lam)])
            if boxed:
                knext_s[...] = jnp.zeros_like(knext_s)

        Vx = [Vx_s[a] for a in range(nx)]
        Vxx = [[Vxx_s[a, b] for b in range(nx)] for a in range(nx)]
        zeros = jnp.zeros_like(lam)

        # same fp32 ops as the sweep's t0 + dt * arange(N)
        t_i = t0 + jnp.float32(dt) * i.astype(jnp.float32)
        out = f2(t_i, x_ref[0], u_ref[0], *consts)
        mat = lambda A, n, m: [[A[a, b] for b in range(m)] for a in range(n)]
        vec = lambda V, n: [V[a] for a in range(n)]
        fields = {
            "Fx": mat(out[0], nx, nx), "Fu": mat(out[1], nx, nu),
            "Lx": vec(out[2], nx), "Lu": vec(out[3], nu),
            "Lxx": mat(out[4], nx, nx), "Luu": mat(out[5], nu, nu),
            "Lxu": mat(out[6], nx, nu),
        }
        if boxed:
            fields["lower"] = vec(out[7], nu)
            fields["upper"] = vec(out[8], nu)
            fields["u"] = vec(out[9], nu)
            carry = (Vx, Vxx, acc_s[0], acc_s[1], acc_s[2],
                     [knext_s[a] for a in range(nu)])
            new_carry, kvec, K = _riccati_stage_boxed(
                config, nx, nu, lam, zeros, fields, carry)
            for a in range(nu):
                knext_s[a] = new_carry[5][a]
        else:
            carry = (Vx, Vxx, acc_s[0], acc_s[1], acc_s[2])
            new_carry, kvec, K = _riccati_stage(
                config, nx, nu, lam, zeros, fields, carry)

        for a in range(nx):
            Vx_s[a] = new_carry[0][a]
            for b in range(nx):
                Vxx_s[a, b] = new_carry[1][a][b]
        acc_s[...] = jnp.stack([new_carry[2], new_carry[3], new_carry[4]])

        for a in range(nu):
            ks_ref[0, a] = kvec[a]
            for b in range(nx):
                Ks_ref[0, a, b] = K[a][b]

        @pl.when(j == N - 1)
        def _():
            dV_ref[0] = new_carry[2]
            dV_ref[1] = new_carry[3]
            ok_ref[...] = new_carry[4]

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _backward_remat_call(problem, config: DDPConfig, nx, nu, N, boxed,
                         xs, us, VxT, VxxT, lam, t0):
    """xs [N+1, nx, B4, 128] (stage N's terminal state rides along unused
    — passing the full array avoids a slice copy), us [N, nu, B4, 128],
    VxT [nx, B4, 128], VxxT [nx, nx, B4, 128], lam [B4, 128], t0 scalar."""
    B4 = lam.shape[0]
    dtype = xs.dtype
    pure_fn, consts = _hoist_consts(problem, config, boxed, nx, nu,
                                    jnp.dtype(dtype).name)
    # VMEM per grid step is O(1) in the horizon (grid-over-stages): the
    # per-stage in/out blocks (double-buffered by the pipeline), the
    # lane-broadcast consts, the carry scratch, and the ~100-tile live set
    # of the remat+Riccati trace.  A generous 256-floats/lane estimate for
    # the live set keeps SUB conservative.
    const_floats = sum(int(jnp.size(c)) for c in consts)
    per_lane = (2 * (nx + nu)                 # x/u blocks, double-buffered
                + 2 * (nu + nu * nx + 3)      # out blocks, double-buffered
                + 2 * const_floats
                + 2 * nx + nx * nx + 3 + nu   # carry scratch
                + 256)                        # traced live-set headroom
    budget = 11 * 1024 * 1024
    SUB = B4
    while SUB > 1 and SUB * 128 * 4 * per_lane > budget:
        SUB //= 2
    while B4 % SUB != 0:
        SUB //= 2
    grid = (B4 // SUB, N)

    def bspec(*dims):
        """Per-batch-block spec, constant across the stage grid dim."""
        block = tuple(dims) + (SUB, 128)
        nlead = len(dims)
        return pl.BlockSpec(block,
                            lambda i, j, nlead=nlead: (0,) * nlead + (i, 0),
                            memory_space=pltpu.VMEM)

    def sspec(*dims):
        """Per-stage spec: leading horizon axis indexed N-1-j."""
        block = (1,) + tuple(dims) + (SUB, 128)
        nlead = len(dims)
        return pl.BlockSpec(
            block,
            lambda i, j, nlead=nlead: (N - 1 - j,) + (0,) * nlead + (i, 0),
            memory_space=pltpu.VMEM)

    kernel = _make_kernel_remat(problem, config, nx, nu, N, SUB, boxed,
                                pure_fn, len(consts))
    out_shape = (
        jax.ShapeDtypeStruct((N, nu, B4, 128), dtype),
        jax.ShapeDtypeStruct((N, nu, nx, B4, 128), dtype),
        jax.ShapeDtypeStruct((2, B4, 128), dtype),
        jax.ShapeDtypeStruct((B4, 128), jnp.float32),
    )
    out_specs = (sspec(nu), sspec(nu, nx), bspec(2), bspec())
    in_specs = [sspec(nx), sspec(nu),
                bspec(nx), bspec(nx, nx), bspec(),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
                ] + [bspec(*c.shape) for c in consts]
    scratch = [
        pltpu.VMEM((nx, SUB, 128), dtype),        # Vx carry
        pltpu.VMEM((nx, nx, SUB, 128), dtype),    # Vxx carry
        pltpu.VMEM((3, SUB, 128), dtype),         # dV0, dV1, ok carry
        pltpu.VMEM((max(nu, 1), SUB, 128), dtype),  # BoxQP warm start
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
