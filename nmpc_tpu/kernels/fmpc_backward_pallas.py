"""Pallas TPU kernel: fully-fused FMPC condensed-Riccati backward pass.

One kernel program runs the ENTIRE condensed primal-dual Riccati recursion
(reference ``FmpcSolver.hpp:524-665``: (s, nu) condensation via the nu/s
diagonal, F/H/G assembly, the KKT block factorization LLT(G) with the
LU fallback, and the (s_vec, P) value recursion) for a block of SUB*128
batch lanes.  The value-function carry (s_vec, P) stays resident in VMEM
across all N stages; per-stage coefficient slices stream from HBM through
two double-buffered DMA slots, exactly like the DDP kernel
(kernels/ddp_backward_pallas.py), and per-stage outputs (k, K, s_vec, P)
stream back to HBM through another pair of double-buffered slots, so the
VMEM footprint is independent of the horizon length N.

The slack/dual condensation scalings ``nu_s = nu/s`` and
``tilde = (nu/s)*g_bar - nu + eps/s`` are precomputed OUTSIDE the kernel
(cheap elementwise XLA, already fused) so the kernel streams 12 per-stage
quantities and needs no per-lane barrier input.

Layout contract (identical to solvers/fmpc.py::_backward_bm): every input
is batch-minor with B reshaped to (B4, 128) trailing tiles; outputs are
  ks [N, nu, B4, 128], Ks [N, nu, nx, B4, 128],
  svecs [N, nx, B4, 128], Ps [N, nx, nx, B4, 128], ok [B4, 128] (f32 0/1).
Numerical semantics match ``_backward_bm`` (same unrolled Cholesky with the
Eigen-LLT pivot>0 failure rule; same partial-pivot Gauss-Jordan fallback as
``parallel_riccati._inv_bl`` when ``break_if_llt_fails`` is off); parity is
tested in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nmpc_tpu.kernels.ddp_backward_pallas import (
    _chol_solve_t,
    _chol_t,
    _mm_t,
    _mv_t,
    _transpose_t,
)


def _inv_t(A, n):
    """Unrolled Gauss-Jordan inverse with partial pivoting on tile-matrices
    (mirrors ``parallel_riccati._inv_bl`` lane-for-lane, so the LU-fallback
    gains match the stacked XLA path bit-for-bit in spirit)."""
    a = [[A[i][j] for j in range(n)] for i in range(n)]
    zeros = jnp.zeros_like(A[0][0])
    ones = jnp.ones_like(A[0][0])
    inv = [[ones if i == j else zeros for j in range(n)] for i in range(n)]
    for col in range(n):
        for r in range(col + 1, n):
            swap = jnp.abs(a[r][col]) > jnp.abs(a[col][col])
            for j in range(n):
                a[col][j], a[r][j] = (jnp.where(swap, a[r][j], a[col][j]),
                                      jnp.where(swap, a[col][j], a[r][j]))
                inv[col][j], inv[r][j] = (
                    jnp.where(swap, inv[r][j], inv[col][j]),
                    jnp.where(swap, inv[col][j], inv[r][j]))
        piv = a[col][col]
        ipiv = 1.0 / jnp.where(piv == 0, 1e-30, piv)
        for j in range(n):
            a[col][j] = a[col][j] * ipiv
            inv[col][j] = inv[col][j] * ipiv
        for r in range(n):
            if r == col:
                continue
            f = a[r][col]
            for j in range(n):
                a[r][j] = a[r][j] - f * a[col][j]
                inv[r][j] = inv[r][j] - f * inv[col][j]
    return inv


_VMEM_BUDGET = 11 * 1024 * 1024


def _vmem_floats(nx: int, nu: int, ng: int, SUB: int) -> int:
    """Per-program VMEM footprint (floats) at a given SUB block size:
    2 input stage-DMA slots + 2 output stage-DMA slots + (sT, PT) blocks.
    Outputs stream back to HBM per stage, so the footprint is independent
    of the horizon length N."""
    in_slot = 2 * (2 * nx * nx + 2 * nx * nu + ng * nx + ng * nu
                   + nu * nu + 2 * nx + nu + 2 * ng)
    out_slot = 2 * (nu + nu * nx + nx + nx * nx)
    return SUB * 128 * (in_slot + out_slot + nx + nx * nx)


def _sub_candidates(B4: int):
    """Valid SUB block sizes, largest first: Mosaic requires the
    second-to-last block dim to be a multiple of 8 or equal to the full
    array dim, so SUB is either B4 itself or a multiple of 8 dividing B4."""
    cands = [B4]
    s = 512
    while s >= 8:
        if s < B4 and B4 % s == 0:
            cands.append(s)
        s //= 2
    return cands


def _pick_sub(nx: int, nu: int, ng: int, B4: int):
    for SUB in _sub_candidates(B4):
        if _vmem_floats(nx, nu, ng, SUB) * 4 <= _VMEM_BUDGET:
            return SUB
    return None


def _vmem_floats_resident(nx: int, nu: int, ng: int, N: int,
                          SUB: int) -> int:
    """Per-program VMEM footprint (floats) of the RESIDENT kernel: whole
    [N, ...] input and output blocks live in VMEM (x2: Pallas
    double-buffers grid blocks), plus the carry."""
    in_stage = (2 * nx * nx + 2 * nx * nu + ng * nx + ng * nu
                + nu * nu + 2 * nx + nu + 2 * ng)
    out_stage = nu + nu * nx + nx + nx * nx
    return 2 * SUB * 128 * (N * (in_stage + out_stage) + nx + nx * nx + 1)


# static-unroll bound for the resident kernel's stage loop (compile time)
_RESIDENT_MAX_N = 32


def _pick_sub_resident(nx: int, nu: int, ng: int, N: int, B4: int):
    if N > _RESIDENT_MAX_N:
        return None
    for SUB in _sub_candidates(B4):
        if _vmem_floats_resident(nx, nu, ng, N, SUB) * 4 <= _VMEM_BUDGET:
            return SUB
    return None


def fmpc_pallas_fits_vmem(nx: int, nu: int, ng: int, N: int,
                          B: int = 128) -> bool:
    """True when the kernel has a legal block size within the VMEM budget.
    The ``backward_impl='auto'`` eligibility check in solvers/fmpc.py uses
    this so oversized problems fall back to the stacked path instead of
    failing at runtime with a Mosaic error.  (N is accepted for signature
    stability; the streamed-output kernel's footprint is N-independent.)"""
    del N
    return B % 128 == 0 and _pick_sub(nx, nu, ng, B // 128) is not None


_IN_FIELDS = ("A", "B", "C", "D", "Lxx", "Luu", "Lxu",
              "xb", "Lxb", "Lub", "nu_s", "tilde")
_OUT_FIELDS = ("k", "K", "svec", "P")


def _field_offsets(nx: int, nu: int, ng: int):
    """(input_offsets, Fin, output_offsets, Fout) of the packed per-stage
    buffers.  Same roofline lever as the DDP kernel
    (ddp_backward_pallas._field_offsets): the unpacked kernel issues 12
    input + 4 output DMAs per stage, which leaves it DMA-issue-bound below
    50% of the HBM roofline; packing makes each stage one DMA each way."""
    sizes = {"A": nx * nx, "B": nx * nu, "C": ng * nx, "D": ng * nu,
             "Lxx": nx * nx, "Luu": nu * nu, "Lxu": nx * nu,
             "xb": nx, "Lxb": nx, "Lub": nu, "nu_s": ng, "tilde": ng}
    off_in, o = {}, 0
    for name in _IN_FIELDS:
        off_in[name] = o
        o += sizes[name]
    out_sizes = {"k": nu, "K": nu * nx, "svec": nx, "P": nx * nx}
    off_out, oo = {}, 0
    for name in _OUT_FIELDS:
        off_out[name] = oo
        oo += out_sizes[name]
    return off_in, o, off_out, oo


def _fmpc_stage(dt, break_if_llt_fails, nx, nu, ng, fields, carry):
    """One condensed-Riccati stage on loaded tile-fields (shared by the
    packed and unpacked kernels).  Returns (new_carry, k, K, s_new, P_sym).
    Mirrors ``FmpcSolver.hpp:551-637``: (s, nu) condensation, F/H/G
    assembly, LLT(G) + Gauss-Jordan LU fallback, value recursion."""
    s_vec, P, ok = carry
    A, Bm = fields["A"], fields["B"]
    C, D = fields["C"], fields["D"]
    Lxx, Luu, Lxu = fields["Lxx"], fields["Luu"], fields["Lxu"]
    xb, Lxb, Lub = fields["xb"], fields["Lxb"], fields["Lub"]
    nu_s, tilde = fields["nu_s"], fields["tilde"]

    # (s, nu) condensation (FmpcSolver.hpp:572-579)
    CT = _transpose_t(C, ng, nx)
    DT = _transpose_t(D, ng, nu)
    nsC = [[nu_s[a] * C[a][b] for b in range(nx)] for a in range(ng)]
    nsD = [[nu_s[a] * D[a][b] for b in range(nu)] for a in range(ng)]
    M = _mm_t(CT, nsC, nx, ng, nx)
    Qxx = [[dt * Lxx[a][b] + M[a][b] for b in range(nx)] for a in range(nx)]
    M = _mm_t(DT, nsD, nu, ng, nu)
    Quu = [[dt * Luu[a][b] + M[a][b] for b in range(nu)] for a in range(nu)]
    M = _mm_t(CT, nsD, nx, ng, nu)
    Qxu = [[dt * Lxu[a][b] + M[a][b] for b in range(nu)] for a in range(nx)]
    t = _mv_t(CT, tilde, nx, ng)
    Lx_t = [Lxb[a] + t[a] for a in range(nx)]
    t = _mv_t(DT, tilde, nu, ng)
    Lu_t = [Lub[a] + t[a] for a in range(nu)]

    # F/H/G assembly (FmpcSolver.hpp:581-583)
    AT = _transpose_t(A, nx, nx)
    BT = _transpose_t(Bm, nx, nu)
    PA = _mm_t(P, A, nx, nx, nx)
    PB = _mm_t(P, Bm, nx, nx, nu)
    M = _mm_t(AT, PA, nx, nx, nx)
    F = [[Qxx[a][b] + M[a][b] for b in range(nx)] for a in range(nx)]
    M = _mm_t(AT, PB, nx, nx, nu)
    H = [[Qxu[a][b] + M[a][b] for b in range(nu)] for a in range(nx)]
    M = _mm_t(BT, PB, nu, nx, nu)
    G = [[Quu[a][b] + M[a][b] for b in range(nu)] for a in range(nu)]

    # KKT block factorization: LLT(G) + LU fallback (FmpcSolver.hpp:594-618)
    Pxb = _mv_t(P, xb, nx, nx)
    rhs = _mv_t(BT, [Pxb[a] - s_vec[a] for a in range(nx)], nu, nx)
    rhs_k = [rhs[a] + Lu_t[a] for a in range(nu)]
    HT = _transpose_t(H, nx, nu)
    L, pd = _chol_t(G, nu)
    k_ch = [-v[0] for v in _chol_solve_t(L, [[r] for r in rhs_k], nu, 1)]
    Ksol = _chol_solve_t(L, HT, nu, nx)
    K_ch = [[-Ksol[a][b] for b in range(nx)] for a in range(nu)]
    if break_if_llt_fails:
        k, K = k_ch, K_ch
        ok = ok * pd
    else:
        Ginv = _inv_t(G, nu)
        k_lu = [-v for v in _mv_t(Ginv, rhs_k, nu, nu)]
        KM = _mm_t(Ginv, HT, nu, nu, nx)
        k = [jnp.where(pd > 0, k_ch[a], k_lu[a]) for a in range(nu)]
        K = [[jnp.where(pd > 0, K_ch[a][b], -KM[a][b])
              for b in range(nx)] for a in range(nu)]

    # value recursion (FmpcSolver.hpp:633-637)
    sMx = [s_vec[a] - Pxb[a] for a in range(nx)]
    t1 = _mv_t(AT, sMx, nx, nx)
    t2 = _mv_t(H, k, nx, nu)
    s_new = [t1[a] - Lx_t[a] - t2[a] for a in range(nx)]
    GK = _mm_t(G, K, nu, nu, nx)
    KT = _transpose_t(K, nu, nx)
    T1 = _mm_t(KT, GK, nx, nu, nx)
    P_new = [[F[a][b] - T1[a][b] for b in range(nx)] for a in range(nx)]
    P_sym = [[0.5 * (P_new[a][b] + P_new[b][a]) for b in range(nx)]
             for a in range(nx)]

    return (s_new, P_sym, ok), k, K, s_new, P_sym


def _make_kernel_packed(dt: float, break_if_llt_fails: bool,
                        nx: int, nu: int, ng: int, N: int, SUB: int):
    """Packed-DMA kernel: one input DMA and one output DMA per stage."""
    OFF_IN, FIN, OFF_OUT, FOUT = _field_offsets(nx, nu, ng)

    def kernel(P_hbm, sT_ref, PT_ref, out_ref, ok_ref, P_s, O_s, sems, osems):
        g = pl.program_id(0)
        b0 = g * SUB

        def stage_dma(slot, i):
            return pltpu.make_async_copy(
                P_hbm.at[i, :, pl.ds(b0, SUB), :], P_s.at[slot],
                sems.at[slot])

        def out_dma(slot, i):
            return pltpu.make_async_copy(
                O_s.at[slot], out_ref.at[i, :, pl.ds(b0, SUB), :],
                osems.at[slot])

        stage_dma(0, N - 1).start()

        def load_mat(slot, name, n, m):
            o = OFF_IN[name]
            return [[P_s[slot, o + a * m + b] for b in range(m)]
                    for a in range(n)]

        def load_vec(slot, name, n):
            o = OFF_IN[name]
            return [P_s[slot, o + a] for a in range(n)]

        s_vec = [sT_ref[a] for a in range(nx)]
        P = [[PT_ref[a, b] for b in range(nx)] for a in range(nx)]
        ok = jnp.ones_like(s_vec[0])

        def body(j, carry):
            i = N - 1 - j
            slot = lax.rem(j, 2)
            next_slot = lax.rem(j + 1, 2)

            @pl.when(j + 1 < N)
            def _():
                stage_dma(next_slot, i - 1).start()

            stage_dma(slot, i).wait()

            # the output slot we are about to overwrite was DMA'd out two
            # stages ago (stage i+2); wait for that copy to land first
            @pl.when(j >= 2)
            def _():
                out_dma(slot, i + 2).wait()

            fields = {name: load_mat(slot, name, n, m)
                      for name, n, m in (
                          ("A", nx, nx), ("B", nx, nu), ("C", ng, nx),
                          ("D", ng, nu), ("Lxx", nx, nx), ("Luu", nu, nu),
                          ("Lxu", nx, nu))}
            for name, n in (("xb", nx), ("Lxb", nx), ("Lub", nu),
                            ("nu_s", ng), ("tilde", ng)):
                fields[name] = load_vec(slot, name, n)

            new_carry, k, K, s_new, P_sym = _fmpc_stage(
                dt, break_if_llt_fails, nx, nu, ng, fields, carry)

            ko, Ko = OFF_OUT["k"], OFF_OUT["K"]
            so, Po = OFF_OUT["svec"], OFF_OUT["P"]
            for a in range(nu):
                O_s[slot, ko + a] = k[a]
                for b in range(nx):
                    O_s[slot, Ko + a * nx + b] = K[a][b]
            for a in range(nx):
                O_s[slot, so + a] = s_new[a]
                for b in range(nx):
                    O_s[slot, Po + a * nx + b] = P_sym[a][b]
            out_dma(slot, i).start()

            return new_carry

        _, _, ok = lax.fori_loop(0, N, body, (s_vec, P, ok))
        # drain the in-flight output copies (stages i=0 and i=1)
        out_dma((N - 1) % 2, 0).wait()
        if N >= 2:
            out_dma((N - 2) % 2, 1).wait()
        ok_ref[:, :] = ok

    return kernel


def _make_kernel(dt: float, break_if_llt_fails: bool,
                 nx: int, nu: int, ng: int, N: int, SUB: int):
    """Fused backward kernel with manual double-buffered stage DMA."""

    def kernel(A_hbm, B_hbm, C_hbm, D_hbm, Lxx_hbm, Luu_hbm, Lxu_hbm,
               xb_hbm, Lxb_hbm, Lub_hbm, nus_hbm, til_hbm,
               sT_ref, PT_ref,
               ks_ref, Ks_ref, sv_ref, Ps_ref, ok_ref,
               A_s, B_s, C_s, D_s, Lxx_s, Luu_s, Lxu_s,
               xb_s, Lxb_s, Lub_s, nus_s, til_s,
               ks_o, Ks_o, sv_o, Ps_o, sems, osems):
        g = pl.program_id(0)
        b0 = g * SUB

        hbm = [A_hbm, B_hbm, C_hbm, D_hbm, Lxx_hbm, Luu_hbm, Lxu_hbm,
               xb_hbm, Lxb_hbm, Lub_hbm, nus_hbm, til_hbm]
        scr = [A_s, B_s, C_s, D_s, Lxx_s, Luu_s, Lxu_s,
               xb_s, Lxb_s, Lub_s, nus_s, til_s]

        def stage_dmas(slot, i):
            out = []
            for w, (h, s) in enumerate(zip(hbm, scr)):
                if h.ndim == 5:
                    src = h.at[i, :, :, pl.ds(b0, SUB), :]
                else:
                    src = h.at[i, :, pl.ds(b0, SUB), :]
                out.append(pltpu.make_async_copy(src, s.at[slot],
                                                 sems.at[w, slot]))
            return out

        out_hbm = [ks_ref, Ks_ref, sv_ref, Ps_ref]
        out_scr = [ks_o, Ks_o, sv_o, Ps_o]

        def out_dmas(slot, i):
            """Streamed per-stage output copies VMEM slot -> HBM[i]."""
            out = []
            for w, (h, s) in enumerate(zip(out_hbm, out_scr)):
                if h.ndim == 5:
                    dst = h.at[i, :, :, pl.ds(b0, SUB), :]
                else:
                    dst = h.at[i, :, pl.ds(b0, SUB), :]
                out.append(pltpu.make_async_copy(s.at[slot], dst,
                                                 osems.at[w, slot]))
            return out

        for d in stage_dmas(0, N - 1):
            d.start()

        def load_mat(ref, slot, n, m):
            return [[ref[slot, a, b] for b in range(m)] for a in range(n)]

        def load_vec(ref, slot, n):
            return [ref[slot, a] for a in range(n)]

        s_vec = [sT_ref[a] for a in range(nx)]
        P = [[PT_ref[a, b] for b in range(nx)] for a in range(nx)]
        ok = jnp.ones_like(s_vec[0])  # f32 0/1 (bool carries won't legalize)

        def body(j, carry):
            s_vec, P, ok = carry
            i = N - 1 - j
            slot = lax.rem(j, 2)
            next_slot = lax.rem(j + 1, 2)

            @pl.when(j + 1 < N)
            def _():
                for d in stage_dmas(next_slot, i - 1):
                    d.start()

            for d in stage_dmas(slot, i):
                d.wait()

            # the output slot we are about to overwrite was DMA'd out two
            # stages ago (stage i+2); wait for that copy to land first
            @pl.when(j >= 2)
            def _():
                for d in out_dmas(slot, i + 2):
                    d.wait()

            fields = {
                "A": load_mat(A_s, slot, nx, nx),
                "B": load_mat(B_s, slot, nx, nu),
                "C": load_mat(C_s, slot, ng, nx),
                "D": load_mat(D_s, slot, ng, nu),
                "Lxx": load_mat(Lxx_s, slot, nx, nx),
                "Luu": load_mat(Luu_s, slot, nu, nu),
                "Lxu": load_mat(Lxu_s, slot, nx, nu),
                "xb": load_vec(xb_s, slot, nx),
                "Lxb": load_vec(Lxb_s, slot, nx),
                "Lub": load_vec(Lub_s, slot, nu),
                "nu_s": load_vec(nus_s, slot, ng),
                "tilde": load_vec(til_s, slot, ng),
            }
            new_carry, k, K, s_new, P_sym = _fmpc_stage(
                dt, break_if_llt_fails, nx, nu, ng, fields, carry)

            for a in range(nu):
                ks_o[slot, a] = k[a]
                for b in range(nx):
                    Ks_o[slot, a, b] = K[a][b]
            for a in range(nx):
                sv_o[slot, a] = s_new[a]
                for b in range(nx):
                    Ps_o[slot, a, b] = P_sym[a][b]
            for d in out_dmas(slot, i):
                d.start()

            return new_carry

        _, _, ok = lax.fori_loop(0, N, body, (s_vec, P, ok))
        # drain the in-flight output copies (stages i=0 and i=1)
        for d in out_dmas((N - 1) % 2, 0):
            d.wait()
        if N >= 2:
            for d in out_dmas((N - 2) % 2, 1):
                d.wait()
        ok_ref[:, :] = ok

    return kernel


def _make_kernel_resident(dt: float, break_if_llt_fails: bool,
                          nx: int, nu: int, ng: int, N: int):
    """Whole-horizon-resident kernel for SMALL shapes (round 4, VERDICT r3
    item #6): every input/output array lives in VMEM as one [N, ...] block
    and the stage loop is statically unrolled — zero manual DMAs, zero
    per-stage issue latency.  The streaming kernel pays ~16 DMA issues per
    stage; at oscillator N=20 that fixed cost held it at 10.4% of the HBM
    roofline (BENCH_RESULTS.md).  Eligibility: N <= _RESIDENT_MAX_N and
    the footprint of _vmem_floats_resident fits the budget."""

    def kernel(A_s, B_s, C_s, D_s, Lxx_s, Luu_s, Lxu_s,
               xb_s, Lxb_s, Lub_s, nus_s, til_s,
               sT_ref, PT_ref,
               ks_ref, Ks_ref, sv_ref, Ps_ref, ok_ref):
        def load_mat(ref, i, n, m):
            return [[ref[i, a, b] for b in range(m)] for a in range(n)]

        def load_vec(ref, i, n):
            return [ref[i, a] for a in range(n)]

        s_vec = [sT_ref[a] for a in range(nx)]
        P = [[PT_ref[a, b] for b in range(nx)] for a in range(nx)]
        ok = jnp.ones_like(s_vec[0])
        carry = (s_vec, P, ok)

        for i in range(N - 1, -1, -1):   # static unroll
            fields = {
                "A": load_mat(A_s, i, nx, nx),
                "B": load_mat(B_s, i, nx, nu),
                "C": load_mat(C_s, i, ng, nx),
                "D": load_mat(D_s, i, ng, nu),
                "Lxx": load_mat(Lxx_s, i, nx, nx),
                "Luu": load_mat(Luu_s, i, nu, nu),
                "Lxu": load_mat(Lxu_s, i, nx, nu),
                "xb": load_vec(xb_s, i, nx),
                "Lxb": load_vec(Lxb_s, i, nx),
                "Lub": load_vec(Lub_s, i, nu),
                "nu_s": load_vec(nus_s, i, ng),
                "tilde": load_vec(til_s, i, ng),
            }
            carry, k, K, s_new, P_sym = _fmpc_stage(
                dt, break_if_llt_fails, nx, nu, ng, fields, carry)
            for a in range(nu):
                ks_ref[i, a] = k[a]
                for b in range(nx):
                    Ks_ref[i, a, b] = K[a][b]
            for a in range(nx):
                sv_ref[i, a] = s_new[a]
                for b in range(nx):
                    Ps_ref[i, a, b] = P_sym[a][b]

        ok_ref[:, :] = carry[2]

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _fmpc_backward_pallas_call_resident(dt, break_if_llt_fails, nx, nu, ng,
                                        N, A, B, C, D, Lxx, Luu, Lxu,
                                        xb, Lxb, Lub, nu_s, tilde, sT, PT):
    """Resident-variant call: same signature/outputs as
    ``_fmpc_backward_pallas_call``."""
    B4 = sT.shape[-2]
    dtype = A.dtype
    SUB = _pick_sub_resident(nx, nu, ng, N, B4)
    assert SUB is not None, "resident kernel selected but does not fit"
    grid = (B4 // SUB,)

    def vspec(*dims):
        block = tuple(dims) + (SUB, 128)
        nlead = len(dims)
        return pl.BlockSpec(block,
                            lambda i, nlead=nlead: (0,) * nlead + (i, 0),
                            memory_space=pltpu.VMEM)

    kernel = _make_kernel_resident(dt, break_if_llt_fails, nx, nu, ng, N)
    out_shape = (
        jax.ShapeDtypeStruct((N, nu, B4, 128), dtype),
        jax.ShapeDtypeStruct((N, nu, nx, B4, 128), dtype),
        jax.ShapeDtypeStruct((N, nx, B4, 128), dtype),
        jax.ShapeDtypeStruct((N, nx, nx, B4, 128), dtype),
        jax.ShapeDtypeStruct((B4, 128), jnp.float32),
    )
    out_specs = (vspec(N, nu), vspec(N, nu, nx), vspec(N, nx),
                 vspec(N, nx, nx), vspec())
    in_specs = [vspec(N, nx, nx), vspec(N, nx, nu), vspec(N, ng, nx),
                vspec(N, ng, nu), vspec(N, nx, nx), vspec(N, nu, nu),
                vspec(N, nx, nu), vspec(N, nx), vspec(N, nx), vspec(N, nu),
                vspec(N, ng), vspec(N, ng), vspec(nx), vspec(nx, nx)]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(A, B, C, D, Lxx, Luu, Lxu, xb, Lxb, Lub, nu_s, tilde, sT, PT)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _fmpc_backward_pallas_call(dt, break_if_llt_fails, nx, nu, ng, N,
                               A, B, C, D, Lxx, Luu, Lxu,
                               xb, Lxb, Lub, nu_s, tilde, sT, PT):
    """Inputs batch-minor with B reshaped to (B4, 128)."""
    B4 = sT.shape[-2]
    dtype = A.dtype
    # VMEM per program: 2 input stage slots + 2 output stage slots + carry.
    # SUB must be B4 or a multiple of 8 dividing B4 (Mosaic block rule).
    SUB = _pick_sub(nx, nu, ng, B4)
    if SUB is None:
        raise ValueError(
            f"FMPC Pallas backward has no legal block size within the "
            f"~11MiB VMEM budget (nx={nx}, nu={nu}, ng={ng}, B4={B4}); "
            f"use backward_impl='stacked' for this problem shape")
    grid = (B4 // SUB,)

    def vspec(*dims):
        block = tuple(dims) + (SUB, 128)
        nlead = len(dims)
        return pl.BlockSpec(block,
                            lambda i, nlead=nlead: (0,) * nlead + (i, 0),
                            memory_space=pltpu.VMEM)

    kernel = _make_kernel(dt, break_if_llt_fails, nx, nu, ng, N, SUB)
    out_shape = (
        jax.ShapeDtypeStruct((N, nu, B4, 128), dtype),
        jax.ShapeDtypeStruct((N, nu, nx, B4, 128), dtype),
        jax.ShapeDtypeStruct((N, nx, B4, 128), dtype),
        jax.ShapeDtypeStruct((N, nx, nx, B4, 128), dtype),
        jax.ShapeDtypeStruct((B4, 128), jnp.float32),
    )
    # the 4 trajectory outputs stay in HBM and are written by streamed
    # per-stage DMAs from double-buffered VMEM slots, so VMEM use does not
    # grow with N (the r2 kernel held all N stages resident and hit the
    # Mosaic block-size wall at N=100)
    out_specs = (pl.BlockSpec(memory_space=pl.ANY),
                 pl.BlockSpec(memory_space=pl.ANY),
                 pl.BlockSpec(memory_space=pl.ANY),
                 pl.BlockSpec(memory_space=pl.ANY),
                 vspec())
    in_specs = ([pl.BlockSpec(memory_space=pl.ANY)] * 12
                + [vspec(nx), vspec(nx, nx)])
    scratch = [
        pltpu.VMEM((2, nx, nx, SUB, 128), dtype),   # A
        pltpu.VMEM((2, nx, nu, SUB, 128), dtype),   # B
        pltpu.VMEM((2, ng, nx, SUB, 128), dtype),   # C
        pltpu.VMEM((2, ng, nu, SUB, 128), dtype),   # D
        pltpu.VMEM((2, nx, nx, SUB, 128), dtype),   # Lxx
        pltpu.VMEM((2, nu, nu, SUB, 128), dtype),   # Luu
        pltpu.VMEM((2, nx, nu, SUB, 128), dtype),   # Lxu
        pltpu.VMEM((2, nx, SUB, 128), dtype),       # x_bar
        pltpu.VMEM((2, nx, SUB, 128), dtype),       # Lx_bar
        pltpu.VMEM((2, nu, SUB, 128), dtype),       # Lu_bar
        pltpu.VMEM((2, ng, SUB, 128), dtype),       # nu_s
        pltpu.VMEM((2, ng, SUB, 128), dtype),       # tilde
        pltpu.VMEM((2, nu, SUB, 128), dtype),       # ks out slot
        pltpu.VMEM((2, nu, nx, SUB, 128), dtype),   # Ks out slot
        pltpu.VMEM((2, nx, SUB, 128), dtype),       # svec out slot
        pltpu.VMEM((2, nx, nx, SUB, 128), dtype),   # P out slot
        pltpu.SemaphoreType.DMA((12, 2)),
        pltpu.SemaphoreType.DMA((4, 2)),
    ]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(A, B, C, D, Lxx, Luu, Lxu, xb, Lxb, Lub, nu_s, tilde, sT, PT)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _fmpc_backward_pallas_call_packed(dt, break_if_llt_fails, nx, nu, ng, N,
                                      P_in, sT, PT):
    """Packed variant: P_in is [N, Fin, B4, 128] (see ``_field_offsets``);
    returns (out [N, Fout, B4, 128], ok).  One DMA per stage each way."""
    B4 = sT.shape[-2]
    dtype = P_in.dtype
    SUB = _pick_sub(nx, nu, ng, B4)
    if SUB is None:
        raise ValueError(
            f"FMPC Pallas backward has no legal block size within the "
            f"~11MiB VMEM budget (nx={nx}, nu={nu}, ng={ng}, B4={B4}); "
            f"use backward_impl='stacked' for this problem shape")
    grid = (B4 // SUB,)
    _, FIN, _, FOUT = _field_offsets(nx, nu, ng)

    def vspec(*dims):
        block = tuple(dims) + (SUB, 128)
        nlead = len(dims)
        return pl.BlockSpec(block,
                            lambda i, nlead=nlead: (0,) * nlead + (i, 0),
                            memory_space=pltpu.VMEM)

    kernel = _make_kernel_packed(dt, break_if_llt_fails, nx, nu, ng, N, SUB)
    out_shape = (
        jax.ShapeDtypeStruct((N, FOUT, B4, 128), dtype),
        jax.ShapeDtypeStruct((B4, 128), jnp.float32),
    )
    out_specs = (pl.BlockSpec(memory_space=pl.ANY), vspec())
    in_specs = [pl.BlockSpec(memory_space=pl.ANY), vspec(nx), vspec(nx, nx)]
    scratch = [
        pltpu.VMEM((2, FIN, SUB, 128), dtype),
        pltpu.VMEM((2, FOUT, SUB, 128), dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(P_in, sT, PT)


def backward_fmpc_pallas(problem, config, co, ss, nus, gms, barrier_eps,
                         packed: bool | None = None):
    """Drop-in for ``solvers.fmpc._backward_bm`` (same signature minus the
    module split; same batch-minor layout) backed by the fused Pallas kernel.

    Requires B % 128 == 0 and ng >= 1 (the batched solver gates eligibility).
    Returns (ks, Ks, ss_all [N+1], Ps_all [N+1], ok_pd, finite).
    """
    N, ng = co.C.shape[0], co.C.shape[1]
    nx = co.A.shape[1]
    nu = co.B.shape[2]
    B = barrier_eps.shape[0]
    assert B % 128 == 0, "pallas fmpc backward requires B % 128 == 0"
    assert ng >= 1
    if not fmpc_pallas_fits_vmem(nx, nu, ng, N, B):
        raise ValueError(
            f"FMPC Pallas backward does not fit the ~11MiB VMEM budget at "
            f"any legal block size (nx={nx}, nu={nu}, ng={ng}, B={B}); "
            f"use backward_impl='stacked' for this problem shape")
    B4 = B // 128

    # condensation scalings, precomputed (elementwise; XLA fuses these)
    gm_e = gms[:, :, None]
    nu_s = jnp.where(gm_e > 0, nus / ss, 0.0)
    tilde = jnp.where(
        gm_e > 0, nu_s * co.g_bar - nus + barrier_eps[None, None, :] / ss, 0.0)

    s_T = -co.Lx_bar_term
    P_T = co.Lxx_term

    # packed-input kernel is experimental opt-in: packing at this boundary
    # costs un-fusable concatenate passes (see ddp_backward_pallas.
    # backward_pallas docstring for the measured A/B)
    if packed is None:
        import os
        packed = os.environ.get("NMPC_PALLAS_PACKED", "0") == "1"

    r = lambda a: a.reshape(a.shape[:-1] + (B4, 128))
    unr = lambda a: a.reshape(a.shape[:-2] + (B,))
    if packed:
        # one DMA per stage each way (see _field_offsets); the concatenate
        # fuses into the coefficient sweep inside the solver jit
        rp = lambda a: a.reshape((N, -1, B4, 128))
        P_in = jnp.concatenate(
            [rp(co.A), rp(co.B), rp(co.C), rp(co.D), rp(co.Lxx), rp(co.Luu),
             rp(co.Lxu), rp(co.x_bar), rp(co.Lx_bar), rp(co.Lu_bar),
             rp(nu_s), rp(tilde)], axis=1)
        out, okf = _fmpc_backward_pallas_call_packed(
            float(problem.dt), bool(config.break_if_llt_fails),
            nx, nu, ng, N, P_in, r(s_T), r(P_T))
        OFF_IN, _, OFF_OUT, _ = _field_offsets(nx, nu, ng)
        ko, Ko = OFF_OUT["k"], OFF_OUT["K"]
        so, Po = OFF_OUT["svec"], OFF_OUT["P"]
        ks = unr(out[:, ko:ko + nu])
        Ks = unr(out[:, Ko:Ko + nu * nx].reshape((N, nu, nx, B4, 128)))
        svecs = unr(out[:, so:so + nx])
        Ps = unr(out[:, Po:Po + nx * nx].reshape((N, nx, nx, B4, 128)))
    else:
        # Streaming is the default at every shape.  The whole-horizon
        # RESIDENT variant (opt-in: NMPC_FMPC_PALLAS=resident) was built
        # for small shapes (VERDICT r3 item #6, "10.4% of roofline at
        # oscillator N=20") — but measuring the kernels CHAINED INSIDE ONE
        # JIT (tools/, round 4) showed that number was per-dispatch tunnel
        # overhead, not kernel time: in-graph the streaming kernel runs
        # 9.2 us/call at oscillator N=20 B=4096 — at/above the modeled
        # memory bound — and the resident variant is speed-neutral
        # (9.6 us) while being VMEM-capped to smaller SUB blocks.
        import os

        mode = os.environ.get("NMPC_FMPC_PALLAS", "stream")
        resident = (mode == "resident"
                    and _pick_sub_resident(nx, nu, ng, N, B4) is not None)
        call = (_fmpc_backward_pallas_call_resident if resident
                else _fmpc_backward_pallas_call)
        ks, Ks, svecs, Ps, okf = call(
            float(problem.dt), bool(config.break_if_llt_fails), nx, nu, ng,
            N, r(co.A), r(co.B), r(co.C), r(co.D), r(co.Lxx), r(co.Luu),
            r(co.Lxu), r(co.x_bar), r(co.Lx_bar), r(co.Lu_bar), r(nu_s),
            r(tilde), r(s_T), r(P_T))
        ks, Ks, svecs, Ps = unr(ks), unr(Ks), unr(svecs), unr(Ps)
    ok = unr(okf) > 0.5

    ss_all = jnp.concatenate([svecs, s_T[None]], axis=0)
    Ps_all = jnp.concatenate([Ps, P_T[None]], axis=0)

    finite = jnp.ones((B,), dtype=bool)
    if config.check_nan:
        def fin(a):
            return jnp.all(jnp.isfinite(a), axis=tuple(range(a.ndim - 1)))
        finite = fin(ks) & fin(Ks) & fin(ss_all) & fin(Ps_all)
    return (ks, Ks, ss_all, Ps_all, ok, finite)
