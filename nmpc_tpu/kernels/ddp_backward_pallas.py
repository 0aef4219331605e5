"""Pallas TPU kernel: fully-fused DDP backward pass.

One kernel program runs the ENTIRE backward Riccati recursion
(``DDPSolver.hpp:343-534``) for a block of SUB*128 batch lanes: the
value-function carry (Vx, Vxx) lives in registers/VMEM across all N stages,
every small-matrix contraction is unrolled to elementwise VPU ops on
(SUB, 128) tiles, and nothing round-trips HBM between stages — the XLA
stacked version (kernels/ddp_backward.py) still materializes each scan
step's outputs.

Layout contract (matches the stacked solver's batch-minor layout):
  inputs  Fx [N, nx, nx, B4, 128], ..., lam [B4, 128]
  outputs ks [N, nu, B4, 128], Ks [N, nu, nx, B4, 128], dV [2, B4, 128],
          ok [B4, 128] (float 0/1)
with B = B4 * 128 and the grid tiling B4 into SUB-row blocks.

Numerical semantics are identical to ``backward_stacked`` (same unrolled
Cholesky with the Eigen-LLT pivot>0 failure rule); parity is tested.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nmpc_tpu.core.types import DDPConfig


def _mm_t(A, B, n, m, k):
    """Unrolled matmul of tile-matrices: A, B are [n][m] / [m][k] nested
    lists of (SUB, 128) tiles -> [n][k] list."""
    return [[sum(A[i][l] * B[l][j] for l in range(m)) for j in range(k)]
            for i in range(n)]


def _mv_t(A, v, n, m):
    return [sum(A[i][l] * v[l] for l in range(m)) for i in range(n)]


def _transpose_t(A, n, m):
    return [[A[i][j] for i in range(n)] for j in range(m)]


def _chol_t(A, n):
    """Unrolled Cholesky on tile-matrices; returns (L, ok_tile as f32 0/1 —
    bool vectors can't live in Mosaic loop carries)."""
    ok = None
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        d = A[j][j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        good = jnp.where((d > 0) & jnp.isfinite(d), 1.0, 0.0).astype(d.dtype)
        ok = good if ok is None else (ok * good)
        Ljj = jnp.sqrt(jnp.where(d > 0, d, 1.0))
        L[j][j] = Ljj
        inv = 1.0 / Ljj
        for i in range(j + 1, n):
            s = A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    return L, ok


def _chol_solve_t(L, B, n, m):
    """Solve (L L^T) X = B; B is [n][m] tile-matrix."""
    y = [[None] * m for _ in range(n)]
    for i in range(n):
        for c in range(m):
            s = B[i][c]
            for k in range(i):
                s = s - L[i][k] * y[k][c]
            y[i][c] = s / L[i][i]
    x = [[None] * m for _ in range(n)]
    for i in reversed(range(n)):
        for c in range(m):
            s = y[i][c]
            for k in range(i + 1, n):
                s = s - L[k][i] * x[k][c]
            x[i][c] = s / L[i][i]
    return x


def _field_offsets(nx: int, nu: int):
    """Field offsets of the packed per-stage derivative buffer.

    Roofline lever (VERDICT r2 item #5): the unpacked kernel issues 7
    separate DMAs per stage (the smallest is nu*SUB*128*4 = 8 KB at the
    headline shape), which makes it DMA-issue-latency-bound at 34% of the
    HBM roofline (measured 1.53 us/stage vs 0.45 us of pure streaming).
    Packing all stage fields into one [N, F, B4, 128] buffer turns that
    into a single 368 KB DMA per stage.  The pack itself is free: the
    solver jit builds the packed buffer straight out of the derivative
    sweep (XLA concatenate-fuses the producers into it), so the bytes
    written to HBM are the same as for the 7 separate arrays.
    """
    off, out = 0, {}
    for name, sz in (("Fx", nx * nx), ("Fu", nx * nu), ("Lx", nx),
                     ("Lu", nu), ("Lxx", nx * nx), ("Luu", nu * nu),
                     ("Lxu", nx * nu)):
        out[name] = off
        off += sz
    return out, off


def _riccati_stage(config: DDPConfig, nx, nu, lam, zeros, fields, carry):
    """One backward Riccati stage on loaded tile-fields (shared by the
    packed and unpacked kernels).  ``fields`` maps name -> tile-matrix /
    tile-vector; ``carry`` is (Vx, Vxx, dV0, dV1, ok).  Returns
    (new_carry, kvec, K)."""
    reg1 = config.reg_type == 1
    reg2 = config.reg_type == 2
    Vx, Vxx, dV0, dV1, ok = carry
    Fx, Fu = fields["Fx"], fields["Fu"]
    Lx, Lu = fields["Lx"], fields["Lu"]
    Lxx, Luu, Lxu = fields["Lxx"], fields["Luu"], fields["Lxu"]

    FuT = _transpose_t(Fu, nx, nu)
    FxT = _transpose_t(Fx, nx, nx)
    Qu = [Lu[a] + s for a, s in enumerate(_mv_t(FuT, Vx, nu, nx))]
    Qx = [Lx[a] + s for a, s in enumerate(_mv_t(FxT, Vx, nx, nx))]
    FuT_Vxx = _mm_t(FuT, Vxx, nu, nx, nx)
    LxuT = _transpose_t(Lxu, nx, nu)
    M = _mm_t(FuT_Vxx, Fx, nu, nx, nx)
    Qux = [[LxuT[a][b] + M[a][b] for b in range(nx)] for a in range(nu)]
    M = _mm_t(FuT_Vxx, Fu, nu, nx, nu)
    Quu = [[Luu[a][b] + M[a][b] for b in range(nu)] for a in range(nu)]
    FxT_Vxx = _mm_t(FxT, Vxx, nx, nx, nx)
    M = _mm_t(FxT_Vxx, Fx, nx, nx, nx)
    Qxx = [[Lxx[a][b] + M[a][b] for b in range(nx)] for a in range(nx)]

    if reg2:
        Vxx_reg = [[Vxx[a][b] + (lam if a == b else zeros)
                    for b in range(nx)] for a in range(nx)]
        FuT_Vr = _mm_t(FuT, Vxx_reg, nu, nx, nx)
        M = _mm_t(FuT_Vr, Fx, nu, nx, nx)
        Qux_reg = [[LxuT[a][b] + M[a][b] for b in range(nx)]
                   for a in range(nu)]
        M = _mm_t(FuT_Vr, Fu, nu, nx, nu)
        Quu_F = [[Luu[a][b] + M[a][b] for b in range(nu)]
                 for a in range(nu)]
    else:
        Qux_reg = Qux
        Quu_F = [row[:] for row in Quu]
    if reg1:
        Quu_F = [[Quu_F[a][b] + (lam if a == b else zeros)
                  for b in range(nu)] for a in range(nu)]

    L, ok_i = _chol_t(Quu_F, nu)
    kvec = [-v[0] for v in _chol_solve_t(L, [[q] for q in Qu], nu, 1)]
    Ksol = _chol_solve_t(L, Qux_reg, nu, nx)
    K = [[-Ksol[a][b] for b in range(nx)] for a in range(nu)]

    Quu_k = _mv_t(Quu, kvec, nu, nu)
    KT = _transpose_t(K, nu, nx)
    QuxT = _transpose_t(Qux, nu, nx)
    dV0 = dV0 + sum(kvec[a] * Qu[a] for a in range(nu))
    dV1 = dV1 + 0.5 * sum(kvec[a] * Quu_k[a] for a in range(nu))

    t1 = _mv_t(KT, Quu_k, nx, nu)
    t2 = _mv_t(KT, Qu, nx, nu)
    t3 = _mv_t(QuxT, kvec, nx, nu)
    Vx_new = [Qx[a] + t1[a] + t2[a] + t3[a] for a in range(nx)]

    KTQuu = _mm_t(KT, Quu, nx, nu, nu)
    T1 = _mm_t(KTQuu, K, nx, nu, nx)
    T2 = _mm_t(KT, Qux, nx, nu, nx)
    Vxx_new = [[Qxx[a][b] + T1[a][b] + T2[a][b] + T2[b][a]
                for b in range(nx)] for a in range(nx)]
    Vxx_sym = [[0.5 * (Vxx_new[a][b] + Vxx_new[b][a])
                for b in range(nx)] for a in range(nx)]

    return (Vx_new, Vxx_sym, dV0, dV1, ok * ok_i), kvec, K


def _boxqp_t(H, gq, lo, hi, x0, nu, bq, zeros):
    """Projected-Newton BoxQP on (SUB, 128) tiles — the fused in-kernel
    analog of ``kernels/ddp_backward.boxqp_stacked`` (reference
    ``BoxQP.h:141-347``), with IDENTICAL semantics (round 4):

    - QP iterations: ``min(unroll_iter, max_iter)`` iterations unrolled
      (pure VPU code, no loop dispatch), then a masked ``lax.while_loop``
      continuation up to ``max_iter`` for the rare lanes needing more —
      the same unroll+continuation split as ``boxqp_stacked``.  A lane
      reaching ``max_iter`` exits MAX_ITER = success, like the stacked
      path and the reference (``BoxQP.h:332-336``).
    - Armijo backtracking: the first ``ls_block`` candidates unrolled
      (first-stop select — in practice every accept lands here), then a
      masked ``lax.while_loop`` tail over the rest of the schedule; a
      lane exhausting the schedule without an accept takes the
      LAST-VISITED candidate and exits MAX_LS_ITER, exactly like the
      stacked kernel (and the reference's tiny-step accept,
      ``BoxQP.h:298-309``).
    - All selections use ``jnp.where`` (bit-exact), never arithmetic
      masking: a selected candidate must compare ``==`` against the
      bounds in the next iteration's clamped-set test.

    H [nu][nu] tiles (the regularized Quu_F), gq/lo/hi/x0 [nu] tiles.
    Returns (x, ok, free, L) with free/L taken from the exit iteration
    (the previous iteration's on a small-improvement exit), matching the
    stacked kernel's ``keep_prev`` rule.
    """
    import numpy as np

    ones = jnp.ones_like(zeros)
    dtype = zeros.dtype

    def f01(cond):
        return jnp.where(cond, 1.0, 0.0).astype(dtype)

    def sel(mask, a, b):
        """jnp.where on an f32 0/1 mask — bit-exact select."""
        return jnp.where(mask > 0, a, b)

    def clipv(v, lo_i, hi_i):
        return jnp.minimum(jnp.maximum(v, lo_i), hi_i)

    def obj_of(xv):
        Hx = _mv_t(H, xv, nu, nu)
        return (sum(gq[i] * xv[i] for i in range(nu))
                + 0.5 * sum(xv[i] * Hx[i] for i in range(nu)))

    # fp32-exact step schedule: repeated multiplication like the
    # reference's sequential loop (and the stacked kernel's cumprod)
    n_ls = bq.max_ls_iter + 1
    K1 = min(bq.ls_block, n_ls)
    steps, s = [], np.float32(1.0)
    for _ in range(n_ls):
        steps.append(float(s))
        s = np.float32(s * np.float32(bq.step_factor))

    ntri = nu * (nu + 1) // 2

    def tri_flat(L):
        return [L[i][j] for i in range(nu) for j in range(i + 1)]

    def tri_unflat(flat):
        out = [[zeros] * nu for _ in range(nu)]
        k = 0
        for i in range(nu):
            for j in range(i + 1):
                out[i][j] = flat[k]
                k += 1
        return out

    def qp_iter(x, obj, old_obj, active, ok, free_keep, L_keep, first):
        """One masked projected-Newton iteration (mirror of
        ``boxqp_stacked``'s body)."""
        if first:
            imp = zeros
        else:
            imp = f01((old_obj - obj)
                      < bq.rel_improve_thre * jnp.abs(old_obj))
        old_obj = sel(active, obj, old_obj)

        Hx = _mv_t(H, x, nu, nu)
        grad = [gq[i] + Hx[i] for i in range(nu)]
        clamped = [f01(((x[i] == lo[i]) & (grad[i] > 0))
                       | ((x[i] == hi[i]) & (grad[i] < 0)))
                   for i in range(nu)]
        free = [1.0 - clamped[i] for i in range(nu)]
        all_clamped = clamped[0]
        for i in range(1, nu):
            all_clamped = all_clamped * clamped[i]

        Hm = [[free[i] * free[j] * H[i][j]
               + (clamped[i] if i == j else zeros)
               for j in range(nu)] for i in range(nu)]
        L, okc = _chol_t(Hm, nu)

        gn2 = sum(free[i] * grad[i] * grad[i] for i in range(nu))
        small_grad = f01(gn2 < bq.grad_thre ** 2)

        cmx = [clamped[j] * x[j] for j in range(nu)]
        Hcm = _mv_t(H, cmx, nu, nu)
        rhs = [[free[i] * (gq[i] + Hcm[i])] for i in range(nu)]
        sol = _chol_solve_t(L, rhs, nu, 1)
        d = [free[i] * (-sol[i][0] - free[i] * x[i]) for i in range(nu)]
        sdg = sum(d[i] * grad[i] for i in range(nu))
        bad_dir = f01(sdg > 1e-10)

        pre_exit = jnp.maximum(
            jnp.maximum(jnp.maximum(imp, all_clamped),
                        jnp.maximum(1.0 - okc, small_grad)), bad_dir)

        # ---- Armijo head: first K1 candidates unrolled, first-stop ----
        found = zeros      # stopped (accept, or below-min_step forced)
        exh = zeros        # stopped without a true Armijo accept
        xa = [x[i] for i in range(nu)]
        obja = obj
        xl, objl = xa, obja          # last-visited candidate
        head_hit_min = False
        for idx in range(K1):
            sv = steps[idx]
            below = sv < bq.min_step  # static
            xc = [clipv(x[i] + sv * d[i], lo[i], hi[i]) for i in range(nu)]
            objc = obj_of(xc)
            acc = f01((objc - old_obj) / (sv * sdg) >= bq.armijo_param)
            stop = ones if below else acc
            take = stop * (1.0 - found)
            xa = [sel(take, xc[i], xa[i]) for i in range(nu)]
            obja = sel(take, objc, obja)
            if below:
                # below-min_step stop = exhaustion regardless of Armijo
                # (BoxQP.h:304-308; matches boxqp_stacked / boxqp_solve —
                # ADVICE r4 #2)
                exh = jnp.maximum(exh, take)
            found = jnp.maximum(found, stop)
            xl, objl = xc, objc
            if below:
                head_hit_min = True
                break

        if head_hit_min or K1 >= n_ls:
            # the head covered the whole schedule: no-stop lanes take the
            # last-visited candidate with the exhaustion exit
            nt = 1.0 - found
            xa = [sel(nt, xl[i], xa[i]) for i in range(nu)]
            obja = sel(nt, objl, obja)
            exh = jnp.maximum(exh, nt)
        else:
            # ---- masked sequential tail over the rest of the schedule;
            # zero trips in the common case ----
            need_tail = active * (1.0 - pre_exit) * (1.0 - found)

            def ls_cond(st):
                k, _, done = st[0], st[1], st[2]
                return (jnp.sum(1.0 - done) > 0) & (k < n_ls)

            def ls_body(st):
                k, step, done, exh_t, obja_t = st[:5]
                xt = list(st[5:])
                step = step * np.float32(bq.step_factor)
                xc = [clipv(x[i] + step * d[i], lo[i], hi[i])
                      for i in range(nu)]
                objc = obj_of(xc)
                acc = f01((objc - old_obj) / (step * sdg)
                          >= bq.armijo_param)
                belf = f01(step < np.float32(bq.min_step))
                upd = 1.0 - done
                # track the last-visited candidate for every undone lane:
                # its stop candidate when it stops, the schedule's last
                # candidate on exhaustion (BoxQP.h:298-309 accepts the
                # last — tiniest — candidate)
                xt = [sel(upd, xc[i], xt[i]) for i in range(nu)]
                obja_t = sel(upd, objc, obja_t)
                stopf = jnp.maximum(acc, belf) * upd
                # below-min_step stop = exhaustion regardless of Armijo
                # (BoxQP.h:304-308; ADVICE r4 #2)
                exh_t = jnp.maximum(exh_t, stopf * belf)
                done = jnp.maximum(done, stopf)
                return (k + 1, step, done, exh_t, obja_t, *xt)

            st = (jnp.int32(K1), jnp.float32(steps[K1 - 1]),
                  1.0 - need_tail, zeros, obja, *xa)
            st = lax.while_loop(ls_cond, ls_body, st)
            done_f, exh_t, obja = st[2], st[3], st[4]
            xa = list(st[5:])
            # lanes exhausting the schedule (still undone) hold the
            # last-visited candidate in xa; flag them exhausted
            exh = jnp.maximum(exh, jnp.maximum(exh_t, 1.0 - done_f))

        take_step = active * (1.0 - pre_exit)
        x = [sel(take_step, xa[i], x[i]) for i in range(nu)]
        obj = sel(take_step, obja, obj)

        keep_new = active * (1.0 - imp)
        free_keep = [sel(keep_new, free[i], free_keep[i])
                     for i in range(nu)]
        L_keep = [[sel(keep_new, L[i][j], L_keep[i][j])
                   if j <= i else zeros for j in range(nu)]
                  for i in range(nu)]

        fail = active * jnp.maximum(1.0 - okc, bad_dir)
        ok = ok * (1.0 - fail)
        # exhaustion terminates the lane (MAX_LS_ITER, a success code);
        # accepted lanes keep iterating
        done_now = jnp.maximum(pre_exit, exh)
        active = active * (1.0 - done_now)
        return x, obj, old_obj, active, ok, free_keep, L_keep

    x = [clipv(x0[i], lo[i], hi[i]) for i in range(nu)]
    obj = obj_of(x)
    old_obj = obj
    active = ones
    ok = ones
    free_keep = [ones for _ in range(nu)]
    L_keep = [[ones if i == j else zeros for j in range(nu)]
              for i in range(nu)]

    n_unroll = max(1, min(bq.unroll_iter, bq.max_iter))
    for it in range(1, n_unroll + 1):
        x, obj, old_obj, active, ok, free_keep, L_keep = qp_iter(
            x, obj, old_obj, active, ok, free_keep, L_keep,
            first=(it == 1))

    if n_unroll < bq.max_iter:
        # masked while continuation to max_iter — exact stacked semantics
        # (a lane still active at the cap exits MAX_ITER = success)
        def qp_cond(c):
            it, act = c[0], c[3 + nu]
            return (jnp.sum(act) > 0) & (it < bq.max_iter)

        def qp_body(c):
            it = c[0]
            xs = list(c[1:1 + nu])
            objv, old = c[1 + nu], c[2 + nu]
            act, okv = c[3 + nu], c[4 + nu]
            fks = list(c[5 + nu:5 + 2 * nu])
            Lk = tri_unflat(list(c[5 + 2 * nu:5 + 2 * nu + ntri]))
            xs, objv, old, act, okv, fks, Lk = qp_iter(
                xs, objv, old, act, okv, fks, Lk, first=False)
            return (it + 1, *xs, objv, old, act, okv, *fks,
                    *tri_flat(Lk))

        c0 = (jnp.int32(n_unroll), *x, obj, old_obj, active, ok,
              *free_keep, *tri_flat(L_keep))
        c = lax.while_loop(qp_cond, qp_body, c0)
        x = list(c[1:1 + nu])
        ok = c[4 + nu]
        free_keep = list(c[5 + nu:5 + 2 * nu])
        L_keep = tri_unflat(list(c[5 + 2 * nu:5 + 2 * nu + ntri]))

    return x, ok, free_keep, L_keep


def _riccati_stage_boxed(config: DDPConfig, nx, nu, lam, zeros, fields,
                         carry):
    """One boxed backward Riccati stage on loaded tile-fields: Q expansion
    as in :func:`_riccati_stage`, gains via the in-kernel BoxQP
    (``DDPSolver.hpp:450-497``).  ``carry`` adds the next stage's
    feedforward ``k_next`` as the QP warm start."""
    reg1 = config.reg_type == 1
    reg2 = config.reg_type == 2
    Vx, Vxx, dV0, dV1, ok, k_next = carry
    Fx, Fu = fields["Fx"], fields["Fu"]
    Lx, Lu = fields["Lx"], fields["Lu"]
    Lxx, Luu, Lxu = fields["Lxx"], fields["Luu"], fields["Lxu"]
    lower, upper, u = fields["lower"], fields["upper"], fields["u"]

    FuT = _transpose_t(Fu, nx, nu)
    FxT = _transpose_t(Fx, nx, nx)
    Qu = [Lu[a] + s for a, s in enumerate(_mv_t(FuT, Vx, nu, nx))]
    Qx = [Lx[a] + s for a, s in enumerate(_mv_t(FxT, Vx, nx, nx))]
    FuT_Vxx = _mm_t(FuT, Vxx, nu, nx, nx)
    LxuT = _transpose_t(Lxu, nx, nu)
    M = _mm_t(FuT_Vxx, Fx, nu, nx, nx)
    Qux = [[LxuT[a][b] + M[a][b] for b in range(nx)] for a in range(nu)]
    M = _mm_t(FuT_Vxx, Fu, nu, nx, nu)
    Quu = [[Luu[a][b] + M[a][b] for b in range(nu)] for a in range(nu)]
    FxT_Vxx = _mm_t(FxT, Vxx, nx, nx, nx)
    M = _mm_t(FxT_Vxx, Fx, nx, nx, nx)
    Qxx = [[Lxx[a][b] + M[a][b] for b in range(nx)] for a in range(nx)]

    if reg2:
        Vxx_reg = [[Vxx[a][b] + (lam if a == b else zeros)
                    for b in range(nx)] for a in range(nx)]
        FuT_Vr = _mm_t(FuT, Vxx_reg, nu, nx, nx)
        M = _mm_t(FuT_Vr, Fx, nu, nx, nx)
        Qux_reg = [[LxuT[a][b] + M[a][b] for b in range(nx)]
                   for a in range(nu)]
        M = _mm_t(FuT_Vr, Fu, nu, nx, nu)
        Quu_F = [[Luu[a][b] + M[a][b] for b in range(nu)]
                 for a in range(nu)]
    else:
        Qux_reg = Qux
        Quu_F = [row[:] for row in Quu]
    if reg1:
        Quu_F = [[Quu_F[a][b] + (lam if a == b else zeros)
                  for b in range(nu)] for a in range(nu)]

    lo_rel = [lower[i] - u[i] for i in range(nu)]
    hi_rel = [upper[i] - u[i] for i in range(nu)]
    kvec, ok_qp, freem, Lq = _boxqp_t(
        Quu_F, Qu, lo_rel, hi_rel, k_next, nu, config.boxqp, zeros)

    # K rows: free rows solve H_free K_free = -Qux_reg_free on the masked
    # factorization; clamped rows are zero (DDPSolver.hpp:482-496)
    rhs = [[freem[a] * Qux_reg[a][b] for b in range(nx)] for a in range(nu)]
    Ksol = _chol_solve_t(Lq, rhs, nu, nx)
    K = [[-freem[a] * Ksol[a][b] for b in range(nx)] for a in range(nu)]

    Quu_k = _mv_t(Quu, kvec, nu, nu)
    KT = _transpose_t(K, nu, nx)
    QuxT = _transpose_t(Qux, nu, nx)
    dV0 = dV0 + sum(kvec[a] * Qu[a] for a in range(nu))
    dV1 = dV1 + 0.5 * sum(kvec[a] * Quu_k[a] for a in range(nu))

    t1 = _mv_t(KT, Quu_k, nx, nu)
    t2 = _mv_t(KT, Qu, nx, nu)
    t3 = _mv_t(QuxT, kvec, nx, nu)
    Vx_new = [Qx[a] + t1[a] + t2[a] + t3[a] for a in range(nx)]

    KTQuu = _mm_t(KT, Quu, nx, nu, nu)
    T1 = _mm_t(KTQuu, K, nx, nu, nx)
    T2 = _mm_t(KT, Qux, nx, nu, nx)
    Vxx_new = [[Qxx[a][b] + T1[a][b] + T2[a][b] + T2[b][a]
                for b in range(nx)] for a in range(nx)]
    Vxx_sym = [[0.5 * (Vxx_new[a][b] + Vxx_new[b][a])
                for b in range(nx)] for a in range(nx)]

    return ((Vx_new, Vxx_sym, dV0, dV1, ok * ok_qp, kvec), kvec, K)


def _make_kernel_chunked(config: DDPConfig, nx: int, nu: int, N: int,
                         SUB: int, C: int):
    """Stage-chunked DMA kernel: 7 DMAs per C-stage chunk instead of per
    stage.

    Roofline lever, round 3: the per-stage kernel is DMA-issue-latency
    bound (measured 49.5% of the HBM roofline at the headline shape; the
    smallest of its 7 per-stage DMAs is 8 KB).  Packing the fields into one
    buffer on the host side LOSES end-to-end (the concatenate costs two
    extra HBM passes — see ``backward_pallas``), so instead each DMA keeps
    its own field buffer but fetches C stages at once: same bytes, same
    input layout, C× fewer DMA issues.  Double-buffering moves to chunk
    granularity (prefetch chunk c+1 while stages of chunk c compute), which
    also gives the prefetch C stages of compute to hide under.
    """
    n_chunks = N // C

    def kernel(Fx_hbm, Fu_hbm, Lx_hbm, Lu_hbm, Lxx_hbm, Luu_hbm, Lxu_hbm,
               VxT_ref, VxxT_ref, lam_ref,
               ks_ref, Ks_ref, dV_ref, ok_ref,
               Fx_s, Fu_s, Lx_s, Lu_s, Lxx_s, Luu_s, Lxu_s, sems):
        g = pl.program_id(0)
        b0 = g * SUB
        lam = lam_ref[:, :]

        hbm = [Fx_hbm, Fu_hbm, Lx_hbm, Lu_hbm, Lxx_hbm, Luu_hbm, Lxu_hbm]
        scr = [Fx_s, Fu_s, Lx_s, Lu_s, Lxx_s, Luu_s, Lxu_s]

        def chunk_dmas(slot, c):
            # chunk c covers stages [N-(c+1)*C, N-c*C), consumed high->low
            base = N - (c + 1) * C
            out = []
            for w, (h, s) in enumerate(zip(hbm, scr)):
                if h.ndim == 5:
                    src = h.at[pl.ds(base, C), :, :, pl.ds(b0, SUB), :]
                else:
                    src = h.at[pl.ds(base, C), :, pl.ds(b0, SUB), :]
                out.append(pltpu.make_async_copy(src, s.at[slot],
                                                 sems.at[w, slot]))
            return out

        for d in chunk_dmas(0, 0):
            d.start()

        def load_mat(ref, slot, idx, n, m):
            return [[ref[slot, idx, a, b] for b in range(m)]
                    for a in range(n)]

        def load_vec(ref, slot, idx, n):
            return [ref[slot, idx, a] for a in range(n)]

        Vx = [VxT_ref[a] for a in range(nx)]
        Vxx = [[VxxT_ref[a, b] for b in range(nx)] for a in range(nx)]

        zeros = jnp.zeros_like(lam)
        carry0 = (Vx, Vxx, zeros, zeros, jnp.ones_like(lam))

        def body(j, carry):
            i = N - 1 - j
            c = j // C
            pos = j - c * C
            slot = lax.rem(c, 2)
            idx = C - 1 - pos            # position of stage i inside chunk c

            # at a chunk boundary: prefetch the next chunk into the other
            # slot (its previous occupant, chunk c-1, is fully consumed),
            # then wait for this chunk's data
            @pl.when((pos == 0) & (c + 1 < n_chunks))
            def _():
                for d in chunk_dmas(lax.rem(c + 1, 2), c + 1):
                    d.start()

            @pl.when(pos == 0)
            def _():
                for d in chunk_dmas(slot, c):
                    d.wait()

            fields = {
                "Fx": load_mat(Fx_s, slot, idx, nx, nx),
                "Fu": load_mat(Fu_s, slot, idx, nx, nu),
                "Lx": load_vec(Lx_s, slot, idx, nx),
                "Lu": load_vec(Lu_s, slot, idx, nu),
                "Lxx": load_mat(Lxx_s, slot, idx, nx, nx),
                "Luu": load_mat(Luu_s, slot, idx, nu, nu),
                "Lxu": load_mat(Lxu_s, slot, idx, nx, nu),
            }
            new_carry, kvec, K = _riccati_stage(
                config, nx, nu, lam, zeros, fields, carry)

            for a in range(nu):
                ks_ref[i, a] = kvec[a]
                for b in range(nx):
                    Ks_ref[i, a, b] = K[a][b]

            return new_carry

        Vx, Vxx, dV0, dV1, ok = lax.fori_loop(0, N, body, carry0)
        dV_ref[0] = dV0
        dV_ref[1] = dV1
        ok_ref[:, :] = ok

    return kernel


def _choose_chunk(N: int, B4: int, out_floats: int, F: int):
    """Pick (C, SUB) for the chunked kernel: maximize SUB*C (total DMA
    issues scale as B4*N*7/(SUB*C)) under the VMEM budget, tie-breaking
    toward larger SUB (fewer grid steps)."""
    budget = 11 * 1024 * 1024
    # Mosaic: the second-to-last block dim (SUB) must be a multiple of 8 or
    # the full array dim B4
    subs = [B4] + [s for s in (512, 256, 128, 64, 32, 16, 8)
                   if s < B4 and B4 % s == 0]
    if B4 < 8:
        subs = [B4]
    best = None
    for c in range(1, min(N, 32) + 1):
        if N % c:
            continue
        for s in subs:
            if s * 128 * 4 * (2 * out_floats + 2 * c * F) <= budget:
                key = (s * c, s)
                if best is None or key > best[:2]:
                    best = (s * c, s, c)
                break
    if best is None:
        # degrade SUB through the LEGAL set (multiples of 8 or B4 itself —
        # the Mosaic block rule) to the smallest footprint at C=1; if even
        # that overflows the budget nothing fits and the caller's
        # pallas_call reports it (this chunked path is an opt-in
        # experiment; `backward_pallas`'s default stage kernel has its own
        # chooser)
        for sub in sorted(subs):
            if sub * 128 * 4 * (2 * out_floats + 2 * F) <= budget:
                return 1, sub
        return 1, min(subs)
    return best[2], best[1]


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _backward_pallas_call_chunked(config: DDPConfig, nx, nu, N,
                                  Fx, Fu, Lx, Lu, Lxx, Luu, Lxu,
                                  VxT, VxxT, lam):
    """Chunked-DMA variant of ``_backward_pallas_call`` (same signature)."""
    B4 = lam.shape[0]
    dtype = Fx.dtype
    out_floats = N * (nu + nu * nx)
    F = 2 * nx * nx + 2 * nx * nu + nx + nu + nu * nu
    C, SUB = _choose_chunk(N, B4, out_floats, F)
    grid = (B4 // SUB,)

    def vspec(*dims):
        block = tuple(dims) + (SUB, 128)
        nlead = len(dims)
        return pl.BlockSpec(block,
                            lambda i, nlead=nlead: (0,) * nlead + (i, 0),
                            memory_space=pltpu.VMEM)

    kernel = _make_kernel_chunked(config, nx, nu, N, SUB, C)
    out_shape = (
        jax.ShapeDtypeStruct((N, nu, B4, 128), dtype),
        jax.ShapeDtypeStruct((N, nu, nx, B4, 128), dtype),
        jax.ShapeDtypeStruct((2, B4, 128), dtype),
        jax.ShapeDtypeStruct((B4, 128), jnp.float32),
    )
    out_specs = (vspec(N, nu), vspec(N, nu, nx), vspec(2), vspec())
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 7 + [
        vspec(nx), vspec(nx, nx), vspec()]
    scratch = [
        pltpu.VMEM((2, C, nx, nx, SUB, 128), dtype),   # Fx
        pltpu.VMEM((2, C, nx, nu, SUB, 128), dtype),   # Fu
        pltpu.VMEM((2, C, nx, SUB, 128), dtype),       # Lx
        pltpu.VMEM((2, C, nu, SUB, 128), dtype),       # Lu
        pltpu.VMEM((2, C, nx, nx, SUB, 128), dtype),   # Lxx
        pltpu.VMEM((2, C, nu, nu, SUB, 128), dtype),   # Luu
        pltpu.VMEM((2, C, nx, nu, SUB, 128), dtype),   # Lxu
        pltpu.SemaphoreType.DMA((7, 2)),
    ]

    ks, Ks, dV, okf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(Fx, Fu, Lx, Lu, Lxx, Luu, Lxu, VxT, VxxT, lam)
    return ks, Ks, dV, okf


def _make_kernel_packed(config: DDPConfig, nx: int, nu: int, N: int,
                        SUB: int):
    """Packed-input kernel: one DMA per stage from the packed buffer."""
    OFF, F = _field_offsets(nx, nu)

    def kernel(P_hbm, VxT_ref, VxxT_ref, lam_ref,
               ks_ref, Ks_ref, dV_ref, ok_ref, P_s, sems):
        g = pl.program_id(0)
        b0 = g * SUB
        lam = lam_ref[:, :]

        def stage_dma(slot, i):
            return pltpu.make_async_copy(
                P_hbm.at[i, :, pl.ds(b0, SUB), :], P_s.at[slot],
                sems.at[slot])

        stage_dma(0, N - 1).start()

        def load_mat(slot, name, n, m):
            o = OFF[name]
            return [[P_s[slot, o + a * m + b] for b in range(m)]
                    for a in range(n)]

        def load_vec(slot, name, n):
            o = OFF[name]
            return [P_s[slot, o + a] for a in range(n)]

        Vx = [VxT_ref[a] for a in range(nx)]
        Vxx = [[VxxT_ref[a, b] for b in range(nx)] for a in range(nx)]

        zeros = jnp.zeros_like(lam)
        dV0 = zeros
        dV1 = zeros
        ok = jnp.ones_like(lam)

        carry0 = (Vx, Vxx, dV0, dV1, ok)

        def body(j, carry):
            i = N - 1 - j
            slot = lax.rem(j, 2)
            next_slot = lax.rem(j + 1, 2)

            @pl.when(j + 1 < N)
            def _():
                stage_dma(next_slot, i - 1).start()

            stage_dma(slot, i).wait()

            fields = {
                "Fx": load_mat(slot, "Fx", nx, nx),
                "Fu": load_mat(slot, "Fu", nx, nu),
                "Lx": load_vec(slot, "Lx", nx),
                "Lu": load_vec(slot, "Lu", nu),
                "Lxx": load_mat(slot, "Lxx", nx, nx),
                "Luu": load_mat(slot, "Luu", nu, nu),
                "Lxu": load_mat(slot, "Lxu", nx, nu),
            }
            new_carry, kvec, K = _riccati_stage(
                config, nx, nu, lam, zeros, fields, carry)

            for a in range(nu):
                ks_ref[i, a] = kvec[a]
                for b in range(nx):
                    Ks_ref[i, a, b] = K[a][b]

            return new_carry

        Vx, Vxx, dV0, dV1, ok = lax.fori_loop(0, N, body, carry0)
        dV_ref[0] = dV0
        dV_ref[1] = dV1
        ok_ref[:, :] = ok

    return kernel


def _make_kernel(config: DDPConfig, nx: int, nu: int, N: int, SUB: int):
    """Kernel with manual double-buffered DMA of per-stage derivative slices
    from HBM: whole-horizon VMEM blocks don't fit (Pallas double-buffers
    grid blocks, ~2x the data), so stage data streams in two slots while the
    value-function carry stays resident."""

    def kernel(Fx_hbm, Fu_hbm, Lx_hbm, Lu_hbm, Lxx_hbm, Luu_hbm, Lxu_hbm,
               VxT_ref, VxxT_ref, lam_ref,
               ks_ref, Ks_ref, dV_ref, ok_ref,
               Fx_s, Fu_s, Lx_s, Lu_s, Lxx_s, Luu_s, Lxu_s, sems):
        g = pl.program_id(0)
        b0 = g * SUB
        lam = lam_ref[:, :]

        hbm = [Fx_hbm, Fu_hbm, Lx_hbm, Lu_hbm, Lxx_hbm, Luu_hbm, Lxu_hbm]
        scr = [Fx_s, Fu_s, Lx_s, Lu_s, Lxx_s, Luu_s, Lxu_s]

        def stage_dmas(slot, i):
            out = []
            for w, (h, s) in enumerate(zip(hbm, scr)):
                nd = h.ndim
                if nd == 5:
                    src = h.at[i, :, :, pl.ds(b0, SUB), :]
                else:
                    src = h.at[i, :, pl.ds(b0, SUB), :]
                out.append(pltpu.make_async_copy(src, s.at[slot],
                                                 sems.at[w, slot]))
            return out

        # warm-up: stage N-1 into slot 0
        for d in stage_dmas(0, N - 1):
            d.start()

        def load_mat(ref, slot, n, m):
            return [[ref[slot, a, b] for b in range(m)] for a in range(n)]

        def load_vec(ref, slot, n):
            return [ref[slot, a] for a in range(n)]

        Vx = [VxT_ref[a] for a in range(nx)]
        Vxx = [[VxxT_ref[a, b] for b in range(nx)] for a in range(nx)]

        zeros = jnp.zeros_like(lam)
        dV0 = zeros
        dV1 = zeros
        ok = jnp.ones_like(lam)  # f32 0/1 mask (bool carries won't legalize)

        carry0 = (Vx, Vxx, dV0, dV1, ok)

        def body(j, carry):
            i = N - 1 - j
            slot = lax.rem(j, 2)
            next_slot = lax.rem(j + 1, 2)

            # prefetch stage i-1 while waiting on stage i
            @pl.when(j + 1 < N)
            def _():
                for d in stage_dmas(next_slot, i - 1):
                    d.start()

            for d in stage_dmas(slot, i):
                d.wait()

            fields = {
                "Fx": load_mat(Fx_s, slot, nx, nx),
                "Fu": load_mat(Fu_s, slot, nx, nu),
                "Lx": load_vec(Lx_s, slot, nx),
                "Lu": load_vec(Lu_s, slot, nu),
                "Lxx": load_mat(Lxx_s, slot, nx, nx),
                "Luu": load_mat(Luu_s, slot, nu, nu),
                "Lxu": load_mat(Lxu_s, slot, nx, nu),
            }
            new_carry, kvec, K = _riccati_stage(
                config, nx, nu, lam, zeros, fields, carry)

            for a in range(nu):
                ks_ref[i, a] = kvec[a]
                for b in range(nx):
                    Ks_ref[i, a, b] = K[a][b]

            return new_carry

        Vx, Vxx, dV0, dV1, ok = lax.fori_loop(0, N, body, carry0)
        dV_ref[0] = dV0
        dV_ref[1] = dV1
        ok_ref[:, :] = ok

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _backward_pallas_call(config: DDPConfig, nx, nu, N,
                          Fx, Fu, Lx, Lu, Lxx, Luu, Lxu, VxT, VxxT, lam):
    """Inputs in batch-minor layout with B reshaped to (B4, 128)."""
    B4 = lam.shape[0]
    dtype = Fx.dtype
    # VMEM per program: outputs (double-buffered by the pipeline) + 2 stage
    # slots + carry. Choose SUB so that ~2x outputs + slots stay well under
    # the 16 MB budget.
    out_floats = N * (nu + nu * nx)                       # ks + Ks per lane
    slot_floats = 2 * (2 * nx * nx + 2 * nx * nu + nx + nu + nu * nu)
    budget = 11 * 1024 * 1024
    SUB = B4
    while SUB > 1 and SUB * 128 * 4 * (2 * out_floats + slot_floats) > budget:
        SUB //= 2
    while B4 % SUB != 0:
        SUB //= 2
    grid = (B4 // SUB,)

    def vspec(*dims):
        block = tuple(dims) + (SUB, 128)
        nlead = len(dims)
        return pl.BlockSpec(block,
                            lambda i, nlead=nlead: (0,) * nlead + (i, 0),
                            memory_space=pltpu.VMEM)

    def hbm_spec():
        return pl.BlockSpec(memory_space=pl.ANY)

    kernel = _make_kernel(config, nx, nu, N, SUB)
    out_shape = (
        jax.ShapeDtypeStruct((N, nu, B4, 128), dtype),
        jax.ShapeDtypeStruct((N, nu, nx, B4, 128), dtype),
        jax.ShapeDtypeStruct((2, B4, 128), dtype),
        jax.ShapeDtypeStruct((B4, 128), jnp.float32),
    )
    out_specs = (vspec(N, nu), vspec(N, nu, nx), vspec(2), vspec())
    in_specs = [hbm_spec()] * 7 + [vspec(nx), vspec(nx, nx), vspec()]
    scratch = [
        pltpu.VMEM((2, nx, nx, SUB, 128), dtype),   # Fx
        pltpu.VMEM((2, nx, nu, SUB, 128), dtype),   # Fu
        pltpu.VMEM((2, nx, SUB, 128), dtype),       # Lx
        pltpu.VMEM((2, nu, SUB, 128), dtype),       # Lu
        pltpu.VMEM((2, nx, nx, SUB, 128), dtype),   # Lxx
        pltpu.VMEM((2, nu, nu, SUB, 128), dtype),   # Luu
        pltpu.VMEM((2, nx, nu, SUB, 128), dtype),   # Lxu
        pltpu.SemaphoreType.DMA((7, 2)),
    ]

    ks, Ks, dV, okf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(Fx, Fu, Lx, Lu, Lxx, Luu, Lxu, VxT, VxxT, lam)
    return ks, Ks, dV, okf


def _make_kernel_boxed(config: DDPConfig, nx: int, nu: int, N: int,
                       SUB: int):
    """Boxed-backward kernel: the unconstrained kernel's streaming layout
    plus three per-stage bound fields (lower, upper, u) and the in-kernel
    BoxQP of :func:`_boxqp_t`."""

    def kernel(Fx_hbm, Fu_hbm, Lx_hbm, Lu_hbm, Lxx_hbm, Luu_hbm, Lxu_hbm,
               lo_hbm, hi_hbm, u_hbm,
               VxT_ref, VxxT_ref, lam_ref,
               ks_ref, Ks_ref, dV_ref, ok_ref,
               Fx_s, Fu_s, Lx_s, Lu_s, Lxx_s, Luu_s, Lxu_s,
               lo_s, hi_s, u_s, sems):
        g = pl.program_id(0)
        b0 = g * SUB
        lam = lam_ref[:, :]

        hbm = [Fx_hbm, Fu_hbm, Lx_hbm, Lu_hbm, Lxx_hbm, Luu_hbm, Lxu_hbm,
               lo_hbm, hi_hbm, u_hbm]
        scr = [Fx_s, Fu_s, Lx_s, Lu_s, Lxx_s, Luu_s, Lxu_s,
               lo_s, hi_s, u_s]

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

        for d in stage_dmas(0, N - 1):
            d.start()

        def load_mat(ref, slot, n, m):
            return [[ref[slot, a, b] for b in range(m)] for a in range(n)]

        def load_vec(ref, slot, n):
            return [ref[slot, a] for a in range(n)]

        Vx = [VxT_ref[a] for a in range(nx)]
        Vxx = [[VxxT_ref[a, b] for b in range(nx)] for a in range(nx)]

        zeros = jnp.zeros_like(lam)
        carry0 = (Vx, Vxx, zeros, zeros, jnp.ones_like(lam),
                  [zeros for _ in range(nu)])   # k_next warm start = 0

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

            fields = {
                "Fx": load_mat(Fx_s, slot, nx, nx),
                "Fu": load_mat(Fu_s, slot, nx, nu),
                "Lx": load_vec(Lx_s, slot, nx),
                "Lu": load_vec(Lu_s, slot, nu),
                "Lxx": load_mat(Lxx_s, slot, nx, nx),
                "Luu": load_mat(Luu_s, slot, nu, nu),
                "Lxu": load_mat(Lxu_s, slot, nx, nu),
                "lower": load_vec(lo_s, slot, nu),
                "upper": load_vec(hi_s, slot, nu),
                "u": load_vec(u_s, slot, nu),
            }
            new_carry, kvec, K = _riccati_stage_boxed(
                config, nx, nu, lam, zeros, fields, carry)

            for a in range(nu):
                ks_ref[i, a] = kvec[a]
                for b in range(nx):
                    Ks_ref[i, a, b] = K[a][b]

            return new_carry

        Vx, Vxx, dV0, dV1, ok, _ = lax.fori_loop(0, N, body, carry0)
        dV_ref[0] = dV0
        dV_ref[1] = dV1
        ok_ref[:, :] = ok

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _backward_pallas_call_boxed(config: DDPConfig, nx, nu, N,
                                Fx, Fu, Lx, Lu, Lxx, Luu, Lxu,
                                lo, hi, u, VxT, VxxT, lam):
    """Boxed variant of ``_backward_pallas_call``: three extra per-stage
    bound inputs, same outputs."""
    B4 = lam.shape[0]
    dtype = Fx.dtype
    out_floats = N * (nu + nu * nx)
    slot_floats = 2 * (2 * nx * nx + 2 * nx * nu + nx + nu + nu * nu
                       + 3 * nu)
    budget = 11 * 1024 * 1024
    SUB = B4
    while SUB > 1 and SUB * 128 * 4 * (2 * out_floats + slot_floats) > budget:
        SUB //= 2
    while B4 % SUB != 0:
        SUB //= 2
    grid = (B4 // SUB,)

    def vspec(*dims):
        block = tuple(dims) + (SUB, 128)
        nlead = len(dims)
        return pl.BlockSpec(block,
                            lambda i, nlead=nlead: (0,) * nlead + (i, 0),
                            memory_space=pltpu.VMEM)

    kernel = _make_kernel_boxed(config, nx, nu, N, SUB)
    out_shape = (
        jax.ShapeDtypeStruct((N, nu, B4, 128), dtype),
        jax.ShapeDtypeStruct((N, nu, nx, B4, 128), dtype),
        jax.ShapeDtypeStruct((2, B4, 128), dtype),
        jax.ShapeDtypeStruct((B4, 128), jnp.float32),
    )
    out_specs = (vspec(N, nu), vspec(N, nu, nx), vspec(2), vspec())
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 10 + [
        vspec(nx), vspec(nx, nx), vspec()]
    scratch = [
        pltpu.VMEM((2, nx, nx, SUB, 128), dtype),   # Fx
        pltpu.VMEM((2, nx, nu, SUB, 128), dtype),   # Fu
        pltpu.VMEM((2, nx, SUB, 128), dtype),       # Lx
        pltpu.VMEM((2, nu, SUB, 128), dtype),       # Lu
        pltpu.VMEM((2, nx, nx, SUB, 128), dtype),   # Lxx
        pltpu.VMEM((2, nu, nu, SUB, 128), dtype),   # Luu
        pltpu.VMEM((2, nx, nu, SUB, 128), dtype),   # Lxu
        pltpu.VMEM((2, nu, SUB, 128), dtype),       # lower
        pltpu.VMEM((2, nu, SUB, 128), dtype),       # upper
        pltpu.VMEM((2, nu, SUB, 128), dtype),       # u
        pltpu.SemaphoreType.DMA((10, 2)),
    ]

    ks, Ks, dV, okf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(Fx, Fu, Lx, Lu, Lxx, Luu, Lxu, lo, hi, u, VxT, VxxT, lam)
    return ks, Ks, dV, okf


def backward_pallas_boxed(config: DDPConfig, D, bounds, Vx_T, Vxx_T, lam):
    """Drop-in for ``backward_stacked_boxed`` (same batch-minor layout)
    backed by the fused boxed Pallas kernel: the whole backward recursion
    INCLUDING the per-stage projected-Newton BoxQP runs as one VPU
    program, with the value-function carry and QP warm start resident in
    VMEM (``DDPSolver.hpp:450-497`` + ``BoxQP.h:141-347``).

    Parity contract (round 4, pinned by tests/test_pallas_kernels.py):
    the in-kernel BoxQP runs the SAME semantics as ``boxqp_stacked`` —
    unrolled head + masked while-loop continuations for both the QP
    iterations (to ``max_iter``) and the Armijo schedule (full schedule;
    exhaustion takes the last-visited candidate) — so agreement is exact
    in interpreter mode and within fp32 reassociation noise compiled on
    chip (measured 2026-08-20, vertical-motion B=1024 N=100, default
    BoxQP config: ks max err 1.3e-5 single backward; 18x faster than the
    stacked boxed backward, 1.19x the unconstrained backward;
    benchmarks/profile_boxed_ddp.py).
    """
    N, nx = D.Fx.shape[0], D.Fx.shape[1]
    nu = D.Fu.shape[2]
    B = lam.shape[-1]
    assert B % 128 == 0, "pallas boxed backward requires B % 128 == 0"
    B4 = B // 128

    r = lambda a: a.reshape(a.shape[:-1] + (B4, 128))
    ks, Ks, dV, okf = _backward_pallas_call_boxed(
        config, nx, nu, N,
        r(D.Fx), r(D.Fu), r(D.Lx), r(D.Lu), r(D.Lxx), r(D.Luu), r(D.Lxu),
        r(bounds.lower), r(bounds.upper), r(bounds.u),
        r(Vx_T), r(Vxx_T), r(lam))
    unr = lambda a: a.reshape(a.shape[:-2] + (B,))
    return unr(ks), unr(Ks), unr(dV), unr(okf) > 0.5


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _backward_pallas_call_packed(config: DDPConfig, nx, nu, N,
                                 P, VxT, VxxT, lam):
    """Packed-input variant: P is [N, F, B4, 128] (see ``_field_offsets``).
    One DMA per stage instead of seven — the roofline lever that lifted the
    kernel from 34% to its measured share of the HBM bound."""
    B4 = lam.shape[0]
    dtype = P.dtype
    _, F = _field_offsets(nx, nu)
    out_floats = N * (nu + nu * nx)                       # ks + Ks per lane
    slot_floats = 2 * F
    budget = 11 * 1024 * 1024
    SUB = B4
    while SUB > 1 and SUB * 128 * 4 * (2 * out_floats + slot_floats) > budget:
        SUB //= 2
    while B4 % SUB != 0:
        SUB //= 2
    grid = (B4 // SUB,)

    def vspec(*dims):
        block = tuple(dims) + (SUB, 128)
        nlead = len(dims)
        return pl.BlockSpec(block,
                            lambda i, nlead=nlead: (0,) * nlead + (i, 0),
                            memory_space=pltpu.VMEM)

    kernel = _make_kernel_packed(config, nx, nu, N, SUB)
    out_shape = (
        jax.ShapeDtypeStruct((N, nu, B4, 128), dtype),
        jax.ShapeDtypeStruct((N, nu, nx, B4, 128), dtype),
        jax.ShapeDtypeStruct((2, B4, 128), dtype),
        jax.ShapeDtypeStruct((B4, 128), jnp.float32),
    )
    out_specs = (vspec(N, nu), vspec(N, nu, nx), vspec(2), vspec())
    in_specs = [pl.BlockSpec(memory_space=pl.ANY),
                vspec(nx), vspec(nx, nx), vspec()]
    scratch = [
        pltpu.VMEM((2, F, SUB, 128), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    ks, Ks, dV, okf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(P, VxT, VxxT, lam)
    return ks, Ks, dV, okf


def pack_derivs_pallas(D, B4):
    """Assemble the packed [N, F, B4, 128] buffer from batch-minor stacked
    derivatives.  Called inside the solver jit right after the derivative
    sweep, so XLA fuses the sweep's producers into the concatenate and the
    7 separate arrays never materialize."""
    N = D.Fx.shape[0]
    r = lambda a: a.reshape((N, -1, B4, 128))
    return jnp.concatenate(
        [r(D.Fx), r(D.Fu), r(D.Lx), r(D.Lu), r(D.Lxx), r(D.Luu), r(D.Lxu)],
        axis=1)


def backward_pallas(config: DDPConfig, D, Vx_T, Vxx_T, lam,
                    packed: bool | None = None):
    """Drop-in for ``backward_stacked`` (same signature/layout: batch-minor
    with trailing axis B) backed by the fused Pallas kernel.

    Requires B % 128 == 0 (the stacked solver pads/los falls back otherwise).

    DMA modes (``NMPC_PALLAS_DMA`` env var, or the legacy ``packed`` kwarg):

    - ``"stage"`` (default): 7 DMAs per stage, double-buffered.
    - ``"chunked"``: 7 DMAs per C-stage chunk — same input layout and
      bytes, C× fewer DMA *issues*.  Measured on chip (2026-08-20, B=4096
      N=100 cart-pole): 426.7 µs vs 421.9 µs for stage — NO win, parity
      exact (0.0).  Conclusion: the gap to the HBM roofline is NOT
      DMA-issue count; each per-field slice is strided over the B4 axis
      whenever SUB < B4, so a chunk DMA decomposes into the same row
      descriptors as C per-stage DMAs.  Closing further would need the
      batch-outermost layout (contiguous whole-chunk transfers), which
      conflicts with the batch-minor contract of everything upstream.
      Kept as a parity-pinned experiment.
    - ``"packed"``: 1 DMA per stage from a host-packed buffer.  Measured on
      chip (2026-08, benchmarks/roofline.py + /tmp A/B): packing at this
      call boundary LOSES end-to-end (10.5 ms vs 6.5 ms per 10-iteration
      solve at B=4096) because the derivative sweep's outputs are already
      materialized, so the concatenate cannot fuse and costs two extra full
      HBM passes per iteration — more than the DMA-issue savings.  Kept as
      an experiment.
    """
    import os
    if packed is None:
        mode = os.environ.get("NMPC_PALLAS_DMA", "")
        if not mode:
            mode = ("packed"
                    if os.environ.get("NMPC_PALLAS_PACKED", "0") == "1"
                    else "stage")
    else:
        mode = "packed" if packed else "stage"
    assert mode in ("stage", "packed", "chunked"), mode
    N, nx = D.Fx.shape[0], D.Fx.shape[1]
    nu = D.Fu.shape[2]
    B = lam.shape[-1]
    assert B % 128 == 0, "pallas backward requires B % 128 == 0"
    B4 = B // 128

    r = lambda a: a.reshape(a.shape[:-1] + (B4, 128))
    if mode == "packed":
        ks, Ks, dV, okf = _backward_pallas_call_packed(
            config, nx, nu, N, pack_derivs_pallas(D, B4),
            r(Vx_T), r(Vxx_T), r(lam))
    elif mode == "chunked":
        ks, Ks, dV, okf = _backward_pallas_call_chunked(
            config, nx, nu, N,
            r(D.Fx), r(D.Fu), r(D.Lx), r(D.Lu), r(D.Lxx), r(D.Luu),
            r(D.Lxu), r(Vx_T), r(Vxx_T), r(lam))
    else:
        ks, Ks, dV, okf = _backward_pallas_call(
            config, nx, nu, N,
            r(D.Fx), r(D.Fu), r(D.Lx), r(D.Lu), r(D.Lxx), r(D.Luu),
            r(D.Lxu), r(Vx_T), r(Vxx_T), r(lam))
    unr = lambda a: a.reshape(a.shape[:-2] + (B,))
    return unr(ks), unr(Ks), unr(dV), unr(okf) > 0.5
