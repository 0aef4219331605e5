"""Round-4 root-cause experiment for the boxed-Pallas parity failure.

Isolates the divergent (stage, lane) between backward_stacked_boxed and
backward_pallas_boxed on the committed test case, then re-runs both BoxQP
variants on that element's exact inputs and prints the decision trail.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

pl.pallas_call = functools.partial(pl.pallas_call, interpret=True)

import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from test_pallas_kernels import _boxed_backward_case  # noqa: E402
from nmpc_tpu.kernels.ddp_backward import (  # noqa: E402
    backward_stacked_boxed, boxqp_stacked, StackedDerivs, StackedBounds,
    _mT, _mm, _mv, _chol_bl, _chol_solve_bl)
from nmpc_tpu.kernels.ddp_backward_pallas import backward_pallas_boxed  # noqa: E402

config, Dst, bounds, VxT_f, VxxT_f, lam = _boxed_backward_case()
o1 = backward_stacked_boxed(config, Dst, bounds, VxT_f, VxxT_f, lam)
o2 = backward_pallas_boxed(config, Dst, bounds, VxT_f, VxxT_f, lam)

ks1, ks2 = np.asarray(o1[0]), np.asarray(o2[0])
diff = np.abs(ks1 - ks2)
print("max ks diff:", diff.max(), "at", np.unravel_index(diff.argmax(), diff.shape))
bad = np.argwhere(diff > 3e-6)
print("elements over tol:", bad)

Ks1, Ks2 = np.asarray(o1[1]), np.asarray(o2[1])
dK = np.abs(Ks1 - Ks2)
print("max Ks diff:", dK.max(), "at", np.unravel_index(dK.argmax(), dK.shape))

# Which stages/lanes disagree at all (above fp noise)?
per_stage = diff.max(axis=(1, 2))
print("per-stage max ks diff:", per_stage)

stage, a, lane = np.unravel_index(diff.argmax(), diff.shape)
print(f"target stage={stage} input_row={a} lane={lane}")

# ---- replicate the stacked backward but capture the QP inputs at each
# stage for the target lane ----
nx = Dst.Fx.shape[1]
nu = Dst.Fu.shape[2]
B = VxT_f.shape[-1]
dtype = VxT_f.dtype
eye_nx = jnp.eye(nx, dtype=dtype)[:, :, None]
reg1 = config.reg_type == 1
reg2 = config.reg_type == 2

N = Dst.Fx.shape[0]
Vx, Vxx = VxT_f, VxxT_f
k_next = jnp.zeros((nu, B), dtype)
qp_inputs = {}
for i in range(N - 1, -1, -1):
    Fx, Fu = Dst.Fx[i], Dst.Fu[i]
    Lx, Lu = Dst.Lx[i], Dst.Lu[i]
    Lxx, Luu, Lxu = Dst.Lxx[i], Dst.Luu[i], Dst.Lxu[i]
    lo, hi, u_i = bounds.lower[i], bounds.upper[i], bounds.u[i]
    FuT = _mT(Fu)
    FxT = _mT(Fx)
    Qu = Lu + _mv(FuT, Vx)
    Qx = Lx + _mv(FxT, Vx)
    FuT_Vxx = _mm(FuT, Vxx)
    Qux = _mT(Lxu) + _mm(FuT_Vxx, Fx)
    Quu = Luu + _mm(FuT_Vxx, Fu)
    Qxx = Lxx + _mm(_mm(FxT, Vxx), Fx)
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

    qp_inputs[i] = (np.asarray(Quu_F[..., lane]), np.asarray(Qu[..., lane]),
                    np.asarray((lo - u_i)[..., lane]),
                    np.asarray((hi - u_i)[..., lane]),
                    np.asarray(k_next[..., lane]))

    k, ok_i, free, cholL, qp_it = boxqp_stacked(
        Quu_F, Qu, lo - u_i, hi - u_i, k_next, config.boxqp)
    Lrows = [[cholL[ii, jj] for jj in range(nu)] for ii in range(nu)]
    K = -free[:, None, :] * _chol_solve_bl(Lrows, free[:, None, :] * Qux_reg)
    Quu_k = _mv(Quu, k)
    KT = _mT(K)
    Vx = Qx + _mv(KT, Quu_k) + _mv(KT, Qu) + _mv(_mT(Qux), k)
    Vxx_new = (Qxx + _mm(KT, _mm(Quu, K)) + _mm(KT, Qux) + _mm(_mT(Qux), K))
    Vxx = 0.5 * (Vxx_new + _mT(Vxx_new))
    k_next = k

# ---- single-element numpy replicas of both QP paths with decision trail ---
bq = config.boxqp


def trail_stacked(H, g, lo, hi, x0):
    """numpy replica of boxqp_stacked single element, printing decisions."""
    f32 = np.float32
    x = np.clip(x0, lo, hi).astype(f32)
    obj = f32(g @ x + 0.5 * x @ H @ x)
    old_obj = obj
    status = 0
    it = 0
    print("  [stacked] x0", x, "obj", obj)
    while status == 0 and it < bq.max_iter:
        it += 1
        imp = (it > 1) and ((old_obj - obj) < f32(bq.rel_improve_thre) * abs(old_obj))
        old_obj = obj
        grad = (g + H @ x).astype(f32)
        clamped = ((x == lo) & (grad > 0)) | ((x == hi) & (grad < 0))
        free = ~clamped
        Hm = np.where(np.outer(free, free), H, 0.0) + np.diag(clamped.astype(f32))
        try:
            L = np.linalg.cholesky(Hm.astype(np.float64))
            okc = True
        except np.linalg.LinAlgError:
            okc = False
            L = np.eye(len(x))
        gn2 = f32(np.sum(np.where(free, grad, 0.0) ** 2))
        small_grad = gn2 < f32(bq.grad_thre) ** 2
        rhs = np.where(free, g + H @ (np.where(clamped, x, 0.0)), 0.0)
        d = np.where(free, -np.linalg.solve(Hm.astype(np.float64), rhs)
                     - np.where(free, x, 0.0), 0.0).astype(f32)
        sdg = f32(d @ grad)
        bad_dir = sdg > 1e-10
        pre_exit = imp or clamped.all() or (not okc) or small_grad or bad_dir
        print(f"  [stacked] it={it} imp={imp} all_cl={clamped.all()} okc={okc}"
              f" small_grad={small_grad} bad_dir={bad_dir} d={d} sdg={sdg}")
        if pre_exit:
            print("  [stacked] pre-exit")
            break
        # Armijo head+tail over full schedule (shipped r4/r5 semantics:
        # first-accept; a below-min_step stop is exhaustion regardless of
        # its Armijo result; schedule exhaustion keeps the LAST-visited —
        # tiniest-step — candidate with status 2)
        step = f32(1.0)
        last_xc = last_objc = None
        for kk in range(bq.max_ls_iter + 1):
            xc = np.clip(x + step * d, lo, hi).astype(f32)
            objc = f32(g @ xc + 0.5 * xc @ H @ xc)
            ratio = (objc - old_obj) / (step * sdg)
            acc = ratio >= f32(bq.armijo_param)
            below = step < f32(bq.min_step)
            last_xc, last_objc = xc, objc
            print(f"    ls k={kk} step={step:.6g} xc={xc} objc={objc}"
                  f" ratio={ratio:.6f} acc={acc} below={below}")
            if acc or below:
                x, obj = xc, objc
                if below:
                    status = 2  # MAX_LS_ITER (BoxQP.h:304-308)
                break
            step = f32(step * f32(bq.step_factor))
        else:
            # schedule exhausted without a stop: keep the last-visited
            # (tiniest-step) candidate, status 2 — the shipped kernels'
            # rule (ADVICE r4 #3)
            x, obj = last_xc, last_objc
            status = 2
            print("    ls EXHAUSTED -> keeps last-visited cand", x)
        if status:
            break
    print(f"  [stacked] final x={x} status={status} it={it}")
    return x


def trail_pallas(H, g, lo, hi, x0):
    f32 = np.float32
    steps = []
    s = f32(1.0)
    for _ in range(bq.max_ls_iter + 1):
        steps.append(float(s))
        s = f32(s * f32(bq.step_factor))
    x = np.clip(x0, lo, hi).astype(f32)
    obj = f32(g @ x + 0.5 * x @ H @ x)
    old_obj = obj
    active = True
    print("  [pallas ] x0", x, "obj", obj)
    for it in range(1, bq.unroll_iter + 1):
        if not active:
            break
        imp = (it > 1) and ((old_obj - obj) < f32(bq.rel_improve_thre) * abs(old_obj))
        old_obj = obj
        grad = (g + H @ x).astype(f32)
        clamped = ((x == lo) & (grad > 0)) | ((x == hi) & (grad < 0))
        free = ~clamped
        Hm = np.where(np.outer(free, free), H, 0.0) + np.diag(clamped.astype(f32))
        try:
            np.linalg.cholesky(Hm.astype(np.float64))
            okc = True
        except np.linalg.LinAlgError:
            okc = False
        rhs = np.where(free, g + H @ (np.where(clamped, x, 0.0)), 0.0)
        d = np.where(free, -np.linalg.solve(Hm.astype(np.float64), rhs)
                     - np.where(free, x, 0.0), 0.0).astype(f32)
        gn2 = f32(np.sum(np.where(free, grad, 0.0) ** 2))
        small_grad = gn2 < f32(bq.grad_thre) ** 2
        sdg = f32(d @ grad)
        bad_dir = sdg > 1e-10
        pre_exit = imp or clamped.all() or (not okc) or small_grad or bad_dir
        print(f"  [pallas ] it={it} imp={imp} all_cl={clamped.all()} okc={okc}"
              f" small_grad={small_grad} bad_dir={bad_dir} d={d} sdg={sdg}")
        if pre_exit:
            break
        # same shipped semantics as trail_stacked (the fused kernel runs
        # full stacked BoxQP semantics since r4; exhaustion keeps the
        # last-visited candidate and terminates the lane)
        found = False
        xa, obja = x.copy(), obj
        last_xc = last_objc = None
        for sv in steps:
            xc = np.clip(x + f32(sv) * d, lo, hi).astype(f32)
            objc = f32(g @ xc + 0.5 * xc @ H @ xc)
            ratio = (objc - old_obj) / (f32(sv) * sdg)
            acc = ratio >= f32(bq.armijo_param)
            below = sv < bq.min_step
            last_xc, last_objc = xc, objc
            if (acc or below) and not found:
                xa, obja = xc, objc
                found = True
                if below:
                    active = False  # exhaustion regardless of Armijo
                print(f"    ls step={sv:.6g} STOP xc={xc} ratio={ratio:.6f}"
                      f" acc={acc} below={below}")
                break
        if not found:
            xa, obja = last_xc, last_objc
            print("    ls exhausted -> pallas keeps last-visited cand", xa)
            active = False
        x, obj = xa, obja
    print(f"  [pallas ] final x={x}")
    return x


for st in range(N - 1, -1, -1):
    if per_stage[st] > 3e-6:
        H, g, lo, hi, x0 = qp_inputs[st]
        print(f"\n=== stage {st} lane {lane} ===")
        print("H", H, "\ng", g, "lo", lo, "hi", hi, "x0", x0)
        xs_ = trail_stacked(H.astype(np.float32), g.astype(np.float32),
                            lo.astype(np.float32), hi.astype(np.float32),
                            x0.astype(np.float32))
        xp_ = trail_pallas(H.astype(np.float32), g.astype(np.float32),
                           lo.astype(np.float32), hi.astype(np.float32),
                           x0.astype(np.float32))
        print("stacked ks:", ks1[st, :, lane], " pallas ks:", ks2[st, :, lane])
        print("replica stacked:", xs_, " replica pallas:", xp_)
        break
