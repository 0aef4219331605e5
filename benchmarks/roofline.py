"""Speed-of-light audit of the fused Pallas kernels (VERDICT r2 item #5).

For each kernel at its headline shape, computes the HBM bytes streamed and
the VPU FLOPs executed per call, derives the memory-bound and compute-bound
time on a v5e chip, measures the actual kernel time, and reports achieved %
of the binding roofline.

v5e (TPU v5 lite) per-chip peaks used here:
  HBM bandwidth  ~819 GB/s
  fp32 VPU       ~ 197/2/4 ~ 24.6 TFLOP/s nominal vector fp32 (the MXU's
                 197 TFLOP/s bf16 figure is irrelevant: these kernels are
                 elementwise-over-lanes by design, nothing maps to the MXU
                 at nx<=4)

The kernels stream every stage quantity exactly once (double-buffered DMA,
no re-reads), so bytes = sum of input/output stage slices; FLOPs counted
from the unrolled small-matrix algebra.

Measurement methodology (round 4): kernels are timed CHAINED inside one
jit (a data-dependent fori_loop), because a single dispatch through this
environment's device tunnel costs ~175-200 us regardless of the op — a
trivial (32,128) multiply measures the same as the r3 'fused backward'
row, so the r3 standalone numbers (and their 49.5%/48.6%/10.4%-of-
roofline conclusions) were dispatch-bound, not kernel-bound.  The chained
number is the in-graph cost a full jitted solve actually pays per kernel
call.  Both are reported.

Run: python benchmarks/roofline.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

HBM_GBPS = 819e9


def bytes_total_pct(bytes_total, measured_s):
    return (bytes_total / HBM_GBPS) / measured_s * 100
VPU_FLOPS = 24.6e12


def ddp_kernel_model(nx, nu, N, B):
    """Bytes + FLOPs per backward_pallas call."""
    in_floats = (2 * nx * nx + 2 * nx * nu + nx + 2 * nu + nu * nu)
    #            Fx,Lxx       Fu,Lxu       Lx   Lu+k    Luu
    out_floats = nu + nu * nx                       # k, K
    carry = 0                                       # resident in VMEM
    bytes_total = (in_floats + out_floats + carry) * 4 * N * B
    # per-stage flops (matmul chains on nx/nu-sized tiles, per lane):
    # Qu,Qx (2 mat-vec), FuT Vxx (nx*nx*nu), Qux/Quu/Qxx (3 mats),
    # cholesky nu^3/3, solves nu^2*(nx+1), value update ~4 nx^2 nu
    f = (2 * nx * nx + 2 * nx * nu                      # mat-vecs
         + 2 * nx * nx * nu + 2 * nx * nu * nu          # FuT Vxx, Quu
         + 2 * nx * nx * nx                             # Qxx
         + nu ** 3 // 3 + 2 * nu * nu * (nx + 1)        # chol + solves
         + 6 * nx * nx * nu + 2 * nx * nu)              # value recursion
    flops_total = 2 * f * N * B
    return bytes_total, flops_total


def fmpc_kernel_model(nx, nu, ng, N, B):
    in_floats = (2 * nx * nx + 2 * nx * nu + ng * nx + ng * nu + nu * nu
                 + 2 * nx + nu + 2 * ng + nx + nx)
    out_floats = nu + nu * nx + nx + nx * nx
    bytes_total = (in_floats + out_floats) * 4 * N * B
    f = (2 * ng * nx * nx + 2 * ng * nu * nu + 2 * ng * nx * nu  # condense
         + 4 * nx * nx * nx + 4 * nx * nx * nu                   # F,H,G,PA
         + nu ** 3 // 3 + 2 * nu * nu * (nx + 1)                 # chol+solve
         + 6 * nx * nx * nu + 4 * nx * nx)                       # value rec
    flops_total = 2 * f * N * B
    return bytes_total, flops_total


def chained_time(fn, probe, *args, R=30):
    """Per-call seconds of fn chained R times inside one jit (defeats the
    per-dispatch tunnel overhead; CSE defeated via a fp-negligible
    data-dependent perturbation of the LAST arg — which every caller makes
    a small [B] vector, so the perturbation itself adds no measurable
    bandwidth; perturbing a large input would re-materialize it every
    trip and overcount the kernel by its own byte volume)."""
    from jax import lax

    from benchmarks.timing import device_time_min

    tiny = jnp.float32(1e-30)

    def run(*a):
        def body(i, acc):
            out = fn(*a[:-1], a[-1] + acc * tiny)
            return acc + probe(out)
        return lax.fori_loop(0, R, body, jnp.float32(0.0))

    t = device_time_min(jax.jit(run), *args, reps=3, trials=3)
    return t / R


def audit(name, bytes_total, flops_total, measured_s):
    t_mem = bytes_total / HBM_GBPS
    t_cmp = flops_total / VPU_FLOPS
    bound = "memory" if t_mem >= t_cmp else "compute"
    t_bound = max(t_mem, t_cmp)
    return {
        "kernel": name,
        "bytes_streamed_MB": round(bytes_total / 1e6, 2),
        "flops_M": round(flops_total / 1e6, 1),
        "sol_memory_us": round(t_mem * 1e6, 1),
        "sol_compute_us": round(t_cmp * 1e6, 1),
        "binding_roofline": bound,
        "measured_us": round(measured_s * 1e6, 1),
        "achieved_pct_of_roofline": round(100 * t_bound / measured_s, 1),
    }


def main():
    from benchmarks.timing import device_time_min

    out = []

    # ---- DDP fused backward at the headline config -----------------------
    from nmpc_tpu.core.types import DDPConfig
    from nmpc_tpu.kernels.ddp_backward import backward_stacked, stack_derivs
    from nmpc_tpu.kernels.ddp_backward_pallas import backward_pallas
    from nmpc_tpu.kernels.ddp_backward import StackedDerivs

    nx, nu, N, B = 4, 1, 100, 4096
    r = np.random.default_rng(1)
    mk = lambda *s: jnp.asarray(0.1 * r.normal(size=s).astype(np.float32))
    eye = np.eye(nx, dtype=np.float32)
    D = StackedDerivs(
        Fx=jnp.asarray(np.tile(eye[None], (N, 1, 1)))[..., None]
        + mk(N, nx, nx, B) * 0.01,
        Fu=mk(N, nx, nu, B) * 0.1,
        Lx=mk(N, nx, B), Lu=mk(N, nu, B),
        Lxx=jnp.asarray(0.01 * np.tile(eye[None], (N, 1, 1)))[..., None]
        + 0 * mk(N, nx, nx, B),
        Luu=jnp.asarray(0.01 * np.tile(np.eye(nu, dtype=np.float32)[None],
                                       (N, 1, 1)))[..., None]
        + 0 * mk(N, nu, nu, B),
        Lxu=mk(N, nx, nu, B) * 0.001,
    )
    VxT = mk(nx, B)
    VxxT = jnp.asarray(eye)[..., None] + 0 * mk(nx, nx, B)
    lam = jnp.full((B,), 1e-4, jnp.float32)
    cfg = DDPConfig(horizon_steps=N, max_iter=10)
    b, f = ddp_kernel_model(nx, nu, N, B)
    for packed in (True, False):
        f_pl = jax.jit(lambda *a, p=packed: backward_pallas(cfg, *a, packed=p))
        t = device_time_min(f_pl, D, VxT, VxxT, lam)
        tag = "packed-1dma" if packed else "unpacked-7dma"
        row = audit(
            f"ddp_backward_pallas[cartpole B=4096 N=100 {tag}]", b, f, t)
        t_ch = chained_time(
            lambda *a, p=packed: backward_pallas(cfg, *a, packed=p),
            lambda o: o[0][0, 0, 0], D, VxT, VxxT, lam)
        row["measured_chained_us"] = round(t_ch * 1e6, 1)
        row["pct_of_mem_roofline_chained"] = round(
            bytes_total_pct(b, t_ch), 1)
        out.append(row)

    # ---- FMPC fused backward at both benchmarked configs -----------------
    from nmpc_tpu.core.types import FmpcConfig, fmpc_variable_reset
    from nmpc_tpu.kernels.fmpc_backward_pallas import backward_fmpc_pallas
    from nmpc_tpu.models.cartpole import make_cartpole_fmpc_problem
    from nmpc_tpu.models.oscillator import make_oscillator_problem
    from nmpc_tpu.solvers import fmpc as F

    for name, p, N_f in (("oscillator B=4096 N=20",
                          make_oscillator_problem(0.01), 20),
                         ("cartpole B=4096 N=100",
                          make_cartpole_fmpc_problem(0.01), 100)):
        nx_f, nu_f, ng_f = p.state_dim, p.input_dim, p.ineq_dim
        var1 = fmpc_variable_reset(N_f, nx_f, nu_f, ng_f, dtype=jnp.float32)
        vars_b = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), var1)
        bm = lambda a: jnp.moveaxis(a, 0, -1)
        var = jax.tree_util.tree_map(bm, vars_b)
        eps0 = jnp.full((B,), 1e-4, jnp.float32)
        t0 = jnp.float32(0.0)
        ts = t0 + p.dt * jnp.arange(N_f, dtype=jnp.float32)
        gms = jax.vmap(lambda t: p.ineq_mask_at(t).astype(jnp.float32))(ts)
        ineq_b = jax.vmap(p.ineq_const, in_axes=(None, -1, -1), out_axes=-1)
        g0 = jax.vmap(ineq_b)(ts, var.xs[:-1], var.us)
        ss = 1.01 * jnp.maximum(-g0, 1e-2)
        nus = 1.01 * jnp.maximum(eps0[None, None, :] / ss, 1e-2)
        var = type(var)(var.xs, var.us, var.lambdas, ss, nus)
        c = FmpcConfig(horizon_steps=N_f, max_iter=5)
        co = F._coeffs_bm(p, c, t0, var)
        f_pl = jax.jit(lambda co, ss, nus, eps, p=p, c=c, gms=gms:
                       backward_fmpc_pallas(p, c, co, ss, nus, gms, eps))
        t = device_time_min(f_pl, co, var.ss, var.nus, eps0)
        b, f = fmpc_kernel_model(nx_f, nu_f, ng_f, N_f, B)
        row = audit(f"fmpc_backward_pallas[{name}]", b, f, t)
        t_ch = chained_time(
            lambda co_, ss, nus, eps, p=p, c=c, gms=gms:
            backward_fmpc_pallas(p, c, co_, ss, nus, gms, eps),
            lambda o: o[0][0, 0, 0], co, var.ss, var.nus, eps0)
        # eps is the perturbed (last) arg — a [B] vector, bandwidth-free
        row["measured_chained_us"] = round(t_ch * 1e6, 1)
        row["pct_of_mem_roofline_chained"] = round(
            bytes_total_pct(b, t_ch), 1)
        out.append(row)

    for r_ in out:
        print(json.dumps(r_, indent=1))


if __name__ == "__main__":
    main()
