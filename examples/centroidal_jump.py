"""Centroidal jump MPC — the reference's full multi-phase scenario.

Faithful reproduction of ``TestDDPCentroidalMotion.cpp:238-331`` (SolveMpc):
stance at x=0 until 1.4 s, flight 1.4-1.6 s (input dim 0 — fully masked),
landing stance at x=0.5 after; reference CoM steps from (0,0,1) to
(0.5,0,1) at 1.5 s.  The MPC loop mirrors the reference exactly: the first
solve runs with the default iteration budget (max_iter 500), every
subsequent warm-started solve is capped at max_iter 3, and a result file in
the reference's column layout (plus the first solve's trace table) is
written for its plotting workflow.

Run:  python examples/centroidal_jump.py [--end-t 3.0] [--profile]
      [--out /tmp/TestDDPCentroidalMotionResult.txt]

``--profile`` times the solve phases per MPC step with the staged-jit
profiled mode (utils/profiled.py) and fills the duration columns the
reference measures with std::chrono (``DDPSolver.h:219-247``); Q/reg/gain
come from the kernel-cost decomposition (estimate_backward_split).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp

from nmpc_tpu import DDPConfig, DDPSolver
from nmpc_tpu.models.centroidal import (
    example_ref_pos_func,
    example_stance_func,
    make_centroidal_problem,
)
from nmpc_tpu.mpc.driver import shift_warm_start

COLUMNS = (
    "time pos_x pos_y pos_z linear_momentum_x linear_momentum_y "
    "linear_momentum_z angular_momentum_x angular_momentum_y "
    "angular_momentum_z force_x force_y force_z ref_pos_x ref_pos_y "
    "ref_pos_z iter duration_setup duration_opt duration_derivative "
    "duration_backward duration_forward duration_Q_est duration_reg_est "
    "duration_gain_est"
)


def run(end_t: float = 3.0, dt: float = 0.03, horizon_duration: float = 3.0,
        out_path: str = "/tmp/TestDDPCentroidalMotionResult.txt",
        trace_path: str = "/tmp/TestDDPCentroidalMotionTraceData.txt",
        profile: bool = False):
    """Run the jump scenario; returns (rows, per-step planned-pos errors).

    Each row is the reference's dump line; the per-step assertion
    ``(planned_pos - ref_pos).norm() < 1.0``
    (``TestDDPCentroidalMotion.cpp:318``) is checked by the caller/test.
    """
    horizon_steps = int(horizon_duration / dt)
    problem = make_centroidal_problem(dt)
    ref_pos = example_ref_pos_func()
    _, ridges_f, mask_f = example_stance_func()

    # reference pattern: first solve uncapped, then max_iter = 3
    # (TestDDPCentroidalMotion.cpp:312-316)
    solver_init = DDPSolver(problem, DDPConfig(horizon_steps=horizon_steps,
                                               max_iter=500))
    solver_mpc = DDPSolver(problem, DDPConfig(horizon_steps=horizon_steps,
                                              max_iter=3))

    split = None
    if profile:
        from nmpc_tpu.utils.profiled import estimate_backward_split

    t = 0.0
    x = jnp.concatenate([jnp.asarray([0.0, 0.0, 1.0]), jnp.zeros(6)])
    us = jnp.zeros((horizon_steps, problem.input_dim), x.dtype)

    rows, pos_errs = [], []
    first = True
    while t < end_t:
        solver = solver_init if first else solver_mpc
        if profile:
            from nmpc_tpu.utils.profiled import profiled_solve_ddp

            res, dur, cd = profiled_solve_ddp(solver, t, x, us)
            if split is None:
                split = estimate_backward_split(solver, t, x, us)
            durs = (cd.setup, cd.opt, cd.derivative, cd.backward, cd.forward,
                    split["Q"], split["reg"], split["gain"])
        else:
            t0_ = time.perf_counter()
            res = solver.solve(t, x, us)
            solve_ms = 1e3 * (time.perf_counter() - t0_)
            durs = (0.0, solve_ms, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)

        if first:
            first = False
            from nmpc_tpu.utils.trace import dump_ddp_trace

            dump_ddp_trace(res, trace_path,
                           durations=dur if profile else None)

        planned_pos = np.asarray(res.xs[0][:3])
        ref = np.asarray(ref_pos(t))
        pos_errs.append(float(np.linalg.norm(planned_pos - ref)))

        u0 = np.asarray(res.us[0] * mask_f(t))
        force = np.asarray(ridges_f(t)).T @ u0           # [3]
        rows.append((t, *np.asarray(x), *force, *ref, int(res.iters), *durs))

        # plant step with the planned input + shift warm start
        x = problem.dynamics(t, x, res.us[0])
        us = shift_warm_start(problem, t + dt, res.us)
        t += dt

    with open(out_path, "w") as f:
        f.write(COLUMNS + "\n")
        # Provenance marker (np.loadtxt/gnuplot skip '#' lines): the *_est
        # columns are shape-representative kernel-cost estimates from
        # utils/profiled.estimate_backward_split, not in-loop measurements
        # (the fused device backward admits no inner timers).
        f.write("# duration_{Q,reg,gain}_est: shape-representative estimates"
                " (utils/profiled.estimate_backward_split); other durations"
                " are measured host-fenced stage times\n")
        for row in rows:
            f.write(" ".join(f"{v:.10g}" if isinstance(v, float) else str(v)
                             for v in row) + "\n")
    return rows, pos_errs, np.asarray(x)


if __name__ == "__main__":
    end_t = 3.0
    profile = "--profile" in sys.argv
    out = "/tmp/TestDDPCentroidalMotionResult.txt"
    if "--end-t" in sys.argv:
        end_t = float(sys.argv[sys.argv.index("--end-t") + 1])
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    rows, pos_errs, xf = run(end_t=end_t, out_path=out, profile=profile)
    ref = np.asarray(example_ref_pos_func()(end_t))
    print(f"steps={len(rows)} max_step_pos_err={max(pos_errs):.3f} "
          f"final_pos_err={np.linalg.norm(xf[:3] - ref):.4f}")
    print(f"result written to {out}")
