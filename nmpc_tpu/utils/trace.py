"""Trace-data dumps in the reference's whitespace-table format.

Column schemas match ``DDPSolver::dumpTraceDataList``
(``nmpc_ddp/include/nmpc_ddp/DDPSolver.hpp:563-598``) and
``FmpcSolver::dumpTraceDataList`` (``FmpcSolver.hpp:260-283``) so the
reference's plotting workflow (``nmpc_ddp/scripts/plotDDPTraceData.py``)
applies unchanged.  Per-phase durations are measured on the host (the device
code is one fused computation — see utils/timing.py); when unavailable they
are written as 0.
"""

from __future__ import annotations

import numpy as np


def dump_ddp_trace(result, file_path: str, durations=None):
    """Write a DDP trace table for one (unbatched) DDPResult."""
    tr = result.trace
    n = int(result.iters) + 1
    cols = [
        ("iter", np.asarray(tr.iter[:n])),
        ("cost", np.asarray(tr.cost[:n])),
        ("lambda", np.asarray(tr.lam[:n])),
        ("dlambda", np.asarray(tr.dlam[:n])),
        ("alpha", np.asarray(tr.alpha[:n])),
        ("k_rel_norm", np.asarray(tr.k_rel_norm[:n])),
        ("cost_update_actual", np.asarray(tr.cost_update_actual[:n])),
        ("cost_update_expected", np.asarray(tr.cost_update_expected[:n])),
        ("cost_update_ratio", np.asarray(tr.cost_update_ratio[:n])),
        ("duration_derivative", np.zeros(n)),
        ("duration_backward", np.zeros(n)),
        ("duration_forward", np.zeros(n)),
    ]
    if durations is not None:
        for name, arr in durations.items():
            for i, (cn, _) in enumerate(cols):
                if cn == f"duration_{name}":
                    cols[i] = (cn, np.asarray(arr[:n]))
    _write_table(file_path, cols)


def dump_fmpc_trace(result, file_path: str, durations=None):
    """Write an FMPC trace table for one (unbatched) FmpcResult.

    ``durations`` (from ``utils.profiled.profiled_solve_fmpc``) fills the
    per-iteration coeff/backward/forward/update millisecond columns
    (reference ``FmpcSolver.h:254-288``)."""
    tr = result.trace
    n = int(result.iters) + 1
    cols = [
        ("iter", np.asarray(tr.iter[1:n])),
        ("kkt_error", np.asarray(tr.kkt_error[1:n])),
        ("duration_coeff", np.zeros(max(n - 1, 0))),
        ("duration_backward", np.zeros(max(n - 1, 0))),
        ("duration_forward", np.zeros(max(n - 1, 0))),
        ("duration_update", np.zeros(max(n - 1, 0))),
    ]
    if durations is not None:
        for name, arr in durations.items():
            for i, (cn, _) in enumerate(cols):
                if cn == f"duration_{name}":
                    cols[i] = (cn, np.asarray(arr[1:n]))
    _write_table(file_path, cols)


def _write_table(file_path, cols):
    header = " ".join(name for name, _ in cols)
    data = np.column_stack([arr for _, arr in cols]) if cols[0][1].size else \
        np.zeros((0, len(cols)))
    with open(file_path, "w") as f:
        f.write(header + "\n")
        for row in data:
            f.write(" ".join(_fmt(v) for v in row) + "\n")


def _fmt(v):
    if float(v) == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def dump_cgmres_data(ts, xs, us, errs, prefix: str = "/tmp/cgmres",
                     dump_step: int = 1, log_dt: float = None,
                     param: dict = None):
    """Stream a C/GMRES closed-loop history to ``{prefix}_{x,u,err}.dat``
    plus a JSON ``{prefix}_param.dat`` — the reference's file layout
    (``CgmresSolver::run``, ``CgmresSolver.cpp:68-103``: rows are
    ``t, v1, v2, ...``), consumable by its ``plotCgmresData.py``."""
    import json

    ts = np.asarray(ts)[::max(dump_step, 1)]
    rows = {
        "x": np.asarray(xs)[::max(dump_step, 1)],
        "u": np.asarray(us)[::max(dump_step, 1)],
        "err": np.asarray(errs)[::max(dump_step, 1)].reshape(len(ts), -1),
    }
    for name, vals in rows.items():
        with open(f"{prefix}_{name}.dat", "w") as f:
            for t, v in zip(ts, vals):
                f.write(", ".join([repr(float(t))]
                                  + [repr(float(x)) for x in np.ravel(v)])
                        + "\n")
    p = dict(param or {})
    if log_dt is not None:
        p.setdefault("log_dt", log_dt)
    with open(f"{prefix}_param.dat", "w") as f:
        json.dump(p, f, indent=1)
        f.write("\n")


def load_cgmres_data(prefix: str = "/tmp/cgmres"):
    """Load ``{prefix}_{x,u,err}.dat`` back as (ts, xs, us, errs)."""
    out = []
    for name in ("x", "u", "err"):
        data = np.loadtxt(f"{prefix}_{name}.dat", delimiter=",", ndmin=2)
        out.append(data)
    ts = out[0][:, 0]
    return ts, out[0][:, 1:], out[1][:, 1:], out[2][:, 1:].squeeze(-1)


def load_trace(file_path: str) -> dict:
    """Load a dumped trace table back into {column: np.ndarray}."""
    with open(file_path) as f:
        header = f.readline().split()
    data = np.loadtxt(file_path, skiprows=1, ndmin=2)
    return {name: data[:, i] if data.size else np.zeros(0)
            for i, name in enumerate(header)}
