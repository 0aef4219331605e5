"""Docs build + wheel packaging checks.

Parity targets:
  * API-doc build — the reference builds per-package Doxygen docs in CI
    (``/root/reference/.github/workflows/ci-colcon.yaml:63-94``,
    ``nmpc_ddp/doc/CMakeLists.txt:1-11``).  Here: ``tools/gen_api_docs.py``
    must generate a page per module with the key public symbols present.
  * Installable package — the reference ships CMake/ament/Debian packaging
    (``CMakeLists.txt:1-77``, ``debian/``).  Here: the sdist/wheel metadata
    in ``pyproject.toml`` must actually produce a wheel containing the
    package and the native runtime source (checked in the `packaging` CI
    job; the fast test below validates the setuptools package discovery
    without invoking a build backend).
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_api_docs_generate(tmp_path):
    sys.path.insert(0, str(REPO / "tools"))
    try:
        import gen_api_docs
    finally:
        sys.path.pop(0)

    written = gen_api_docs.generate(tmp_path)
    names = {p.name for p in written}
    # one page per core module + index
    for expected in [
        "index.md",
        "nmpc_tpu_solvers_ddp.md",
        "nmpc_tpu_solvers_fmpc.md",
        "nmpc_tpu_solvers_cgmres.md",
        "nmpc_tpu_solvers_boxqp.md",
        "nmpc_tpu_solvers_gmres.md",
        "nmpc_tpu_core_problem.md",
        "nmpc_tpu_parallel_mesh.md",
    ]:
        assert expected in names, expected

    ddp = (tmp_path / "nmpc_tpu_solvers_ddp.md").read_text()
    assert "DDPSolver" in ddp and "solve_batch" in ddp
    assert "DDPSolver.hpp" in ddp  # reference citations survive into docs

    types = (tmp_path / "nmpc_tpu_core_types.md").read_text()
    assert "DDPConfig" in types
    assert "| field | type | default |" in types  # config tables rendered

    index = (tmp_path / "index.md").read_text()
    assert "nmpc_tpu.solvers.ddp" in index


def test_wheel_contents_listing():
    """The wheel must include every package dir and the runtime C++ source
    (shipped + compiled on demand).  Uses setuptools' package discovery
    directly — fast, no build backend subprocess."""
    out = subprocess.run(
        [sys.executable, "-c",
         "from setuptools.discovery import FlatLayoutPackageFinder;"
         "import setuptools;"
         "print('\\n'.join(setuptools.find_packages(include=['nmpc_tpu*'])))"],
        cwd=REPO, capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    pkgs = set(out.stdout.split())
    for p in ["nmpc_tpu", "nmpc_tpu.core", "nmpc_tpu.kernels",
              "nmpc_tpu.models", "nmpc_tpu.mpc", "nmpc_tpu.parallel",
              "nmpc_tpu.runtime", "nmpc_tpu.solvers", "nmpc_tpu.utils"]:
        assert p in pkgs, f"{p} missing from package discovery"
    assert (REPO / "nmpc_tpu/runtime/src/nmpc_runtime.cpp").exists()
