"""Test configuration.

Tests run on CPU with fp64 enabled (golden-parity checks against the NumPy
reference implementation) and 8 virtual host devices so the multi-chip
sharding path is exercised without TPU hardware — the standard JAX
fake-multi-device mechanism (SURVEY.md §4).
"""

import os
import sys

# NOTE: in this image a sitecustomize module imports jax at interpreter
# start (TPU "axon" plugin), so JAX_PLATFORMS env vars are already consumed;
# jax.config.update after import is the reliable override.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(__file__))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: this host has 2 CPUs, so cold XLA compiles
# dominate suite wall time; cached reruns cut it drastically
try:
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
