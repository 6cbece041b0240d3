"""Test environment: force an 8-virtual-device CPU backend so sharding/DP
logic is exercised without a pod (SURVEY §4 'Distributed')."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Persistent compile cache: the suite is XLA-CPU-compile dominated (a
# warm cache halves single-file wall time, measured 35 -> 19 s on
# test_parallel.py::test_dp_fused_matches_single_device), and repeat runs
# on a dev box are the common case.  Harmless when cold.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/jax_gsplat_cpu_tests"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
