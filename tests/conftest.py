"""Test environment: force an 8-virtual-device CPU backend so sharding/DP
logic is exercised without a pod (SURVEY §4 'Distributed')."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
