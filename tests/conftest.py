"""Test harness: force an 8-device virtual CPU mesh.

Mirrors the multi-chip design target — shardings written for a real TPU
mesh are exercised on CPU via --xla_force_host_platform_device_count.

The ambient environment may pre-register a TPU backend from interpreter
startup (sitecustomize), so setting JAX_PLATFORMS in os.environ is not
enough; we override the jax config directly before any backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    # tests are compile-bound on the 1-CPU harness; level 0 halves XLA:CPU
    # compile time (90s -> 41s on the stage-1 trainer test, same results)
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
