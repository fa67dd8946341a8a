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

# Persistent compile cache: the suite is compile-bound on the 1-core CPU
# harness (XLA:CPU compiles dominate wall time), and re-runs recompile
# mostly-identical programs.  Caching executables on disk cut the slowest
# trainer test 34s -> 14s; CLI tests benefit doubly since their spawned
# subprocesses inherit these env vars and share the same cache.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".cache", "jax_compile")
os.makedirs(_cache_dir, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
