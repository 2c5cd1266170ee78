"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Mirrors the reference's (absent) test strategy upgraded per SURVEY.md §4: all
numerics are validated in float64 on CPU; multi-device sharding tests use
XLA's forced host platform device count so no real TPU pod is needed.

Note: ``jax.config.update('jax_platforms', ...)`` (not the env var) is
required here — the environment's sitecustomize imports jax and registers a
TPU plugin before conftest runs, and initializing that backend takes minutes.
The config update keeps the whole test session on host CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the suite is compile-bound (many jitted
# solver variants), so warm re-runs must not re-pay XLA compilation
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
