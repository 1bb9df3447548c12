"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding semantics are exercised without TPU hardware (SURVEY §4).

NOTE: this environment's ``sitecustomize`` imports jax at interpreter
startup with ``JAX_PLATFORMS=axon`` (remote TPU relay) already latched, so
setting environment variables here is too late.  We must flip the platform
through ``jax.config`` — backends initialize lazily, and conftest runs
before any test touches a device.
"""

import os

# XLA reads this when the CPU client is created (lazily) — still in time.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compilation cache: repeat suite runs skip XLA compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/nf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()
