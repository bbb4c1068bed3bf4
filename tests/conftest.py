"""Test configuration: CPU backend with a virtual 8-device mesh and float64.

Mirrors the reference's test numerics (double precision, src/test/verify.cc)
while exercising the multi-device sharding paths without TPU hardware — the
standard ``xla_force_host_platform_device_count`` trick (SURVEY.md §4).
"""

import os

# Must be set before jax initializes its backends.  Force-override: the
# session environment presets JAX_PLATFORMS to the TPU platform, but the
# test suite runs on the CPU backend (float64 + virtual 8-device mesh).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The session's sitecustomize imports jax at interpreter startup with the
# TPU platform preselected, so the env var alone is too late — override via
# config (effective until the first backend use).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the solver while_loops are expensive to
# compile on the CPU backend; caching them makes repeated test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/cppns_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
