"""Test configuration: CPU backend with 8 virtual devices (multi-chip
sharding simulation) and float64 enabled (the reference solver is f64;
SURVEY.md section 4 test-strategy mapping)."""

import os
import sys

# force CPU: the session environment pins JAX_PLATFORMS to the TPU tunnel,
# but unit tests want the 8-device virtual CPU mesh + float64
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon sitecustomize pins jax_platforms via config, so the env var alone
# does not stick -- override the config explicitly
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the suite is compile-bound (every test jits
# a whole solve program), so cache XLA executables across pytest runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_calipso")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
