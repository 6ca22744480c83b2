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

# NO persistent compilation cache on CPU: XLA:CPU cache entries embed AOT
# machine code and deserializing them can SIGILL/segfault when the
# compile-time machine features disagree with the host -- observed in this
# image on the d=54 quadruped MPC program (cpu_aot_loader 'machine type
# doesn't match' warning, then SIGSEGV inside deserialize_executable on a
# cache hit). The suite therefore compiles cold each run; budgets in
# CLAUDE.md reflect that. (calipso_tpu enables the cache only for non-CPU
# platforms -- see _cache_is_safe.)
