"""Test harness config: real CPU backend, x64 parity mode, 8-device mesh.

This machine's default JAX platform is a tunneled TPU whose compiles route
through a remote compile service (high, variable latency).  For tests we
force the local CPU backend (fast local LLVM compiles, true float64 for
GPy-parity numerics) and expose 8 virtual CPU devices so multi-chip
sharding tests run per SURVEY.md §4's plan.  ``jax_platforms`` must be set
via config (not env): the machine's sitecustomize overrides the env var.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
_cache_dir = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
