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
from edrgp_tpu.config import cpu_compile_cache_dir  # noqa: E402

# host-keyed CPU subdir: XLA:CPU AOT entries from a different host
# microarch abort the process when executed (see cpu_compile_cache_dir)
_cache_dir = cpu_compile_cache_dir(os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache")))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _build_native_loader():
    """Build ``native/libedrgp_data.so`` so the C++ loader tests run
    (skip only when no compiler is available)."""
    import shutil
    import subprocess

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    so = os.path.join(repo, "native", "libedrgp_data.so")
    src = os.path.join(repo, "native", "dataloader.cpp")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return
    if shutil.which("make") is None and shutil.which("g++") is None:
        return
    subprocess.run(["make", "-C", os.path.join(repo, "native")],
                   check=False, capture_output=True, timeout=120)


_build_native_loader()
