"""Profiling and timing harness (SURVEY.md §5: the reference hand-times
with ``time.time()`` in notebooks; this is the structured replacement).

``trace`` wraps ``jax.profiler`` for TensorBoard-readable device traces;
``time_compiled`` separates compile time from steady-state throughput with
``block_until_ready`` fencing — the measurement discipline behind
``bench.py``'s grad-evals/s numbers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax

__all__ = ["trace", "time_compiled", "flops_estimate_nlml"]


@contextlib.contextmanager
def trace(logdir: str):
    """Device trace context: view with TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_compiled(fn: Callable, *args, iters: int = 20,
                  warmup: int = 1) -> dict:
    """Compile+warm ``fn(*args)``, then measure steady-state latency.

    Returns {"compile_s", "mean_s", "per_s"} with proper async fencing.
    """
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    mean_s = (time.perf_counter() - t0) / iters
    return {"compile_s": compile_s, "mean_s": mean_s, "per_s": 1.0 / mean_s}


def flops_estimate_nlml(n: int, q: int) -> float:
    """Rough FLOP count of one NLML+grad eval: K build O(N²Q) + Cholesky
    N³/3 + solve/VJP ≈ 3× forward factorization."""
    k_build = 2.0 * n * n * q
    chol = n ** 3 / 3.0
    return k_build + 4.0 * chol
