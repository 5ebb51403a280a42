"""Global numeric configuration for the TPU-native EDR-GP engine.

The reference (neuro-ml/edr-gp) runs everything in NumPy float64 through GPy.
On TPU the fast path is float32 (MXU) with carefully managed jitter; parity
tests enable ``jax_enable_x64`` on the CPU backend.  All public entry points
resolve their working dtype through :func:`default_dtype` so a single switch
controls the whole stack.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: Smallest diagonal jitter added before a Cholesky factorization, scaled by
#: the mean diagonal magnitude.  Cascades by 10x on failure (see
#: :func:`edrgp_tpu.ops.linalg.safe_cholesky`).
BASE_JITTER_F32 = 1e-6
BASE_JITTER_F64 = 1e-10

#: Number of jitter escalations attempted before giving up.
MAX_JITTER_TRIES = 6


def default_dtype() -> jnp.dtype:
    """float64 when x64 is enabled (CPU parity runs), else float32 (TPU)."""
    return jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32


def base_jitter(dtype) -> float:
    return BASE_JITTER_F64 if jnp.dtype(dtype) == jnp.float64 else BASE_JITTER_F32


def on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover - no backend at all
        return False
