"""Device-mesh construction helpers.

The parallelism axes for this model class (SURVEY.md §2.3) are
``chain`` (NUTS/HMC chains, ≈DP), ``data`` (SVGP minibatch rows), and
``particle`` (SMC).  The reference is single-process NumPy; everything
here is new TPU capability.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "factor_devices", "replicated", "shard_along"]


def factor_devices(n: int, n_axes: int = 2) -> tuple:
    """Factor n devices into a balanced n_axes-dim grid (largest factors
    first), e.g. 8 → (4, 2), 16 → (4, 4)."""
    dims = [1] * n_axes
    remaining = n
    for i in range(n_axes - 1):
        # largest divisor ≤ sqrt-ish share
        target = int(round(remaining ** (1.0 / (n_axes - i))))
        best = 1
        for d in range(1, remaining + 1):
            if remaining % d == 0 and d <= max(target, 1):
                best = d
        dims[i] = best
        remaining //= best
    dims[-1] = remaining
    dims.sort(reverse=True)
    return tuple(dims)


def make_mesh(axis_names: Sequence[str] = ("chain", "data"),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Mesh over all local (or given) devices.

    With no ``shape``, devices are factored evenly over the axes.  Axis
    types are Auto so both ``shard_map`` and sharding-annotated ``jit``
    compose.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = factor_devices(n, len(axis_names))
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_along(mesh: Mesh, axis: str, ndim: int = 1,
                dim: int = 0) -> NamedSharding:
    """Sharding that splits array dim ``dim`` along mesh axis ``axis``."""
    spec = [None] * ndim
    spec[dim] = axis
    return NamedSharding(mesh, PartitionSpec(*spec))
