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

__all__ = ["make_mesh", "make_hybrid_mesh", "factor_devices", "replicated",
           "shard_along"]


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


def make_hybrid_mesh(ici_axis_names: Sequence[str] = ("chain", "data"),
                     dcn_axis_name: str = "host",
                     ici_shape: Optional[Sequence[int]] = None,
                     devices=None) -> Mesh:
    """DCN-aware mesh: a leading ``host`` axis over process granules, inner
    axes over each process's local devices (ICI on a real pod slice).

    Shardings that put heavy, latency-sensitive collectives on the inner
    axes and only small reductions on ``host`` keep traffic on ICI and off
    DCN — the layout recipe from the scaling playbook.  Degenerates to a
    size-1 host axis in single-process runs, so code written against the
    hybrid mesh runs unchanged on one host.
    """
    if devices is None:
        devices = jax.devices()
    procs = sorted({d.process_index for d in devices})
    per_proc = [d for d in devices if d.process_index == procs[0]]
    if any(sum(d.process_index == p for d in devices) != len(per_proc)
           for p in procs):
        raise ValueError("devices are not evenly spread across processes")
    if ici_shape is None:
        ici_shape = factor_devices(len(per_proc), len(ici_axis_names))
    if int(np.prod(ici_shape)) != len(per_proc):
        raise ValueError(f"ici shape {ici_shape} != {len(per_proc)} "
                         "devices per process")
    by_proc = [[d for d in devices if d.process_index == p] for p in procs]
    dev_array = np.asarray(by_proc).reshape((len(procs),) + tuple(ici_shape))
    return Mesh(dev_array, (dcn_axis_name,) + tuple(ici_axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_along(mesh: Mesh, axis: str, ndim: int = 1,
                dim: int = 0) -> NamedSharding:
    """Sharding that splits array dim ``dim`` along mesh axis ``axis``."""
    spec = [None] * ndim
    spec[dim] = axis
    return NamedSharding(mesh, PartitionSpec(*spec))
