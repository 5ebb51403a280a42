"""Numerical engine: kernels, linalg, exact/sparse/variational GP math."""

from . import exact, kernels, linalg, sgpr, svgp, vgp  # noqa: F401
from .kernels import KERNEL_REGISTRY, Kernel, make_kernel, register_kernel

__all__ = ["exact", "kernels", "linalg", "sgpr", "svgp", "vgp",
           "Kernel", "make_kernel", "register_kernel", "KERNEL_REGISTRY"]
