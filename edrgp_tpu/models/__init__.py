"""GP estimators (sklearn interface), mirroring
``/root/reference/edrgp/gp_model/__init__.py``."""

from .regression import GaussianProcessRegressor, SparseGaussianProcessRegressor

__all__ = [
    "GaussianProcessRegressor",
    "SparseGaussianProcessRegressor",
]

try:  # classification lands after the VI layer; keep import soft during build
    from .classification import (GaussianProcessClassifier,
                                 SparseGaussianProcessClassifier)
    __all__ += ["GaussianProcessClassifier", "SparseGaussianProcessClassifier"]
except ImportError:  # pragma: no cover
    pass
