"""GP estimators (sklearn interface), mirroring
``/root/reference/edrgp/gp_model/__init__.py``."""

from .regression import GaussianProcessRegressor, SparseGaussianProcessRegressor
from .bayesian import BayesianGaussianProcessRegressor
from .heteroscedastic import GaussianProcessHeteroscedasticRegressor
from .svgp import SVGPRegressor

__all__ = [
    "GaussianProcessRegressor",
    "SparseGaussianProcessRegressor",
    "BayesianGaussianProcessRegressor",
    "GaussianProcessHeteroscedasticRegressor",
    "SVGPRegressor",
]

try:  # classification lands after the VI layer; keep import soft during build
    from .classification import (GaussianProcessClassifier,
                                 SparseGaussianProcessClassifier)
    __all__ += ["GaussianProcessClassifier", "SparseGaussianProcessClassifier"]
except ImportError:  # pragma: no cover
    pass
