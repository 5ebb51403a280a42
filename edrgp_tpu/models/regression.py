"""GP regression estimators (sklearn interface).

API-parity rewrite of ``/root/reference/edrgp/gp_model/regression.py``:
same constructor signatures and defaults (``normalizer=True, noise_var=1.0``
at lines 47-49; ``num_inducing=10`` at line 124), backed by the native
JAX/XLA engine instead of GPy.
"""

from __future__ import annotations

from sklearn.base import RegressorMixin

from ..ops.kernels import RBF
from .base import _BaseGP
from .state import ExactGPModel, SGPRModel

__all__ = ["GaussianProcessRegressor", "SparseGaussianProcessRegressor"]


class GaussianProcessRegressor(_BaseGP, RegressorMixin):
    """Exact GP regressor (native ``GPy.models.GPRegression`` equivalent).

    Parameters follow reference ``regression.py:47-56`` exactly; all are
    stored verbatim so sklearn ``clone`` works (the EDR layer depends on it).
    """

    def __init__(self, kernels=None, kernel_options=None, Y_metadata=None,
                 normalizer=True, noise_var=1.0, mean_function=None,
                 method="optimize"):
        self.normalizer = normalizer
        self.noise_var = noise_var
        self.kernels = kernels
        self.kernel_options = kernel_options
        self.Y_metadata = Y_metadata
        self.mean_function = mean_function
        self.method = method

    def _get_model(self, X, y, kernel):
        if kernel is None:
            kernel = RBF(X.shape[1])
        return ExactGPModel(X, y, kernel, normalizer=self.normalizer,
                            noise_var=self.noise_var,
                            mean_function=self.mean_function)


class SparseGaussianProcessRegressor(_BaseGP, RegressorMixin):
    """Sparse (Titsias) GP regressor (native ``SparseGPRegression``
    equivalent; reference ``regression.py:80-157``)."""

    def __init__(self, kernels=None, kernel_options=None, Z=None,
                 num_inducing=10, Y_metadata=None, X_variance=None,
                 normalizer=True, mean_function=None, method="optimize"):
        self.kernels = kernels
        self.kernel_options = kernel_options
        self.Z = Z
        self.num_inducing = num_inducing
        self.Y_metadata = Y_metadata
        self.X_variance = X_variance
        self.normalizer = normalizer
        self.mean_function = mean_function
        self.method = method

    def _get_model(self, X, y, kernel):
        if kernel is None:
            kernel = RBF(X.shape[1])
        return SGPRModel(X, y, kernel, Z=self.Z,
                         num_inducing=self.num_inducing,
                         X_variance=self.X_variance,
                         normalizer=self.normalizer,
                         mean_function=self.mean_function)
