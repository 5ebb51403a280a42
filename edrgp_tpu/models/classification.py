"""GP classification estimators (sklearn interface).

API-parity rewrite of ``/root/reference/edrgp/gp_model/classification.py``:
same constructor signatures and prediction semantics (``predict`` thresholds
the class-1 probability at 0.5 — reference lines 81, 166; ``predict_proba``
returns the raw posterior probability — lines 98, 183), backed by the
native variational engine instead of GPy's EP.
"""

from __future__ import annotations

from sklearn.base import ClassifierMixin

from ..ops.kernels import RBF
from .base import _BaseGP
from .cls_state import (EPClassificationModel, SparseEPClassificationModel,
                        SparseVGPClassificationModel, VGPClassificationModel)

__all__ = ["GaussianProcessClassifier", "SparseGaussianProcessClassifier"]


class GaussianProcessClassifier(_BaseGP, ClassifierMixin):
    """Binary GP classifier (native ``GPy.models.GPClassification``
    equivalent; Bernoulli likelihood with probit link).

    ``inference`` selects the engine: ``"vi"`` (default) is the whitened
    variational fit — one jitted L-BFGS; ``"ep"`` is damped-parallel
    Expectation Propagation, the inference GPy itself runs at the
    reference call site (``classification.py:63-64``)."""

    def __init__(self, kernels=None, kernel_options=None, Y_metadata=None,
                 mean_function=None, method="optimize", inference="vi"):
        self.kernels = kernels
        self.kernel_options = kernel_options
        self.Y_metadata = Y_metadata
        self.mean_function = mean_function
        self.method = method
        self.inference = inference

    def _get_model(self, X, y, kernel):
        if kernel is None:
            kernel = RBF(X.shape[1])
        if self.inference == "ep":
            return EPClassificationModel(X, y, kernel,
                                         mean_function=self.mean_function)
        if self.inference != "vi":
            raise ValueError(f"unknown inference {self.inference!r}; "
                             "expected 'vi' or 'ep'")
        return VGPClassificationModel(X, y, kernel,
                                      mean_function=self.mean_function)

    def fit(self, X, y, **opt_kws):
        super().fit(X, y, **opt_kws)
        self.classes_ = self.estimator_.classes_
        return self

    def predict(self, X):
        """Labels from ``classes_`` for P(class 1) > 0.5.  (The reference
        returns raw booleans — ``classification.py:81`` — which is wrong for
        any label set beyond {0, 1}; fixed per SURVEY.md §7's bug-fix
        license.)"""
        return self.classes_[(super().predict(X) > 0.5).astype(int)]

    def predict_proba(self, X):
        return super().predict(X)


class SparseGaussianProcessClassifier(_BaseGP, ClassifierMixin):
    """Sparse binary GP classifier (native ``SparseGPClassification``
    equivalent; reference ``classification.py:101-183``).

    ``inference="vi"`` (default) is the whitened sparse variational fit;
    ``inference="ep"`` is EP-DTC — the inference GPy itself runs at the
    reference's sparse call site (``classification.py:146-149``), probit
    link only (as in GPy)."""

    def __init__(self, kernels=None, kernel_options=None, likelihood=None,
                 Z=None, num_inducing=10, Y_metadata=None, method="optimize",
                 inference="vi"):
        self.kernels = kernels
        self.kernel_options = kernel_options
        self.likelihood = likelihood
        self.Z = Z
        self.num_inducing = num_inducing
        self.Y_metadata = Y_metadata
        self.method = method
        self.inference = inference

    def _get_model(self, X, y, kernel):
        if kernel is None:
            kernel = RBF(X.shape[1])
        if self.inference == "ep":
            from ..ops.vgp import canonical_likelihood
            if canonical_likelihood(self.likelihood) != "probit":
                raise ValueError("inference='ep' supports the probit "
                                 "(Bernoulli) likelihood only — use "
                                 "inference='vi' for the logit link")
            return SparseEPClassificationModel(
                X, y, kernel, Z=self.Z, num_inducing=self.num_inducing)
        if self.inference != "vi":
            raise ValueError(f"unknown inference {self.inference!r}; "
                             "expected 'vi' or 'ep'")
        return SparseVGPClassificationModel(
            X, y, kernel, Z=self.Z, num_inducing=self.num_inducing,
            likelihood=self.likelihood)

    def fit(self, X, y, **opt_kws):
        super().fit(X, y, **opt_kws)
        self.classes_ = self.estimator_.classes_
        return self

    def predict(self, X):
        """Labels from ``classes_`` (see ``GaussianProcessClassifier.predict``)."""
        return self.classes_[(super().predict(X) > 0.5).astype(int)]

    def predict_proba(self, X):
        return super().predict(X)
