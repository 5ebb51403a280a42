"""sklearn-style estimator facade over the native TPU GP engine.

API-parity rewrite of ``/root/reference/edrgp/gp_model/base.py`` (``_BaseGP``):
``fit(X, y, **opt_kws)`` builds a kernel from string names + options, creates
the model via the abstract ``_get_model``, and invokes
``getattr(model, self.method)(**opt_kws)`` with the same defaults
(``messages=False, max_iters=1000`` — reference lines 67-69); ``predict`` /
``predict_variance`` / ``predict_gradient`` / ``save`` / ``load`` match the
shapes read at reference lines 187, 206, 222, 239, 257.
"""

from __future__ import annotations

from abc import ABCMeta, abstractmethod

import numpy as np
from sklearn.base import BaseEstimator, is_classifier
from sklearn.utils import assert_all_finite, check_array, check_X_y
from sklearn.utils.multiclass import check_classification_targets
from sklearn.utils.validation import check_is_fitted

from ..ops.kernels import Kernel, make_kernel
from .state import load_model

__all__ = ["_BaseGP"]


class _BaseGP(BaseEstimator, metaclass=ABCMeta):
    """Base class for all GP estimators in the TPU EDR-GP stack.

    Parameters (stored verbatim for sklearn ``clone``-ability, matching the
    reference's L3→L2 contract in SURVEY.md §1):

    kernels : str, list of str, or Kernel, optional — registry names
        (default "RBF").
    kernel_options : dict or list of dict, optional — per-kernel options,
        e.g. ``{"ARD": True}``.
    method : {'optimize', 'optimize_restarts'} — fit method on the model.
    """

    def fit(self, X, y, **opt_kws):
        X, y = self._check_data(X, y)
        self.n_features_ = X.shape[1]
        kernel = self._make_kernel()
        self.estimator_ = self._get_model(X, y, kernel)
        opt_kws.setdefault("messages", False)
        opt_kws.setdefault("max_iters", 1000)
        getattr(self.estimator_, self.method)(**opt_kws)
        return self

    def _check_data(self, X, y):
        X, y = check_X_y(X, y, accept_sparse=False)
        if is_classifier(self):
            check_classification_targets(y)
        y = y[:, np.newaxis]
        return X, y

    def _check_input(self, X):
        X = check_array(X, accept_sparse=False)
        if X.shape[1] != self.n_features_:
            raise ValueError("X has {} features per sample; expecting {}"
                             .format(X.shape[1], self.n_features_))
        return X

    def _make_kernel(self) -> Kernel | None:
        # None → model default (RBF), Kernel object → passthrough,
        # str/list → registry (reference lines 111-147).
        if self.kernels is None:
            return None
        return make_kernel(self.kernels, self.kernel_options, self.n_features_)

    @abstractmethod
    def _get_model(self, X, y, kernel):
        ...

    def _check_predict(self, X):
        X = self._check_input(X)
        check_is_fitted(self, "estimator_")
        return X

    def predict(self, X):
        X = self._check_predict(X)
        y_pred = self.estimator_.predict(X)[0][:, 0]
        assert_all_finite(y_pred)
        return y_pred

    def predict_variance(self, X):
        X = self._check_predict(X)
        return self.estimator_.predict(X)[1]

    def predict_gradient(self, X):
        X = self._check_predict(X)
        return self.estimator_.predictive_gradients(X)[0][:, :, 0]

    def supports_sharded_gradients(self) -> bool:
        """True when the fitted model can run the data-parallel gradient
        extraction (:mod:`edrgp_tpu.parallel.edr_sharded`)."""
        from ..parallel.edr_sharded import supports_sharded_gradients
        return (hasattr(self, "estimator_")
                and supports_sharded_gradients(self.estimator_))

    def predict_gradient_sharded(self, X, mesh, axis="data", chunk=None):
        """Predictive gradients with rows sharded over ``mesh`` PLUS the
        psum-accumulated Gram: ``(grad [N, Q], gram [Q, Q])`` with
        ``gram == grad.T @ grad`` — the multi-chip EDR extraction path."""
        X = self._check_predict(X)
        from ..parallel.edr_sharded import model_gradient_gram
        return model_gradient_gram(self.estimator_, X, mesh, axis=axis,
                                   chunk=chunk)

    def save(self, model_path):
        if not model_path.endswith(".pickle"):
            model_path += ".pickle"
        self.estimator_.pickle(model_path)

    def load(self, model_path):
        """Load a fitted model saved with :meth:`save` and return ``self``
        (the reference's ``load`` at ``gp_model/base.py:242-256`` returns
        None; returning the estimator makes
        ``GaussianProcessRegressor().load(path)`` chainable)."""
        if not model_path.endswith(".pickle"):
            model_path += ".pickle"
        self.estimator_ = load_model(model_path)
        self.n_features_ = int(np.asarray(self.estimator_._X).shape[1])
        if hasattr(self.estimator_, "classes_"):
            self.classes_ = self.estimator_.classes_
        return self
