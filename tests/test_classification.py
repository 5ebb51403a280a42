"""GP classification tests: accuracy, probability calibration shape, sparse
variant, EDR-with-classifier integration (G6 capability, SURVEY.md §2.2)."""

import numpy as np
import pytest

from edrgp_tpu.models import (GaussianProcessClassifier,
                              SparseGaussianProcessClassifier)


def _blobs(n=120, seed=0):
    rng = np.random.default_rng(seed)
    X0 = rng.normal(loc=[-1.5, 0], scale=0.7, size=(n // 2, 2))
    X1 = rng.normal(loc=[1.5, 0], scale=0.7, size=(n // 2, 2))
    X = np.vstack([X0, X1])
    y = np.array([0] * (n // 2) + [1] * (n // 2))
    perm = rng.permutation(n)
    return X[perm], y[perm]


def test_classifier_accuracy():
    X, y = _blobs()
    clf = GaussianProcessClassifier()
    clf.fit(X, y)
    acc = (clf.predict(X) == (y == 1)).mean()
    assert acc > 0.9


def test_predict_proba_range_and_threshold():
    X, y = _blobs()
    clf = GaussianProcessClassifier()
    clf.fit(X, y)
    proba = clf.predict_proba(X)
    assert proba.shape == (len(X),)
    assert np.all((proba >= 0) & (proba <= 1))
    # predict thresholds proba at 0.5 (reference classification.py:81),
    # mapped through classes_
    np.testing.assert_array_equal(clf.predict(X),
                                  clf.classes_[(proba > 0.5).astype(int)])
    # probabilities track the labels
    assert proba[y == 1].mean() > 0.7
    assert proba[y == 0].mean() < 0.3


def test_predict_returns_original_labels():
    """Labels outside {0, 1} round-trip through predict (the reference
    returned raw booleans — fixed per SURVEY.md §7's bug-fix license)."""
    X, y01 = _blobs()
    y = np.where(y01 == 1, 7, -3)
    clf = GaussianProcessClassifier()
    clf.fit(X, y)
    pred = clf.predict(X)
    assert set(np.unique(pred)) <= {-3, 7}
    assert (pred == y).mean() > 0.9


def test_sparse_classifier():
    X, y = _blobs(n=150)
    clf = SparseGaussianProcessClassifier(num_inducing=15)
    clf.fit(X, y)
    acc = (clf.predict(X) == (y == 1)).mean()
    assert acc > 0.85


def test_classifier_gradient_shape():
    X, y = _blobs()
    clf = GaussianProcessClassifier()
    clf.fit(X, y)
    g = clf.predict_gradient(X[:10])
    assert g.shape == (10, 2)
    # latent gradient should point along the separating direction (x-axis)
    assert np.abs(g[:, 0]).mean() > np.abs(g[:, 1]).mean()


def test_classifier_rejects_multiclass():
    X = np.random.default_rng(0).normal(size=(30, 2))
    y = np.array([0, 1, 2] * 10)
    with pytest.raises(ValueError):
        GaussianProcessClassifier().fit(X, y)


def test_classifier_save_load(tmp_path):
    X, y = _blobs()
    clf = GaussianProcessClassifier()
    clf.fit(X, y)
    path = str(tmp_path / "cls")
    clf.save(path)
    clf2 = GaussianProcessClassifier()
    clf2.load(path)
    np.testing.assert_allclose(clf2.predict_proba(X), clf.predict_proba(X),
                               rtol=1e-8)
