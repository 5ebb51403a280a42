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


def test_sparse_classifier_logit_likelihood():
    """The reference's sparse classifier exposes a custom ``likelihood``
    ctor param (classification.py:140); 'bernoulli_logit' swaps the probit
    link for logistic and must still solve the blobs."""
    X, y = _blobs(n=150, seed=2)
    clf = SparseGaussianProcessClassifier(num_inducing=20,
                                          likelihood="bernoulli_logit")
    clf.fit(X, y)
    acc = (clf.predict(X) == y).mean()
    assert acc > 0.85
    proba = clf.predict_proba(X)
    assert np.all((proba >= 0) & (proba <= 1))
    # the two links agree on easy, well-separated data
    ref = SparseGaussianProcessClassifier(num_inducing=20)
    ref.fit(X, y)
    agree = (clf.predict(X) == ref.predict(X)).mean()
    assert agree > 0.95


def test_sparse_classifier_unknown_likelihood():
    X, y = _blobs(n=40)
    with pytest.raises(ValueError, match="unknown likelihood"):
        SparseGaussianProcessClassifier(likelihood="poisson").fit(X, y)


def test_sparse_classifier_logit_save_load(tmp_path):
    X, y = _blobs(n=100, seed=3)
    clf = SparseGaussianProcessClassifier(num_inducing=12,
                                          likelihood="logit")
    clf.fit(X, y)
    path = str(tmp_path / "slogit")
    clf.save(path)
    clf2 = SparseGaussianProcessClassifier()
    clf2.load(path)
    assert clf2.estimator_._lik == "logit"
    np.testing.assert_allclose(clf2.predict_proba(X), clf.predict_proba(X),
                               rtol=1e-8)


def test_sparse_vi_matches_full_ep():
    """EP-DTC accounting (VERDICT Missing #4): GPy's sparse classifier runs
    EP-DTC; ours runs whitened VI.  On well-specified data the two
    inferences agree — the sparse VI posterior probability tracks the full
    EP classifier's within a tight band across the input region."""
    from edrgp_tpu.models.cls_state import (EPClassificationModel,
                                            SparseVGPClassificationModel)
    from edrgp_tpu.ops.kernels import RBF

    X, y = _blobs(n=120, seed=4)
    ysign = np.where(y == 1, 1.0, -1.0)
    ep = EPClassificationModel(X, ysign, RBF(2))
    ep.optimize(max_iters=200)
    vi = SparseVGPClassificationModel(X, ysign, RBF(2), num_inducing=40,
                                      seed=1)
    vi.optimize(max_iters=400)
    grid = np.stack(np.meshgrid(np.linspace(-3, 3, 12),
                                np.linspace(-2, 2, 9)), -1).reshape(-1, 2)
    p_ep = np.asarray(ep.predict(grid)[0])[:, 0]
    p_vi = np.asarray(vi.predict(grid)[0])[:, 0]
    assert np.max(np.abs(p_ep - p_vi)) < 0.1
    assert np.mean(np.abs(p_ep - p_vi)) < 0.03


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
