"""Fully Bayesian GP estimator tests (NUTS-marginalized hyperparameters)."""

import numpy as np
import pytest

from edrgp_tpu import EffectiveDimensionalityReduction, SVDTransformer
from edrgp_tpu.models import BayesianGaussianProcessRegressor


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(70, 2))
    y = np.tanh(X[:, 0]) + 0.1 * rng.normal(size=70)
    bgp = BayesianGaussianProcessRegressor(
        kernels=["RBF"], kernel_options=[{"ARD": True}],
        num_chains=4, num_warmup=200, num_samples=200)
    bgp.fit(X, y)
    return bgp, X, y


def test_chains_mix(fitted):
    bgp, _, _ = fitted
    diag = bgp.estimator_.diagnostics_
    assert diag["rhat"].max() < 1.1
    assert diag["divergences"] < 20


def test_posterior_prediction(fitted):
    bgp, X, y = fitted
    pred = bgp.predict(X)
    assert np.sqrt(np.mean((pred - np.tanh(X[:, 0])) ** 2)) < 0.1
    var = bgp.predict_variance(X)
    assert np.all(var > 0)
    # noise posterior should bracket the truth loosely
    assert 0.003 < bgp.estimator_.noise_variance < 0.1


def test_posterior_gradients_shape_and_direction(fitted):
    bgp, X, _ = fitted
    g = bgp.predict_gradient(X[:20])
    assert g.shape == (20, 2)
    # target depends only on dim 0
    assert np.abs(g[:, 0]).mean() > 5 * np.abs(g[:, 1]).mean()


def test_bayesian_save_load_roundtrip(fitted, tmp_path):
    bgp, X, _ = fitted
    path = str(tmp_path / "bayes")
    bgp.save(path)
    bgp2 = BayesianGaussianProcessRegressor().load(path)
    np.testing.assert_allclose(bgp2.predict(X), bgp.predict(X), rtol=1e-6)
    np.testing.assert_allclose(bgp2.predict_gradient(X[:10]),
                               bgp.predict_gradient(X[:10]), rtol=1e-6)
    np.testing.assert_allclose(bgp2.estimator_.log_likelihood(),
                               bgp.estimator_.log_likelihood(), rtol=1e-8)


def test_bayesian_edr():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(70, 2))
    y = np.tanh(X[:, 0]) + 0.1 * rng.normal(size=70)
    edr = EffectiveDimensionalityReduction(
        BayesianGaussianProcessRegressor(
            kernels=["RBF"], kernel_options=[{"ARD": True}],
            num_chains=2, num_warmup=150, num_samples=150),
        SVDTransformer(), n_components=1)
    edr.fit(X, y)
    c = edr.components_[0]
    c = c / np.linalg.norm(c)
    assert abs(abs(c[0]) - 1.0) < 0.05
