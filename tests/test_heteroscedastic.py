"""Heteroscedastic GP tests: per-point noise recovery, prediction,
EDR compatibility (capability the reference ships commented out)."""

import numpy as np

from edrgp_tpu.models.heteroscedastic import (
    GaussianProcessHeteroscedasticRegressor)


def _data(n=120, seed=0):
    """Noise grows with x: σ(x) = 0.05 + 0.3·|x|/3."""
    rng = np.random.default_rng(seed)
    X = np.linspace(-3, 3, n)[:, None]
    sig = 0.05 + 0.3 * np.abs(X[:, 0]) / 3
    y = np.sin(X[:, 0]) + sig * rng.normal(size=n)
    return X, y, sig


def test_fit_and_predict():
    X, y, _ = _data()
    gp = GaussianProcessHeteroscedasticRegressor()
    gp.fit(X, y)
    pred = gp.predict(X)
    assert np.sqrt(np.mean((pred - np.sin(X[:, 0])) ** 2)) < 0.15
    var = gp.predict_variance(X)
    assert np.all(var > 0)


def test_noise_profile_recovered():
    """Learned per-point noise should be larger where the data is noisier
    (compare region averages, not points — per-point ML-II is noisy)."""
    X, y, sig = _data(n=200)
    gp = GaussianProcessHeteroscedasticRegressor()
    gp.fit(X, y)
    nv = gp.estimator_.noise_variances_
    assert nv.shape == (200,)
    inner = np.abs(X[:, 0]) < 1.0
    outer = np.abs(X[:, 0]) > 2.0
    assert nv[outer].mean() > 1.5 * nv[inner].mean()


def test_gradient_contract():
    X, y, _ = _data()
    gp = GaussianProcessHeteroscedasticRegressor()
    gp.fit(X, y)
    g = gp.predict_gradient(X[:10])
    assert g.shape == (10, 1)
    eps = 1e-5
    fd = (gp.predict(X[:10] + eps) - gp.predict(X[:10] - eps)) / (2 * eps)
    np.testing.assert_allclose(g[:, 0], fd, rtol=1e-4, atol=1e-6)


def test_in_edr():
    from edrgp_tpu import EffectiveDimensionalityReduction, SVDTransformer
    rng = np.random.default_rng(1)
    X = rng.normal(size=(150, 2))
    y = np.tanh(X[:, 0]) + 0.1 * rng.normal(size=150)
    edr = EffectiveDimensionalityReduction(
        GaussianProcessHeteroscedasticRegressor(), SVDTransformer(),
        n_components=1)
    edr.fit(X, y)
    c = edr.components_[0]
    c = c / np.linalg.norm(c)
    assert abs(abs(c[0]) - 1.0) < 0.1
