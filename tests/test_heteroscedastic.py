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


def test_y_metadata_groups_tie_noise():
    """Y_metadata output_index (GPy contract, ref regression.py:47-56):
    observations sharing an index share one learnable noise variance, and
    the fitted group noises reflect the generating noise levels."""
    rng = np.random.default_rng(3)
    n = 200
    X = np.linspace(-3, 3, n)[:, None]
    idx = (np.arange(n) % 2)          # interleaved groups 0 / 1
    sig = np.where(idx == 0, 0.05, 0.5)
    y = np.sin(X[:, 0]) + sig * rng.normal(size=n)
    gp = GaussianProcessHeteroscedasticRegressor(
        Y_metadata={"output_index": idx})
    gp.fit(X, y)
    m = gp.estimator_
    # one parameter per group, expanded per point
    assert m.group_noise_variances_.shape == (2,)
    nv = m.noise_variances_
    assert nv.shape == (n,)
    assert np.allclose(nv[idx == 0], nv[idx == 0][0])
    assert np.allclose(nv[idx == 1], nv[idx == 1][0])
    # quiet group ≈ 0.05² ≪ loud group ≈ 0.5²; require the right ordering
    # with margin and rough magnitude agreement
    g0, g1 = m.group_noise_variances_
    assert g1 > 10 * g0
    assert 0.1 ** 2 < g1 < 1.0 ** 2


def test_y_metadata_save_load_roundtrip(tmp_path):
    from edrgp_tpu.models.state import load_model
    rng = np.random.default_rng(4)
    n = 80
    X = np.linspace(-2, 2, n)[:, None]
    idx = np.repeat([7, 3], n // 2)   # non-contiguous group labels
    y = np.sin(X[:, 0]) + 0.1 * rng.normal(size=n)
    gp = GaussianProcessHeteroscedasticRegressor(
        Y_metadata={"output_index": idx})
    gp.fit(X, y, max_iters=60)
    path = str(tmp_path / "het.pickle")
    gp.estimator_.pickle(path)
    m2 = load_model(path)
    np.testing.assert_allclose(m2.noise_variances_,
                               gp.estimator_.noise_variances_)
    np.testing.assert_allclose(np.asarray(m2.predict(X)[0]),
                               np.asarray(gp.estimator_.predict(X)[0]))
    assert list(m2.groups_) == [3, 7]


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
