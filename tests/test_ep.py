"""Expectation Propagation engine tests (GPy-parity inference for G6).

EP's accuracy claims are checked hard: the EP log-evidence is compared
against the *exact* marginal likelihood computed as a multivariate-normal
orthant probability (for the probit likelihood,
Z = ∫N(f;0,K)∏Φ(yᵢfᵢ)df = P(g > 0), g ~ N(0, D_y K D_y + I), evaluated
with scipy's Genz algorithm), and the ML-II gradient (the stop-gradient
fixed-point construction, GPML eq. 5.27) is checked against central finite
differences of the re-converged energy.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import multivariate_normal

from edrgp_tpu.models import GaussianProcessClassifier
from edrgp_tpu.models.cls_state import EPClassificationModel
from edrgp_tpu.ops import ep as _ep
from edrgp_tpu.ops.kernels import RBF


def _small_problem(n=7, q=2, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, q))
    kernel = RBF(q)
    params = {"kernel": kernel.init_params(jnp.float64)}
    f = rng.normal(size=n)
    y = np.where(f + 0.3 * rng.normal(size=n) > 0, 1.0, -1.0)
    return kernel, params, jnp.asarray(X), jnp.asarray(y)


def _exact_log_marginal(K, y_sign):
    """log ∫ N(f;0,K) ∏ Φ(yᵢ fᵢ) df as an orthant probability."""
    Dy = np.diag(np.asarray(y_sign))
    C = Dy @ np.asarray(K) @ Dy + np.eye(K.shape[0])
    p = multivariate_normal(mean=np.zeros(K.shape[0]), cov=C,
                            allow_singular=True).cdf(np.zeros(K.shape[0]))
    return float(np.log(p))


def test_ep_logz_matches_exact_orthant():
    kernel, params, X, y = _small_problem()
    K = kernel.K(params["kernel"], X, X)
    state = _ep.ep_fit(kernel, params, X, y)
    assert float(state.delta) < 1e-8          # converged, not just maxed out
    logz_ep = float(_ep.ep_energy(kernel, params, X, y, state.nu, state.tau))
    logz_true = _exact_log_marginal(K, y)
    # EP is near-exact for probit (Kuss & Rasmussen 2005)
    assert abs(logz_ep - logz_true) < 2e-2


def test_ep_sites_nonnegative_and_converged():
    kernel, params, X, y = _small_problem(n=25)
    state = _ep.ep_fit(kernel, params, X, y)
    assert np.all(np.asarray(state.tau) >= 0)
    assert float(state.delta) < 1e-8
    assert int(state.iters) < 100


def test_ep_energy_gradient_matches_finite_differences():
    kernel, params, X, y = _small_problem(n=12)
    obj = _ep.ep_neg_energy_objective(kernel)

    flat, unravel = jax.flatten_util.ravel_pytree(params)
    f = lambda v: float(obj(unravel(v), X, y))
    g = np.asarray(jax.grad(lambda v: obj(unravel(v), X, y))(flat))

    h = 1e-5
    fd = np.zeros_like(np.asarray(flat))
    for i in range(flat.size):
        e = np.zeros(flat.size)
        e[i] = h
        fd[i] = (f(flat + e) - f(flat - e)) / (2 * h)
    np.testing.assert_allclose(g, fd, rtol=2e-4, atol=1e-7)


def test_ep_prediction_matches_vi():
    rng = np.random.default_rng(0)
    n = 80
    X = rng.normal(size=(n, 2))
    y = (X[:, 0] + 0.3 * rng.normal(size=n) > 0).astype(int)
    vi = GaussianProcessClassifier().fit(X, y)
    ep = GaussianProcessClassifier(inference="ep").fit(X, y)
    p_vi = vi.predict_proba(X)
    p_ep = ep.predict_proba(X)
    # Same model, two approximations famously close for probit
    assert np.max(np.abs(p_vi - p_ep)) < 0.1
    assert np.mean(np.abs(p_vi - p_ep)) < 0.03
    # labels carry 0.3σ flip noise; Bayes accuracy on this draw is ~0.9
    assert (ep.predict(X) == (y == 1)).mean() >= 0.85


def test_ep_classifier_sklearn_surface(tmp_path):
    rng = np.random.default_rng(1)
    n = 60
    X = rng.normal(size=(n, 2))
    y = (X[:, 0] > 0).astype(int)
    clf = GaussianProcessClassifier(inference="ep").fit(X, y)
    proba = clf.predict_proba(X)
    assert proba.shape == (n,)
    assert np.all((proba >= 0) & (proba <= 1))
    np.testing.assert_array_equal(clf.predict(X), proba > 0.5)
    ll = clf.estimator_.log_likelihood()
    assert np.isfinite(ll)
    # ML-II improved the evidence vs the untrained kernel
    fresh = EPClassificationModel(X, y, RBF(2))
    assert ll >= fresh.log_likelihood() - 1e-6
    # persistence round-trip through the GPy-style pickle surface
    path = str(tmp_path / "ep_cls")
    clf.save(path)
    clf2 = GaussianProcessClassifier(inference="ep")
    clf2.load(path)
    np.testing.assert_allclose(clf2.predict_proba(X), proba, rtol=1e-8)


def test_ep_gradients_point_along_separating_direction():
    rng = np.random.default_rng(2)
    n = 70
    X = rng.normal(size=(n, 2))
    y = (X[:, 0] > 0).astype(int)
    clf = GaussianProcessClassifier(inference="ep").fit(X, y)
    g = clf.predict_gradient(X[:20])
    assert g.shape == (20, 2)
    assert np.abs(g[:, 0]).mean() > 3 * np.abs(g[:, 1]).mean()


def test_ep_rejects_unknown_inference():
    X = np.random.default_rng(0).normal(size=(20, 2))
    y = (X[:, 0] > 0).astype(int)
    with pytest.raises(ValueError):
        GaussianProcessClassifier(inference="laplace").fit(X, y)
