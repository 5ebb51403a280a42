"""Uncertain-input (X_variance) sparse GP regression.

Covers the reference's ``X_variance`` ctor plumbing
(``/root/reference/edrgp/gp_model/regression.py:153-157``): psi-statistic
closed forms against Monte Carlo, exact reduction to the certain-input
Titsias bound at X_variance -> 0, the estimator surface, and persistence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edrgp_tpu.models.regression import SparseGaussianProcessRegressor
from edrgp_tpu.models.state import SGPRModel, load_model
from edrgp_tpu.ops import sgpr, uncertain
from edrgp_tpu.ops.kernels import RBF, Matern32


def _random_problem(n=40, q=3, m=7, seed=0, ard=True):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, q))
    y = np.sin(X @ rng.normal(size=q)) + 0.1 * rng.normal(size=n)
    Z = rng.normal(size=(m, q))
    S = 0.05 + 0.1 * rng.random(size=(n, q))
    kernel = RBF(q, ARD=ard)
    params = {
        "kernel": kernel.init_params(jnp.float64),
        "raw_noise": jnp.asarray(-1.0),
        "Z": jnp.asarray(Z),
    }
    # non-trivial lengthscales/variance so the test isn't at the default point
    params["kernel"]["lengthscale"] = jnp.asarray(
        np.log(np.expm1(0.7 + 0.4 * rng.random(q if ard else 1).squeeze())))
    return kernel, params, jnp.asarray(X), jnp.asarray(y), jnp.asarray(S)


def test_psi_statistics_match_monte_carlo():
    kernel, params, X, _, S = _random_problem(n=5, q=2, m=4, seed=3)
    kp = params["kernel"]
    Z = params["Z"]
    psi0, Psi1, Psi2 = uncertain.psi_statistics(kernel, kp, X, S, Z)

    key = jax.random.PRNGKey(0)
    samples = (X[None] + jnp.sqrt(S)[None] *
               jax.random.normal(key, (200_000,) + X.shape))  # [T, N, Q]

    def kzs(x):  # k(x_n, Z) for one draw of all n: [N, M]
        return kernel.K(kp, x, Z)

    Kts = jax.vmap(kzs)(samples)                              # [T, N, M]
    mc_psi1 = Kts.mean(axis=0)
    mc_psi2 = jnp.einsum("tnm,tnk->mk", Kts, Kts) / Kts.shape[0]
    np.testing.assert_allclose(np.asarray(Psi1), np.asarray(mc_psi1),
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(Psi2), np.asarray(mc_psi2),
                               rtol=0, atol=2e-2)
    np.testing.assert_allclose(float(psi0),
                               float(jax.vmap(lambda x: kernel.Kdiag(kp, x))
                                     (samples).mean(0).sum()), rtol=1e-12)


def test_zero_variance_reduces_to_certain_sgpr():
    kernel, params, X, y, _ = _random_problem(seed=1)
    S0 = jnp.zeros_like(X)
    b_unc = float(uncertain.elbo(kernel, params, X, y, S0))
    b_cert = float(sgpr.elbo(kernel, params, X, y))
    np.testing.assert_allclose(b_unc, b_cert, rtol=1e-10)

    # posterior caches agree too -> identical predictions
    post_u = uncertain.posterior(kernel, params, X, y, S0)
    post_c = sgpr.sgpr_posterior(kernel, params, X, y)
    for a, b in zip(post_u, post_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)


def test_input_noise_lowers_bound():
    kernel, params, X, y, S = _random_problem(seed=2)
    b0 = float(uncertain.elbo(kernel, params, X, y, jnp.zeros_like(X)))
    b1 = float(uncertain.elbo(kernel, params, X, y, S))
    assert np.isfinite(b1)
    assert b1 < b0  # blurring informative inputs cannot tighten the bound


def test_uncertain_elbo_differentiable():
    kernel, params, X, y, S = _random_problem(seed=4)
    g = jax.grad(lambda p: -uncertain.elbo(kernel, p, X, y, S))(params)
    norms = [float(jnp.linalg.norm(l)) for l in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(norms) > 0


def test_estimator_fit_predict_gradient():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(80, 2))
    y = np.tanh(X @ np.array([1.0, -0.5])) + 0.05 * rng.normal(size=80)
    gp = SparseGaussianProcessRegressor(num_inducing=15,
                                        X_variance=0.01 * np.ones_like(X))
    gp.fit(X, y, max_iters=150)
    pred = gp.predict(X)
    assert pred.shape == (80,)
    assert np.corrcoef(pred, y)[0, 1] > 0.9
    var = gp.predict_variance(X)
    assert var.shape == (80, 1) and (var > 0).all()
    grad = gp.predict_gradient(X)
    assert grad.shape == (80, 2)
    ll = gp.estimator_.log_likelihood()[0][0]
    assert np.isfinite(ll)


def test_scalar_x_variance_broadcasts():
    rng = np.random.default_rng(5)
    X = rng.normal(size=(30, 2))
    y = X[:, 0] ** 2
    m = SGPRModel(X, y, RBF(2), num_inducing=8, X_variance=0.02)
    assert m._Xvar.shape == (30, 2)
    assert np.isfinite(m.log_likelihood()[0][0])


def test_non_rbf_kernel_rejected():
    rng = np.random.default_rng(6)
    X = rng.normal(size=(20, 2))
    y = X[:, 0]
    with pytest.raises(NotImplementedError, match="RBF"):
        SGPRModel(X, y, Matern32(2), num_inducing=5,
                  X_variance=0.01 * np.ones_like(X))


def test_uncertain_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(50, 2))
    y = np.sin(X[:, 0]) + 0.1 * rng.normal(size=50)
    m = SGPRModel(X, y, RBF(2, ARD=True), num_inducing=10,
                  X_variance=0.05 * np.ones_like(X))
    m.optimize(max_iters=60)
    path = str(tmp_path / "unc.pickle")
    m.pickle(path)
    m2 = load_model(path)
    assert m2._Xvar is not None
    np.testing.assert_allclose(np.asarray(m2._Xvar), np.asarray(m._Xvar))
    p1 = np.asarray(m.predict(X[:7])[0])
    p2 = np.asarray(m2.predict(X[:7])[0])
    np.testing.assert_allclose(p1, p2, rtol=1e-10)
    np.testing.assert_allclose(m2.log_likelihood()[0][0],
                               m.log_likelihood()[0][0], rtol=1e-10)
    # a loaded model can continue optimizing under the uncertain objective
    m2.optimize(max_iters=5)
