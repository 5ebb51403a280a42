"""Kernel zoo unit tests: closed-form values, PSD-ness, registry semantics.

Models the reference's kernel contract (``gp_model/base.py:111-147``):
string-name registry, ARD options, sum composition.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from edrgp_tpu.ops import kernels as K


RNG = np.random.default_rng(42)
X1 = jnp.asarray(RNG.normal(size=(7, 3)))
X2 = jnp.asarray(RNG.normal(size=(5, 3)))


def _make(name, **opts):
    kern = K.make_kernel(name, opts or None, 3)
    return kern, kern.init_params()


ALL_KERNELS = ["RBF", "Exponential", "Matern32", "Matern52", "RatQuad",
               "Linear", "Bias", "White", "Cosine", "StdPeriodic", "Poly",
               "MLP"]


@pytest.mark.parametrize("name", ALL_KERNELS)
def test_shapes_and_diag(name):
    kern, params = _make(name)
    Kmat = kern.K(params, X1, X2)
    assert Kmat.shape == (7, 5)
    kd = kern.Kdiag(params, X1)
    assert kd.shape == (7,)
    # Kdiag must equal the diagonal of the full same-set matrix.  Tolerance:
    # the matmul distance trick leaves ~1e-16 residue on the diagonal, which
    # sqrt() amplifies to ~1e-8 for kernels of r (vs r²).
    full = kern.K(params, X1, X1)
    np.testing.assert_allclose(np.diagonal(full), kd, rtol=1e-7, atol=1e-8)


@pytest.mark.parametrize("name", [n for n in ALL_KERNELS if n != "Cosine"])
def test_psd(name):
    kern, params = _make(name)
    Kmat = np.asarray(kern.K(params, X1, X1))
    w = np.linalg.eigvalsh(Kmat + 1e-10 * np.eye(7))
    assert w.min() > -1e-8


def test_rbf_closed_form():
    kern, params = _make("RBF")
    Kmat = np.asarray(kern.K(params, X1, X2))
    d2 = ((np.asarray(X1)[:, None, :] - np.asarray(X2)[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(Kmat, np.exp(-0.5 * d2), rtol=1e-10)


def test_rbf_ard_lengthscales():
    kern = K.RBF(3, ARD=True, lengthscale=[1.0, 2.0, 4.0])
    params = kern.init_params()
    ls = np.asarray(K.positive(params["lengthscale"]))
    np.testing.assert_allclose(ls, [1.0, 2.0, 4.0], rtol=1e-8)
    Kmat = np.asarray(kern.K(params, X1, X2))
    d2 = (((np.asarray(X1)[:, None, :] - np.asarray(X2)[None, :, :]) / ls) ** 2).sum(-1)
    np.testing.assert_allclose(Kmat, np.exp(-0.5 * d2), rtol=1e-9)


def test_linear_closed_form():
    kern, params = _make("Linear")
    Kmat = np.asarray(kern.K(params, X1, X2))
    np.testing.assert_allclose(Kmat, np.asarray(X1) @ np.asarray(X2).T,
                               rtol=1e-10)


def test_sum_composition():
    """String-list + options sum, honoring gp_model/base.py:128-147."""
    kern = K.make_kernel(["RBF", "Linear"], [{"ARD": True}, {}], 3)
    assert isinstance(kern, K.Sum)
    params = kern.init_params()
    total = np.asarray(kern.K(params, X1, X2))
    parts = [np.asarray(k.K(p, X1, X2)) for k, p in zip(kern.kernels, params)]
    np.testing.assert_allclose(total, parts[0] + parts[1], rtol=1e-10)


def test_add_operator():
    a = K.RBF(3)
    b = K.Bias(3)
    s = a + b
    assert isinstance(s, K.Sum) and len(s.kernels) == 2
    s3 = s + K.Linear(3)
    assert len(s3.kernels) == 3


def test_unknown_kernel_raises():
    with pytest.raises(ValueError, match="Unknown kernel"):
        K.make_kernel("Nope", None, 2)


def test_mismatched_options_raises():
    with pytest.raises(ValueError):
        K.make_kernel(["RBF", "Linear"], [{}], 2)


def test_positive_bijector_roundtrip():
    vals = jnp.asarray([1e-4, 0.5, 1.0, 7.3, 100.0])
    np.testing.assert_allclose(np.asarray(K.positive(K.inv_positive(vals))),
                               np.asarray(vals), rtol=1e-6)


def test_white_cross_is_zero():
    kern, params = _make("White")
    cross = np.asarray(kern.K(params, X1, X2))
    assert np.all(cross == 0)
    same = np.asarray(kern.K(params, X1, X1))
    np.testing.assert_allclose(same, np.eye(7), atol=1e-12)


def test_active_dims():
    kern = K.RBF(3, active_dims=[0, 2])
    params = kern.init_params()
    Kmat = np.asarray(kern.K(params, X1, X2))
    sub1, sub2 = np.asarray(X1)[:, [0, 2]], np.asarray(X2)[:, [0, 2]]
    d2 = ((sub1[:, None, :] - sub2[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(Kmat, np.exp(-0.5 * d2), rtol=1e-9)


def test_product_composition():
    a = K.RBF(3)
    b = K.Linear(3)
    prod = a * b
    assert isinstance(prod, K.Product) and len(prod.kernels) == 2
    params = prod.init_params()
    Kp = np.asarray(prod.K(params, X1, X2))
    Ka = np.asarray(a.K(params[0], X1, X2))
    Kb = np.asarray(b.K(params[1], X1, X2))
    np.testing.assert_allclose(Kp, Ka * Kb, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(prod.Kdiag(params, X1)),
                               np.asarray(a.Kdiag(params[0], X1))
                               * np.asarray(b.Kdiag(params[1], X1)),
                               rtol=1e-7)


def test_product_kernel_in_gp():
    """A product kernel fits end-to-end through the estimator layer."""
    from edrgp_tpu.models import GaussianProcessRegressor
    rng = np.random.default_rng(0)
    Xd = rng.normal(size=(60, 2))
    yd = np.sin(Xd[:, 0]) * Xd[:, 1] + 0.05 * rng.normal(size=60)
    gp = GaussianProcessRegressor(kernels=K.RBF(2) * K.Linear(2))
    gp.fit(Xd, yd)
    pred = gp.predict(Xd)
    assert np.sqrt(np.mean((pred - np.sin(Xd[:, 0]) * Xd[:, 1]) ** 2)) < 0.2


def test_white_same_shape_different_set_is_zero():
    """Cross-covariance to a same-SHAPE but different test set must be 0
    (identity check, not shape heuristic)."""
    kern, params = _make("White")
    Xother = jnp.asarray(RNG.normal(size=(7, 3)))  # same shape as X1
    cross = np.asarray(kern.K(params, X1, Xother))
    assert np.all(cross == 0)
