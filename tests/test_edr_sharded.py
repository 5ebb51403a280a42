"""Sharded EDR composition ≡ single device (VERDICT r4 next #1).

Data-parallel gradient extraction + distributed Gram on the 8-device CPU
mesh must reproduce the single-device path: raw gradients to float
tolerance, the psum'd Gram == GᵀG, and the COMPOSED
``EffectiveDimensionalityReduction`` loop (fit → sharded gradients →
Gram-fed transformer → projector) the same subspace as the mesh-free fit.
"""

import jax
import numpy as np
import pytest

from edrgp_tpu import EffectiveDimensionalityReduction, SVDTransformer
from edrgp_tpu.datasets import get_beta_inputs, get_edr_target
from edrgp_tpu.models import (GaussianProcessRegressor,
                              SparseGaussianProcessRegressor)
from edrgp_tpu.parallel.edr_sharded import (model_gradient_gram,
                                            supports_sharded_gradients)
from edrgp_tpu.parallel.mesh import make_mesh
from edrgp_tpu.utils import discrepancy


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(("data",), devices=jax.devices()[:8])


def _problem(n=120, q=6, d=2, seed=0):
    rng = np.random.default_rng(seed)
    X = get_beta_inputs(n, q, rng=rng)
    B = np.linalg.qr(rng.normal(size=(q, d)))[0]
    y = get_edr_target(X @ B, sigma=0.05, rng=rng)
    return X, y, B


def _align_signs(A, ref):
    """Flip rows of A to match ref's sign convention (SVD/eigh ambiguity)."""
    signs = np.sign(np.sum(A * ref, axis=1))
    signs[signs == 0] = 1.0
    return A * signs[:, None]


def test_exact_model_gradient_gram_matches_single_device(mesh):
    X, y, _ = _problem()
    gp = GaussianProcessRegressor(["RBF"], [{"ARD": True}])
    gp.fit(X, y, max_iters=150)
    G1 = gp.predict_gradient(X)
    assert gp.supports_sharded_gradients()
    G8, gram = gp.predict_gradient_sharded(X, mesh)
    np.testing.assert_allclose(G8, G1, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(gram, G8.T @ G8, rtol=1e-9, atol=1e-9)


def test_ragged_rows_padded_and_masked(mesh):
    # 101 rows is not divisible by 8: pad rows must not leak into the Gram
    X, y, _ = _problem(n=101, q=4)
    gp = GaussianProcessRegressor(["RBF"], [{"ARD": True}])
    gp.fit(X, y, max_iters=100)
    G1 = gp.predict_gradient(X)
    G8, gram = gp.predict_gradient_sharded(X, mesh)
    assert G8.shape == G1.shape
    np.testing.assert_allclose(G8, G1, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(gram, G1.T @ G1, rtol=1e-9, atol=1e-9)


def test_sparse_model_gradient_gram(mesh):
    X, y, _ = _problem(n=96, q=4)
    gp = SparseGaussianProcessRegressor(["RBF"], [{"ARD": True}],
                                        num_inducing=16)
    gp.fit(X, y, max_iters=100)
    G1 = gp.predict_gradient(X)
    G8, gram = gp.predict_gradient_sharded(X, mesh)
    np.testing.assert_allclose(G8, G1, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(gram, G1.T @ G1, rtol=1e-8, atol=1e-8)


def test_svgp_model_gradient_basis(mesh):
    from edrgp_tpu.models.svgp import SVGPModel
    from edrgp_tpu.ops.kernels import RBF

    X, y, _ = _problem(n=128, q=4)
    model = SVGPModel(X, y, RBF(4, ARD=True), num_inducing=16)
    model.optimize(max_iters=100, batch_size=64)
    assert supports_sharded_gradients(model)
    G1 = model.predictive_gradients(X)[0][:, :, 0]
    G8, gram = model_gradient_gram(model, X, mesh)
    np.testing.assert_allclose(G8, G1, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(gram, G1.T @ G1, rtol=1e-8, atol=1e-8)


def test_mean_function_model_refuses_sharded():
    X, y, _ = _problem(n=64, q=3)
    gp = GaussianProcessRegressor(["RBF"], [{"ARD": True}],
                                  mean_function=lambda X: X[:, 0])
    gp.fit(X, y, max_iters=50)
    assert not gp.supports_sharded_gradients()
    with pytest.raises(TypeError):
        model_gradient_gram(gp.estimator_, X,
                            make_mesh(("data",), devices=jax.devices()[:8]))


def test_fit_gram_matches_fit_subspace():
    rng = np.random.default_rng(3)
    G = rng.normal(size=(200, 7)) * np.array([5, 3, 2, 1, .5, .2, .1])
    a = SVDTransformer(n_components=3).fit(G)
    b = SVDTransformer(n_components=3).fit_gram(G.T @ G, n_rows=200)
    np.testing.assert_allclose(
        _align_signs(b.components_, a.components_), a.components_,
        rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(b.subspace_variance_, a.subspace_variance_,
                               rtol=1e-9)
    np.testing.assert_allclose(b.subspace_variance_ratio_,
                               a.subspace_variance_ratio_, rtol=1e-9)
    # float n_components agrees too
    a2 = SVDTransformer(n_components=0.9).fit(G)
    b2 = SVDTransformer(n_components=0.9).fit_gram(G.T @ G)
    assert a2.components_.shape == b2.components_.shape


def test_composed_edr_loop_sharded_equals_single(mesh):
    """The full user-facing composition — fit → sharded gradient
    extraction → psum'd Gram → eigh projector → reduced-space refit —
    must land the same subspace as the mesh-free fit."""
    X, y, B = _problem(n=150, q=6, d=2, seed=4)

    def make():
        return EffectiveDimensionalityReduction(
            GaussianProcessRegressor(["RBF"], [{"ARD": True}]),
            SVDTransformer(), n_components=2)

    edr1 = make().fit(X, y, max_iters=200)
    edr8 = make()
    edr8.gradient_mesh = mesh
    edr8.fit(X, y, max_iters=200)

    # identical fits up to eigh/SVD sign convention
    c1, c8 = edr1.components_, edr8.components_
    np.testing.assert_allclose(_align_signs(c8, c1), c1, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(edr8.subspace_variance_ratio_,
                               edr1.subspace_variance_ratio_,
                               rtol=1e-6, atol=1e-9)
    assert discrepancy(c1.T, c8.T) < 1e-8
    # both recover the planted subspace (sanity, not the equality claim)
    assert discrepancy(B, np.linalg.qr(c8.T)[0]) < 0.35
    # the Gram path actually ran (the transformer was fed the psum result)
    assert getattr(edr8, "_pending_gram_", None) is not None
    # projections agree up to each component's sign
    np.testing.assert_allclose(np.abs(edr8.transform(X)),
                               np.abs(edr1.transform(X)), atol=1e-6)


def test_composed_edr_with_preprocessor_sharded(mesh):
    from sklearn.decomposition import PCA

    X, y, _ = _problem(n=120, q=5, d=2, seed=6)

    def make():
        return EffectiveDimensionalityReduction(
            GaussianProcessRegressor(["RBF"], [{"ARD": True}]),
            SVDTransformer(), n_components=2, preprocessor=PCA(n_components=4))

    edr1 = make().fit(X, y, max_iters=150)
    edr8 = make()
    edr8.gradient_mesh = mesh
    edr8.fit(X, y, max_iters=150)
    c1 = edr1.components_
    np.testing.assert_allclose(_align_signs(edr8.components_, c1), c1,
                               rtol=1e-6, atol=1e-8)
