"""Kernel-block-parallel exact GP: sharded NLML ≡ single-device NLML.

Covers the SURVEY.md §2.3 "Kernel-block parallel (≈TP)" axis: the N×N
kernel matrix, its Cholesky factorization, the triangular solves, and the
trace-form gradient are all computed with the matrix sharded by row slabs
over an 8-device mesh, and must agree with the single-device
:func:`edrgp_tpu.ops.exact.nlml` to float64 round-off.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edrgp_tpu.ops import exact as _exact
from edrgp_tpu.ops.kernels import RBF, Matern52, inv_positive
from edrgp_tpu.parallel.exact_sharded import sharded_nlml_value_and_grad
from edrgp_tpu.parallel.mesh import make_mesh


def _problem(N, Q, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.normal(size=(N, Q)), dtype)
    y = jnp.asarray(np.sin(rng.normal(size=N)), dtype)
    return X, y


def _flat(tree):
    return np.concatenate([np.ravel(np.asarray(l))
                           for l in jax.tree_util.tree_leaves(tree)])


@pytest.mark.parametrize("N,kernel_cls", [(1024, RBF), (4096, RBF),
                                          (512, Matern52)])
def test_sharded_matches_single_device(N, kernel_cls):
    Q = 4
    kernel = kernel_cls(Q, ARD=True) if kernel_cls is RBF else kernel_cls(Q)
    X, y = _problem(N, Q)
    params = {"kernel": kernel.init_params(jnp.float64),
              "raw_noise": inv_positive(jnp.asarray(0.1, jnp.float64))}

    mesh = make_mesh(("data",), devices=jax.devices()[:8])
    val_s, grad_s = sharded_nlml_value_and_grad(kernel, mesh, params, X, y)

    vg = jax.value_and_grad(lambda p: _exact.nlml(kernel, p, X, y))
    val_1, grad_1 = vg(params)

    np.testing.assert_allclose(float(val_s), float(val_1), rtol=1e-10)
    np.testing.assert_allclose(_flat(grad_s), _flat(grad_1),
                               rtol=1e-7, atol=1e-9)


def test_sharded_rejects_indivisible_n():
    kernel = RBF(2)
    X, y = _problem(100, 2)
    params = {"kernel": kernel.init_params(jnp.float64),
              "raw_noise": inv_positive(jnp.asarray(0.1, jnp.float64))}
    mesh = make_mesh(("data",), devices=jax.devices()[:8])
    with pytest.raises(ValueError, match="divisible"):
        sharded_nlml_value_and_grad(kernel, mesh, params, X, y)


def test_sharded_gradient_drives_descent():
    """One gradient step from the sharded grad must reduce the sharded and
    the single-device NLML identically (sanity that the psum'd pytree is a
    usable optimizer input)."""
    kernel = RBF(3, ARD=True)
    X, y = _problem(512, 3, seed=1)
    params = {"kernel": kernel.init_params(jnp.float64),
              "raw_noise": inv_positive(jnp.asarray(1.0, jnp.float64))}
    mesh = make_mesh(("data",), devices=jax.devices()[:8])

    val0, g = sharded_nlml_value_and_grad(kernel, mesh, params, X, y)
    stepped = jax.tree_util.tree_map(lambda p, d: p - 1e-2 * d, params, g)
    val1, _ = sharded_nlml_value_and_grad(kernel, mesh, stepped, X, y)
    assert float(val1) < float(val0)
    np.testing.assert_allclose(
        float(val1), float(_exact.nlml(kernel, stepped, X, y)), rtol=1e-10)
