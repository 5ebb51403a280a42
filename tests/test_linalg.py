"""Blocked linear-algebra kernels: trtri/lauum blocking, jitter cascade.

These back the trace-form NLML adjoint (``ops/linalg.py::logdet_and_quad``),
the replacement for GPy/LAPACK's dpotri path (SURVEY.md §2.2 G2).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from edrgp_tpu.ops import linalg


def _chol(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    K = A @ A.T + n * np.eye(n)
    return jnp.asarray(K), jnp.asarray(np.linalg.cholesky(K))


@pytest.mark.parametrize("n", [3, 120, 513, 1030])
def test_tri_inv_blocked(n):
    _, L = _chol(n)
    Linv = linalg.tri_inv_blocked(L, block=256)
    np.testing.assert_allclose(np.asarray(Linv @ L), np.eye(n), atol=1e-9)
    # strictly lower-triangular output (upper blocks exactly zero)
    assert np.all(np.triu(np.asarray(Linv), 1) == 0)


@pytest.mark.parametrize("n", [3, 120, 513, 1030])
def test_sym_square_from_tri_inv(n):
    K, L = _chol(n)
    Linv = linalg.tri_inv_blocked(L, block=256)
    Kinv = linalg.sym_square_from_tri_inv(Linv, block=256)
    np.testing.assert_allclose(np.asarray(Kinv @ K), np.eye(n), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Kinv), np.asarray(Kinv).T)


def test_cholesky_once_matches_plain():
    K, L = _chol(200, seed=3)
    Lo = linalg.cholesky_once(K)
    np.testing.assert_allclose(np.asarray(Lo), np.asarray(L), atol=1e-10)


def test_cholesky_once_jitter_escalation():
    # Rank-deficient: requires the escalating-jitter path.
    K = jnp.ones((64, 64))
    L = linalg.cholesky_once(K)
    assert bool(jnp.all(jnp.isfinite(L)))
    # factor reproduces K up to the (small) added jitter
    err = float(jnp.abs(L @ L.T - K).max())
    assert err < 1e-3


def test_cholesky_once_vmap():
    K, _ = _chol(64, seed=5)
    Kb = jnp.stack([K, 2.0 * K])
    Lb = jax.vmap(linalg.cholesky_once)(Kb)
    for i, scale in enumerate([1.0, 2.0]):
        np.testing.assert_allclose(
            np.asarray(Lb[i] @ Lb[i].T), np.asarray(scale * K), rtol=1e-10)


def test_logdet_and_quad_grad_matches_autodiff():
    K, _ = _chol(150, seed=7)
    y = jnp.asarray(np.random.default_rng(7).normal(size=150))

    def f_custom(Km):
        ld, q = linalg.logdet_and_quad(Km, y)
        return 0.7 * ld + 1.3 * q

    def f_ref(Km):
        L = jnp.linalg.cholesky(Km)
        al = jax.scipy.linalg.cho_solve((L, True), y)
        return 0.7 * 2.0 * jnp.sum(jnp.log(jnp.diag(L))) + 1.3 * (y @ al)

    g1 = jax.grad(f_custom)(K)
    g2 = jax.grad(f_ref)(K)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-10)


@pytest.mark.parametrize("n", [100, 513, 1030])
def test_cholesky_blocked_matches_stock(n):
    K, L = _chol(n, seed=11)
    Lb = linalg.cholesky_blocked(K, block=256)
    np.testing.assert_allclose(np.asarray(Lb), np.asarray(L), atol=1e-9)
    assert np.all(np.triu(np.asarray(Lb), 1) == 0)


def test_cholesky_blocked_jitter_via_cholesky_once(monkeypatch):
    # Force the blocked path inside cholesky_once's jitter cascade and
    # check it still escalates on a rank-deficient matrix.
    monkeypatch.setattr(linalg, "_BLOCK_CHOL_MIN_N", 32)
    K = jnp.ones((100, 100))
    L = linalg.cholesky_once(K)
    assert bool(jnp.all(jnp.isfinite(L)))
    assert float(jnp.abs(L @ L.T - K).max()) < 1e-3


def test_value_and_grad_path_large_uses_blocked(monkeypatch):
    # End-to-end: with the blocked threshold lowered, logdet_and_quad's
    # value+grad still matches the autodiff reference.
    monkeypatch.setattr(linalg, "_BLOCK_CHOL_MIN_N", 64)
    K, _ = _chol(300, seed=13)
    y = jnp.asarray(np.random.default_rng(13).normal(size=300))

    def f_custom(Km):
        ld, q = linalg.logdet_and_quad(Km, y)
        return 0.7 * ld + 1.3 * q

    def f_ref(Km):
        L = jnp.linalg.cholesky(Km)
        al = jax.scipy.linalg.cho_solve((L, True), y)
        return 0.7 * 2.0 * jnp.sum(jnp.log(jnp.diag(L))) + 1.3 * (y @ al)

    v1, g1 = jax.value_and_grad(f_custom)(K)
    v2, g2 = jax.value_and_grad(f_ref)(K)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-9)


def test_cholesky_blocked_v2_matches_stock():
    """Gemm-panel blocked Cholesky (the production fp32 value path above
    N=4096) against the stock kernel, including the padded (non-multiple)
    shape."""
    from edrgp_tpu.ops.linalg import cholesky_blocked_v2

    rng = np.random.default_rng(0)
    for n, dt, tol in ((900, jnp.float64, 1e-12), (1300, jnp.float32, 2e-5)):
        G = rng.normal(size=(n, 16)).astype(np.float64)
        A = jnp.asarray(G @ G.T + n * np.eye(n), dt)
        L_ref = jnp.linalg.cholesky(A)
        L_v2 = cholesky_blocked_v2(A, block=512)
        err = float(jnp.linalg.norm(jnp.tril(L_v2) - jnp.tril(L_ref))
                    / jnp.linalg.norm(jnp.tril(L_ref)))
        assert err < tol, (n, dt, err)


def test_cholesky_once_routes_f32_through_blocked_v2():
    """cholesky_once at fp32 N>threshold uses the blocked factorization;
    the jitter cascade must still detect and repair indefiniteness."""
    from edrgp_tpu.ops import linalg as la

    n = la._BLOCK_CHOL_MIN_N + 64
    rng = np.random.default_rng(1)
    G = rng.normal(size=(n, 8)).astype(np.float32)
    # rank-8 + tiny diagonal: fp32-indefinite enough to need jitter
    A = jnp.asarray(G @ G.T + 1e-6 * np.eye(n), jnp.float32)
    L = la.cholesky_once(A)
    assert bool(jnp.all(jnp.isfinite(jnp.diagonal(L))))
    # and a well-conditioned one matches stock closely
    B = jnp.asarray(G @ G.T + n * np.eye(n), jnp.float32)
    L2 = la.cholesky_once(B)
    ref = jnp.linalg.cholesky(B)
    err = float(jnp.linalg.norm(jnp.tril(L2) - jnp.tril(ref))
                / jnp.linalg.norm(jnp.tril(ref)))
    assert err < 2e-5


class TestKinvVariants:
    """The D&C / batched-gemm reformulations of trtri+lauum (r4 headline
    sweep candidates) must agree with the production blocked versions."""

    def _L(self, n=700, seed=0):
        rng = np.random.default_rng(seed)
        G = rng.normal(size=(n, 64))
        A = G @ G.T + n * np.eye(n)
        return np.linalg.cholesky(A)

    def test_tri_inv_dc_and_rowbatch(self):
        from edrgp_tpu.ops.linalg import tri_inv_dc, tri_inv_rowbatch
        L = self._L()
        ref = np.linalg.inv(L)
        for fn, kw in ((tri_inv_dc, {"leaf": 256}),
                       (tri_inv_rowbatch, {"block": 256})):
            got = np.asarray(fn(jnp.asarray(L), **kw))
            np.testing.assert_allclose(got, ref, rtol=0, atol=1e-8)

    def test_sym_square_dc_and_colbatch(self):
        from edrgp_tpu.ops.linalg import (sym_square_colbatch, sym_square_dc)
        L = self._L()
        Linv = np.linalg.inv(L)
        ref = Linv.T @ Linv
        for fn, kw in ((sym_square_dc, {"leaf": 256}),
                       (sym_square_colbatch, {"block": 256})):
            got = np.asarray(fn(jnp.asarray(Linv), **kw))
            np.testing.assert_allclose(got, ref, rtol=0, atol=1e-8)
