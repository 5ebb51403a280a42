"""Sampler correctness: HMC/NUTS moment recovery on known targets, SMC
evidence, and GP-hyperparameter posterior smoke (SURVEY.md §4 style —
seeded statistical tests with tolerance bands)."""

import numpy as np
import jax
import jax.numpy as jnp

from edrgp_tpu.inference.hmc import run_hmc
from edrgp_tpu.inference.nuts import run_nuts, nuts_step
from edrgp_tpu.inference.hmc import init_state
from edrgp_tpu.inference.smc import run_smc, systematic_resample, ess


A = jnp.asarray([[2.0, 0.5], [0.5, 1.0]])
SIGMA = A @ A.T
PREC = jnp.linalg.inv(SIGMA)
MU = jnp.asarray([1.0, -2.0])


def gauss_logprob(q):
    d = q - MU
    return -0.5 * d @ PREC @ d


def test_hmc_moments():
    qs, info = run_hmc(gauss_logprob, jnp.zeros(2), jax.random.PRNGKey(0),
                       num_warmup=500, num_samples=3000, n_leapfrog=16)
    assert info["divergences"] == 0
    assert 0.6 < float(info["accept_rate"]) <= 1.0
    np.testing.assert_allclose(np.asarray(qs.mean(0)), np.asarray(MU),
                               atol=0.15)
    np.testing.assert_allclose(np.cov(np.asarray(qs).T), np.asarray(SIGMA),
                               atol=0.6)


def test_nuts_moments():
    qs, info = run_nuts(gauss_logprob, jnp.zeros(2), jax.random.PRNGKey(1),
                        num_warmup=500, num_samples=6000, max_depth=8)
    assert info["divergences"] == 0
    np.testing.assert_allclose(np.asarray(qs.mean(0)), np.asarray(MU),
                               atol=0.15)
    np.testing.assert_allclose(np.cov(np.asarray(qs).T), np.asarray(SIGMA),
                               atol=0.6)


def test_nuts_adapts_trajectory_length():
    """On a wide target NUTS should take >1 leapfrog per step on average;
    divergent behaviour would show as depth-0 trees everywhere."""
    _, info = run_nuts(gauss_logprob, jnp.zeros(2), jax.random.PRNGKey(2),
                       num_warmup=300, num_samples=300, max_depth=8)
    assert float(info["mean_leapfrogs"]) > 2.0


def test_nuts_vmapped_chains():
    q0 = jnp.zeros((4, 2))
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    run = lambda q, k: run_nuts(gauss_logprob, q, k, num_warmup=300,
                                num_samples=500, max_depth=6)
    qs, info = jax.vmap(run)(q0, keys)
    assert qs.shape == (4, 500, 2)
    pooled = np.asarray(qs).reshape(-1, 2)
    np.testing.assert_allclose(pooled.mean(0), np.asarray(MU), atol=0.15)


def test_curvature_inv_mass():
    """Laplace mass init: exact −1/Hessian-diag on a Gaussian, unit mass
    where curvature is flat/negative, and the segmented runner accepts it
    on a badly scaled target (shallow trees from segment one)."""
    from edrgp_tpu.inference.hmc import curvature_inv_mass
    from edrgp_tpu.inference.nuts import run_nuts_segmented

    im = curvature_inv_mass(gauss_logprob, MU)
    np.testing.assert_allclose(np.asarray(im),
                               1.0 / np.diag(np.asarray(PREC)), rtol=1e-5)
    # flat direction (no curvature) falls back to unit mass; the curved
    # dimension uses NON-unit curvature 2 (−q²) so the computed branch
    # (inv mass 0.5) is distinguishable from the fallback (1.0) — ADVICE r3.
    flat = curvature_inv_mass(lambda q: q[0] * 0.0 - q[1] ** 2,
                              jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(flat), [1.0, 0.5], rtol=1e-5)

    # diag scales (10, 0.1): identity mass needs ~100-leapfrog trees;
    # curvature mass should mix with shallow trees and sane moments
    scales = jnp.asarray([10.0, 0.1])

    def scaled_logprob(q):
        return -0.5 * jnp.sum((q / scales) ** 2)

    q0 = jnp.zeros((4, 2)).at[:, 0].add(
        jax.random.normal(jax.random.PRNGKey(7), (4,)))
    im0 = curvature_inv_mass(scaled_logprob, jnp.zeros(2))
    qs, info = run_nuts_segmented(
        scaled_logprob, q0, jax.random.PRNGKey(3), num_warmup=200,
        num_samples=400, max_depth=8, segment_len=50, inv_mass0=im0)
    assert float(info["mean_leapfrogs"]) < 32.0
    pooled = np.asarray(qs).reshape(-1, 2)
    np.testing.assert_allclose(pooled.std(0), np.asarray(scales), rtol=0.25)


def test_nuts_step_reversible_shapes():
    state = init_state(gauss_logprob, jnp.zeros(2))
    new, info = nuts_step(gauss_logprob, state, jax.random.PRNGKey(0),
                          0.25, jnp.ones(2), 6)
    assert new.q.shape == (2,)
    assert np.isfinite(float(new.logp))
    assert int(info["n_leaves"]) >= 1


def test_systematic_resample_unbiased():
    key = jax.random.PRNGKey(0)
    log_w = jnp.log(jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    counts = np.zeros(4)
    for i in range(200):
        idx = systematic_resample(jax.random.fold_in(key, i), log_w)
        counts += np.bincount(np.asarray(idx), minlength=4)
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.1, 0.2, 0.3, 0.4], atol=0.02)


def test_ess():
    assert abs(float(ess(jnp.zeros(100))) - 100.0) < 1e-6
    # one dominant weight → ESS ≈ 1
    lw = jnp.asarray([0.0] + [-50.0] * 99)
    assert float(ess(lw)) < 1.5


def test_smc_evidence_and_moments():
    def loglik(q):
        return gauss_logprob(q)

    def logprior(q):
        return -0.5 * jnp.sum(q ** 2) / 25.0

    parts0 = 5.0 * jax.random.normal(jax.random.PRNGKey(1), (1000, 2))
    parts, info = run_smc(loglik, logprior, parts0, jax.random.PRNGKey(2),
                          num_mcmc=5, n_leapfrog=10, eps=0.3)
    assert bool(info["converged"])
    # analytic: log ∫ exp(loglik) N(0, 25 I) = log[(2π)^{d/2}|Σ|^{1/2}
    #           N(μ; 0, Σ + 25 I)]
    from scipy.stats import multivariate_normal
    S = np.asarray(SIGMA)
    true_logZ = np.log((2 * np.pi) ** 1.0 * np.sqrt(np.linalg.det(S))
                       * multivariate_normal.pdf(np.asarray(MU),
                                                 mean=np.zeros(2),
                                                 cov=S + 25 * np.eye(2)))
    assert abs(float(info["log_evidence"]) - true_logZ) < 0.3
    np.testing.assert_allclose(np.asarray(parts.mean(0)), np.asarray(MU),
                               atol=0.3)


def test_nuts_gp_hyperparameter_posterior():
    """End-to-end: NUTS over exact-GP hyperparameters (the north-star
    workload shape) — posterior mass should sit near the ML-II optimum."""
    from edrgp_tpu.ops import exact
    from edrgp_tpu.ops.kernels import RBF

    rng = np.random.default_rng(0)
    X = jnp.asarray(np.linspace(0, 6, 40)[:, None])
    y = jnp.asarray(np.sin(np.asarray(X[:, 0])) + 0.1 * rng.normal(size=40))
    k = RBF(1)

    from jax.flatten_util import ravel_pytree
    p0 = {"kernel": k.init_params(jnp.float64),
          "raw_noise": jnp.asarray(0.0)}
    flat0, unravel = ravel_pytree(p0)

    def logprob(q):
        p = unravel(q)
        # weak N(0, 3²) prior on the unconstrained params
        return -exact.nlml(k, p, X, y) - 0.5 * jnp.sum(q ** 2) / 9.0

    qs, info = run_nuts(logprob, flat0, jax.random.PRNGKey(0),
                        num_warmup=300, num_samples=300, max_depth=8)
    assert int(info["divergences"]) < 15
    # posterior mean NLML should be close to the ML-II optimum
    post_mean_nlml = float(exact.nlml(k, unravel(qs.mean(0)), X, y))
    from edrgp_tpu.models.regression import GaussianProcessRegressor
    gp = GaussianProcessRegressor()
    gp.fit(np.asarray(X), np.asarray(y))
    # gp log_likelihood is on normalized y; recompute optimum on raw y
    from edrgp_tpu.inference.lbfgs import minimize
    res = minimize(lambda p: exact.nlml(k, p, X, y), p0, max_iters=300)
    assert post_mean_nlml < float(res.value) + 5.0


def test_nuts_segmented_moments():
    """Segmented driver (bounded device programs + host continuation)
    recovers the same posterior as the monolithic run_nuts, with segment
    boundaries that do NOT align with the warmup windows (remainder
    segments exercised)."""
    from edrgp_tpu.inference.nuts import run_nuts_segmented

    q0 = jnp.zeros((4, 2))
    qs, info = run_nuts_segmented(gauss_logprob, q0, jax.random.PRNGKey(7),
                                  num_warmup=300, num_samples=700,
                                  max_depth=8, segment_len=64)
    assert qs.shape == (4, 700, 2)
    assert info["divergences"] == 0
    assert float(info["mean_leapfrogs"]) > 2.0
    pooled = qs.reshape(-1, 2)
    np.testing.assert_allclose(pooled.mean(0), np.asarray(MU), atol=0.15)
    np.testing.assert_allclose(np.cov(pooled.T), np.asarray(SIGMA), atol=0.6)


def test_nuts_segmented_pooled_eps():
    """pool_eps shares one dual-averaging ε across chains."""
    from edrgp_tpu.inference.nuts import run_nuts_segmented

    q0 = jnp.tile(jnp.asarray([[0.5, -1.0]]), (3, 1))
    qs, info = run_nuts_segmented(gauss_logprob, q0, jax.random.PRNGKey(8),
                                  num_warmup=200, num_samples=200,
                                  segment_len=50, pool_eps=True)
    eps = np.asarray(info["step_size"])
    assert eps.shape == (3,)
    np.testing.assert_allclose(eps, eps[0], rtol=1e-6)
    pooled = qs.reshape(-1, 2)
    np.testing.assert_allclose(pooled.mean(0), np.asarray(MU), atol=0.25)


def test_chain_chunked_segmented_nuts():
    """group_vmap chunking (the 1024-chain memory knob) must not change the
    math: with pool_eps=False the per-chain key schedule is identical, so
    chunked and unchunked runs agree exactly; with pool_eps=True (per-group
    pooling) the run stays statistically sound."""
    from edrgp_tpu.inference.nuts import run_nuts_segmented
    q0 = jnp.zeros((8, 2))
    kw = dict(num_warmup=100, num_samples=100, max_depth=6, segment_len=25)
    qs_full, _ = run_nuts_segmented(gauss_logprob, q0, jax.random.PRNGKey(2),
                                    pool_eps=False, **kw)
    qs_chunk, _ = run_nuts_segmented(gauss_logprob, q0, jax.random.PRNGKey(2),
                                     pool_eps=False, chain_chunk=4, **kw)
    np.testing.assert_allclose(qs_chunk, qs_full, rtol=1e-12)

    qs_pool, info = run_nuts_segmented(gauss_logprob, q0,
                                       jax.random.PRNGKey(2), pool_eps=True,
                                       chain_chunk=4, **kw)
    pooled = np.asarray(qs_pool).reshape(-1, 2)
    np.testing.assert_allclose(pooled.mean(0), np.asarray(MU), atol=0.3)
    assert info["divergences"] == 0

    import pytest
    with pytest.raises(ValueError):
        run_nuts_segmented(gauss_logprob, q0, jax.random.PRNGKey(2),
                           chain_chunk=3, **kw)


def test_smc_segmented_matches_monolithic_quality():
    """The per-stage segmented SMC driver (the TPU execution form) must
    reproduce the monolithic run_smc's evidence and moments, including
    with particle chunking."""
    from edrgp_tpu.inference.smc import run_smc_segmented

    def logprior(q):
        return -0.5 * jnp.sum(q ** 2) / 25.0

    parts0 = 5.0 * jax.random.normal(jax.random.PRNGKey(1), (1000, 2))
    parts, info = run_smc_segmented(gauss_logprob, logprior, parts0,
                                    jax.random.PRNGKey(2), num_mcmc=5,
                                    n_leapfrog=10, eps=0.3,
                                    particle_chunk=250)
    assert info["converged"]
    assert info["beta_trace"][-1] >= 1.0
    assert len(info["ess_trace"]) == info["n_stages"]
    from scipy.stats import multivariate_normal
    S = np.asarray(SIGMA)
    true_logZ = np.log((2 * np.pi) ** 1.0 * np.sqrt(np.linalg.det(S))
                       * multivariate_normal.pdf(np.asarray(MU),
                                                 mean=np.zeros(2),
                                                 cov=S + 25 * np.eye(2)))
    assert abs(info["log_evidence"] - true_logZ) < 0.3
    np.testing.assert_allclose(np.asarray(parts.mean(0)), np.asarray(MU),
                               atol=0.3)


def test_smc_adaptive_rejuvenation_survives_stiff_target():
    """A target 500× tighter than the prior: a FIXED-scale rejuvenation
    kernel freezes at high β (resample duplicates never re-diversify and
    the ensemble collapses toward one point — the r4 config-5 failure,
    results/svgp10m_smc_r5.log first capture); the r5 adaptive kernel
    (ensemble-variance mass + acceptance-driven ε) must keep the ensemble
    diverse and land the right posterior."""
    from edrgp_tpu.inference.smc import run_smc_segmented

    mu = jnp.asarray([0.8, -0.5])
    sig = 0.01

    def loglik(q):
        return -0.5 * jnp.sum((q - mu) ** 2) / sig ** 2

    def logprior(q):
        return -0.5 * jnp.sum(q ** 2) / 25.0

    parts0 = 5.0 * jax.random.normal(jax.random.PRNGKey(4), (512, 2))
    parts, info = run_smc_segmented(loglik, logprior, parts0,
                                    jax.random.PRNGKey(5), num_mcmc=3,
                                    n_leapfrog=10, eps=0.3, max_stages=60)
    assert info["converged"]
    # the ensemble never degenerates: every resample keeps a healthy
    # fraction of unique ancestors, and the rejuvenation keeps ACCEPTING
    # at the tightest temperatures (ε is in preconditioned units — the
    # ensemble-variance mass absorbs the 500× scale, so ε itself need
    # not shrink)
    assert min(info["unique_particles_after_resample"]) > 50
    assert info["accept_trace"][-1] > 0.2
    np.testing.assert_allclose(np.asarray(parts.mean(0)), np.asarray(mu),
                               atol=5 * sig)
    post_std = np.asarray(parts).std(0)
    assert np.all(post_std > 0.2 * sig) and np.all(post_std < 5 * sig)


def test_nuts_adaptation_reuse():
    """Adaptation transfer: a second chain group sampling with the first
    group's tuned (eps, inv_mass) — no warmup — must produce sound
    moments (the 1024-chain warmup-amortization path)."""
    from edrgp_tpu.inference.nuts import run_nuts_segmented
    q0 = jnp.zeros((8, 2))
    kw = dict(num_samples=200, max_depth=6, segment_len=25)
    _, info = run_nuts_segmented(gauss_logprob, q0, jax.random.PRNGKey(2),
                                 num_warmup=200, pool_eps=True, **kw)
    reuse = (np.asarray(info["step_size"]).ravel()[0],
             np.asarray(info["inv_mass"]).mean(axis=0))
    qs2, info2 = run_nuts_segmented(gauss_logprob, q0 + 0.1,
                                    jax.random.PRNGKey(9), num_warmup=0,
                                    reuse_adaptation=reuse, **kw)
    assert info2["divergences"] == 0
    pooled = np.asarray(qs2).reshape(-1, 2)
    np.testing.assert_allclose(pooled.mean(0), np.asarray(MU), atol=0.3)
