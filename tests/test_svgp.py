"""SVGP tests: natural-gradient optimality, ELBO improvement, prediction
quality, agreement with SGPR on moderate N."""

import numpy as np
import jax
import jax.numpy as jnp

from edrgp_tpu.models.svgp import SVGPRegressor
from edrgp_tpu.models.regression import SparseGaussianProcessRegressor
from edrgp_tpu.ops import svgp as _svgp
from edrgp_tpu.ops.kernels import RBF, inv_positive


def _data(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-3, 3, size=(n, 2))
    f = np.sin(X[:, 0]) * np.cos(X[:, 1])
    y = f + 0.1 * rng.normal(size=n)
    return X, y, f


def test_natural_gradient_full_batch_is_exact_optimum():
    """With ρ=1 and the full batch, one natural-gradient step lands on the
    optimal q(u) — the defining property of the update."""
    X, y, _ = _data(n=300)
    k = RBF(2)
    params = {"kernel": k.init_params(jnp.float64),
              "raw_noise": inv_positive(jnp.asarray(0.1)),
              "Z": jnp.asarray(X[:20])}
    q0 = _svgp.init_svgp_state(20, jnp.float64)
    Xj, yj = jnp.asarray(X), jnp.asarray(y)

    q1 = _svgp.natural_gradient_update(k, params, q0, Xj, yj, 300, 1.0)
    m1, S1 = _svgp.q_from_natural(q1)
    elbo1 = float(_svgp.svgp_elbo(k, params, m1, S1, Xj, yj, 300))

    # a second full-batch ρ=1 step must be a fixed point
    q2 = _svgp.natural_gradient_update(k, params, q1, Xj, yj, 300, 1.0)
    m2, S2 = _svgp.q_from_natural(q2)
    elbo2 = float(_svgp.svgp_elbo(k, params, m2, S2, Xj, yj, 300))
    np.testing.assert_allclose(elbo1, elbo2, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-6)


def test_optimal_q_matches_titsias_bound():
    """At the NG fixed point the uncollapsed ELBO equals the collapsed
    Titsias bound for the same hyperparameters (they are the same bound)."""
    from edrgp_tpu.ops import sgpr as _sgpr
    X, y, _ = _data(n=300)
    k = RBF(2)
    params = {"kernel": k.init_params(jnp.float64),
              "raw_noise": inv_positive(jnp.asarray(0.1)),
              "Z": jnp.asarray(X[:20])}
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    q = _svgp.natural_gradient_update(
        k, params, _svgp.init_svgp_state(20, jnp.float64), Xj, yj, 300, 1.0)
    m, S = _svgp.q_from_natural(q)
    elbo_uncollapsed = float(_svgp.svgp_elbo(k, params, m, S, Xj, yj, 300))
    elbo_collapsed = float(_sgpr.elbo(k, params, Xj, yj))
    np.testing.assert_allclose(elbo_uncollapsed, elbo_collapsed, rtol=1e-6)


def test_svgp_fit_quality():
    X, y, f = _data(n=2000)
    model = SVGPRegressor(num_inducing=64, batch_size=256, lr=5e-3)
    model.fit(X, y, max_iters=400)
    pred = model.predict(X[:500])
    rmse = np.sqrt(np.mean((pred - f[:500]) ** 2))
    assert rmse < 0.1
    trace = model.estimator_.elbo_trace_
    assert trace[-1] > trace[0]


def test_svgp_predict_gradient_matches_fd():
    X, y, _ = _data(n=1000)
    model = SVGPRegressor(num_inducing=48, batch_size=256)
    model.fit(X, y, max_iters=300)
    g = model.predict_gradient(X[:10])
    eps = 1e-5
    for d in range(2):
        Xp = X[:10].copy(); Xp[:, d] += eps
        Xm = X[:10].copy(); Xm[:, d] -= eps
        fd = (model.predict(Xp) - model.predict(Xm)) / (2 * eps)
        np.testing.assert_allclose(g[:, d], fd, rtol=1e-4, atol=1e-7)


def test_svgp_in_edr():
    """SVGP plugs into the EDR layer through the same duck-typed contract."""
    from edrgp_tpu import EffectiveDimensionalityReduction, SVDTransformer
    rng = np.random.default_rng(1)
    X = rng.normal(size=(800, 3))
    y = np.tanh(X[:, 0] + X[:, 1]) + 0.05 * rng.normal(size=800)
    edr = EffectiveDimensionalityReduction(
        SVGPRegressor(num_inducing=48, batch_size=256), SVDTransformer(),
        n_components=1)
    edr.fit(X, y, max_iters=300)
    c = edr.components_[0]
    c = c / np.linalg.norm(c)
    true = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
    assert abs(abs(c @ true) - 1) < 0.05


def test_streaming_fit_from_disk(tmp_path):
    """from_dataset + optimize_stream: the N >> memory path end-to-end."""
    from edrgp_tpu.data import MMapDataset, write_dataset
    from edrgp_tpu.models.svgp import SVGPModel
    rng = np.random.default_rng(0)
    N = 20000
    X = rng.uniform(-3, 3, size=(N, 2)).astype(np.float32)
    y = (np.sin(X[:, 0]) + 0.1 * rng.normal(size=N)).astype(np.float32)
    path = str(tmp_path / "d.edrg")
    write_dataset(path, X, y)
    ds = MMapDataset(path)
    model = SVGPModel.from_dataset(ds, RBF(2), num_inducing=32)
    model.optimize_stream(ds.batches(batch_size=512, seed=1),
                          n_total=N, steps=200, lr=5e-3)
    pred, _ = model.predict(X[:500])
    assert np.sqrt(np.mean((pred[:, 0] - np.sin(X[:500, 0])) ** 2)) < 0.12
    ds.close()


def test_optimize_stream_scan_chunk_equivalence():
    """Chunked-scan streaming (the RPC-latency armor) must reproduce the
    per-step path exactly given the same batch sequence."""
    import itertools

    from edrgp_tpu.models.svgp import SVGPModel
    from edrgp_tpu.ops.kernels import RBF

    rng = np.random.default_rng(0)
    X = rng.normal(size=(512, 3))
    y = np.sin(X[:, 0]) + 0.1 * rng.normal(size=512)

    def batch_iter():
        r = np.random.default_rng(42)
        while True:
            idx = r.integers(0, 512, size=64)
            yield X[idx], y[idx]

    def fit(chunk):
        m = SVGPModel(X[:128], y[:128], RBF(3, ARD=True), num_inducing=16,
                      seed=0)
        m.optimize_stream(batch_iter(), n_total=512, steps=30,
                          scan_chunk=chunk)
        return m

    m1, m4 = fit(1), fit(4)
    for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                    jax.tree_util.tree_leaves(m4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)
    np.testing.assert_allclose(m1._objective, m4._objective, rtol=1e-8)
