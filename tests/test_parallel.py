"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: simulated meshes via host platform device count)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from edrgp_tpu.ops import svgp as _svgp
from edrgp_tpu.ops.kernels import RBF, inv_positive
from edrgp_tpu.parallel.mesh import factor_devices, make_mesh, shard_along
from edrgp_tpu.parallel.sharded import (distributed_systematic_resample,
                                        make_sharded_svgp_step,
                                        run_sharded_nuts,
                                        run_sharded_smc_stage)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_factor_devices():
    assert factor_devices(8) == (4, 2)
    assert factor_devices(16) == (4, 4)
    assert factor_devices(1) == (1, 1)
    assert factor_devices(6) == (3, 2)


def test_mesh_axes():
    mesh = make_mesh(("chain", "data"))
    assert mesh.shape["chain"] * mesh.shape["data"] == 8


def test_sharded_svgp_matches_single_device():
    """One data-parallel step must produce the same params/qstate as the
    single-device natural-gradient + Adam step (determinism check — the
    'cross-host checksum' obligation of SURVEY.md §5)."""
    mesh = make_mesh(("chain", "data"))
    rng = np.random.default_rng(0)
    N, Q, M, B = 512, 2, 16, 128
    X = rng.normal(size=(N, Q))
    y = np.sin(X[:, 0])
    k = RBF(Q)
    params = {"kernel": k.init_params(jnp.float64),
              "raw_noise": inv_positive(jnp.asarray(1.0)),
              "Z": jnp.asarray(X[:M])}
    qstate = _svgp.init_svgp_state(M, jnp.float64)

    step, opt_init = make_sharded_svgp_step(k, mesh, n_total=N, lr=1e-2)
    opt_state = opt_init(params)
    Xb = jax.device_put(jnp.asarray(X[:B]), shard_along(mesh, "data", 2))
    yb = jax.device_put(jnp.asarray(y[:B]), shard_along(mesh, "data", 1))
    p1, q1, _, elbo_sharded = step(params, qstate, opt_state, Xb, yb,
                                   jnp.asarray(0.3))

    # single-device reference: same math, no mesh
    import optax
    m, S = _svgp.q_from_natural(qstate)
    Xl, yl = jnp.asarray(X[:B]), jnp.asarray(y[:B])
    loss_fn = lambda p: -_svgp.svgp_elbo(k, p, m, S, Xl, yl, N)
    loss, grads = jax.value_and_grad(loss_fn)(params)
    opt = optax.adam(1e-2)
    upd, _ = opt.update(grads, opt.init(params), params)
    p_ref = optax.apply_updates(params, upd)
    q_ref = _svgp.natural_gradient_update(k, p_ref, qstate, Xl, yl, N,
                                          jnp.asarray(0.3))

    np.testing.assert_allclose(float(elbo_sharded), float(-loss), rtol=1e-8)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7,
                                   atol=1e-10)
    np.testing.assert_allclose(np.asarray(q1.theta1),
                               np.asarray(q_ref.theta1), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(q1.theta2),
                               np.asarray(q_ref.theta2), rtol=1e-7)


def test_sharded_nuts_pooled_stepsize():
    mesh = make_mesh(("chain", "data"))
    mu = jnp.asarray([1.0, -1.0])

    def logprob(q):
        return -0.5 * jnp.sum((q - mu) ** 2)

    C = 8
    q0 = jnp.zeros((C, 2))
    keys = jax.random.split(jax.random.PRNGKey(0), C)
    qs, info = run_sharded_nuts(logprob, q0, keys, mesh,
                                num_warmup=150, num_samples=150, max_depth=6)
    assert qs.shape == (C, 150, 2)
    eps = np.asarray(info["step_size"])
    # pooled adaptation → identical ε on every chain
    np.testing.assert_allclose(eps, eps[0], rtol=1e-12)
    pooled = np.asarray(qs).reshape(-1, 2)
    np.testing.assert_allclose(pooled.mean(0), np.asarray(mu), atol=0.2)


def test_distributed_resample_matches_global():
    """Collective systematic resampling must equal the single-device
    resampling of the concatenated weights."""
    from edrgp_tpu.inference.smc import systematic_resample
    mesh = make_mesh(("chain", "data"))
    n_total = 64
    rng = np.random.default_rng(0)
    log_w = jnp.asarray(rng.normal(size=n_total))
    particles = jnp.asarray(rng.normal(size=(n_total, 3)))
    key = jax.random.PRNGKey(7)

    def shard_fn(lw, parts):
        new_parts, _ = distributed_systematic_resample(key, lw, parts,
                                                       "chain")
        return new_parts

    sharded = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("chain"), P("chain")),
        out_specs=P("chain"), check_vma=False))(log_w, particles)

    idx = systematic_resample(key, log_w)
    expected = particles[idx]
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(expected),
                               rtol=1e-12)


def test_sharded_smc_stage_runs():
    mesh = make_mesh(("chain", "data"))
    mu = jnp.asarray([0.5, 0.5])

    def loglik(q):
        return -0.5 * jnp.sum((q - mu) ** 2)

    def logprior(q):
        return -0.5 * jnp.sum(q ** 2) / 25.0

    stage = run_sharded_smc_stage(loglik, logprior, mesh,
                                  num_mcmc=2, n_leapfrog=5, eps=0.3)
    parts = jax.device_put(
        5.0 * jax.random.normal(jax.random.PRNGKey(1), (64, 2)),
        shard_along(mesh, "chain", 2))
    parts2, logZinc = stage(parts, jnp.asarray(0.0), jnp.asarray(1.0),
                            jax.random.PRNGKey(2))
    assert parts2.shape == (64, 2)
    assert np.isfinite(float(logZinc))
    # after tempering to β=1 with rejuvenation, particles should have moved
    # toward μ
    assert np.linalg.norm(np.asarray(parts2).mean(0) - np.asarray(mu)) < 1.5


def test_graft_entry_dryrun():
    """The driver contract: entry() compiles; dryrun_multichip(8) runs."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.isfinite(float(out[0]))
    g.dryrun_multichip(8)
