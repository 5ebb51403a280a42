"""Sharded training/inference steps: the multi-chip compute path.

Implements the parallelism table of SURVEY.md §2.3 with JAX collectives
over a named mesh (``psum``/``pmean``/``all_gather`` ride ICI within a
slice, DCN across slices — the XLA-collectives replacement for the
reference's nonexistent communication backend):

  * :func:`make_sharded_svgp_step` — data-parallel SVGP: minibatch rows
    sharded over the ``data`` axis, hyperparameter grads and natural-
    gradient statistics ``psum``-reduced, params replicated.
  * :func:`run_sharded_nuts` — chain-parallel NUTS: chains vmapped per
    device and sharded over the ``chain`` axis, with dual-averaging
    acceptance statistics pooled across *all* chains via a nested
    (vmap-axis, mesh-axis) ``pmean``.
  * :func:`distributed_systematic_resample` — SMC resampling as an
    ``all_gather`` of shard weight sums + globally consistent systematic
    ancestor selection.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import svgp as _svgp
from ..ops.kernels import Kernel, positive
from ..ops.linalg import safe_cholesky, tri_solve
from .mesh import replicated, shard_along

__all__ = ["make_sharded_svgp_step", "run_sharded_nuts",
           "distributed_systematic_resample", "run_sharded_smc_stage"]


def make_sharded_svgp_step(kernel: Kernel, mesh: Mesh, n_total: int,
                           lr: float = 3e-3,
                           data_axis: str | tuple = "data"):
    """Build a jitted data-parallel SVGP step.

    Returned ``step(params, qstate, opt_state, Xb, yb, rho)`` expects the
    minibatch sharded along ``data_axis`` (use :func:`shard_along`) and
    params/qstate replicated; it performs one Adam step on the
    hyperparameters and one natural-gradient step on q(u), with all
    cross-shard reductions as explicit ``psum``s inside ``shard_map``.

    ``data_axis`` may be a tuple of mesh axes (e.g. ``("host", "data")``
    on a hybrid DCN×ICI mesh): the batch dim is then sharded over their
    product and every reduction psums over both — the DCN axis rides the
    slower interconnect, which is fine for these O(M)/O(M²) payloads.
    """
    opt = optax.adam(lr)
    axes = (data_axis,) if isinstance(data_axis, str) else tuple(data_axis)
    n_shards = 1
    for a in axes:
        n_shards *= mesh.shape[a]
    data_axis = axes if len(axes) > 1 else axes[0]

    def local_step(params, qstate, opt_state, Xb, yb, rho):
        B_local = Xb.shape[0]
        B_global = B_local * n_shards
        scale = n_total / B_global
        m, S = _svgp.q_from_natural(qstate)

        # ---- hyperparameter leg: psum-reduced minibatch ELBO gradient ----
        def local_neg_elbo(p):
            sigma2 = positive(p["raw_noise"])
            mu, var, Luu = _svgp._latent_moments(kernel, p, m, S, Xb)
            quad = jnp.sum((yb - mu) ** 2 + var)
            exp_ll_local = -0.5 * (
                B_local * (jnp.log(2 * jnp.pi) + jnp.log(sigma2))
                + quad / sigma2)
            # KL is shard-replicated; weight it 1/n_shards so the psum of
            # local losses equals the global ELBO.
            kl = _svgp._kl(m, S, Luu)
            return -(scale * exp_ll_local - kl / n_shards)

        loss, grads = jax.value_and_grad(local_neg_elbo)(params)
        grads = lax.psum(grads, data_axis)
        loss = lax.psum(loss, data_axis)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        # ---- natural-gradient leg: psum the sufficient statistics --------
        sigma2 = positive(params["raw_noise"])
        Z = params["Z"]
        Kuu = kernel.K(params["kernel"], Z, Z)
        Luu = safe_cholesky(Kuu)
        Kub = kernel.K(params["kernel"], Z, Xb)
        A = tri_solve(Luu, Kub, lower=True)
        A = tri_solve(Luu, A, lower=True, trans=True)          # Kuu⁻¹ Kub
        t1_local = A @ yb                                       # [M]
        t2_local = A @ A.T                                      # [M, M]
        t1_sum = lax.psum(t1_local, data_axis)
        t2_sum = lax.psum(t2_local, data_axis)
        Minv = tri_solve(Luu, jnp.eye(Z.shape[0], dtype=A.dtype), lower=True)
        Kuu_inv = Minv.T @ Minv
        t1_hat = (scale / sigma2) * t1_sum
        t2_hat = -0.5 * (Kuu_inv + (scale / sigma2) * t2_sum)
        qstate = _svgp.SVGPState(
            theta1=(1 - rho) * qstate.theta1 + rho * t1_hat,
            theta2=(1 - rho) * qstate.theta2 + rho * t2_hat)
        return params, qstate, opt_state, -loss

    step = jax.jit(jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(data_axis), P(data_axis), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False))
    return step, opt.init


def run_sharded_nuts(logprob_fn: Callable, q0_chains: jnp.ndarray, keys,
                     mesh: Mesh, *, chain_axis: str = "chain",
                     num_warmup: int = 200, num_samples: int = 200,
                     max_depth: int = 6):
    """NUTS over ``C`` chains: vmap per device × shard over the mesh axis.

    ``q0_chains`` [C, D] and ``keys`` [C, 2] must be shardable by the
    ``chain`` mesh axis.  Step-size adaptation pools the acceptance
    statistic across every chain (vmap axis + mesh axis pmean), so all
    chains share one ε trajectory — the north star's pooled adaptation
    without host synchronization.
    """
    from ..inference.nuts import run_nuts

    def per_shard(q0s, ks):
        run = partial(run_nuts, logprob_fn,
                      num_warmup=num_warmup, num_samples=num_samples,
                      max_depth=max_depth,
                      axis_name=("vchain", chain_axis))
        return jax.vmap(run, axis_name="vchain")(q0s, ks)

    shard = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(chain_axis), P(chain_axis)),
        out_specs=(P(chain_axis),
                   {"accept_rate": P(chain_axis),
                    "divergences": P(chain_axis),
                    "step_size": P(chain_axis),
                    "mean_leapfrogs": P(chain_axis),
                    "inv_mass": P(chain_axis)}),
        check_vma=False)
    return jax.jit(shard)(q0_chains, keys)


def distributed_systematic_resample(key, log_w_local: jnp.ndarray,
                                    particles_local: jnp.ndarray,
                                    axis: str):
    """Globally consistent systematic resampling inside ``shard_map``.

    Weights are small: ``all_gather`` them, compute the *global* ancestor
    vector identically on every shard (deterministic given the shared
    key), then gather this shard's assigned ancestors from the
    all-gathered particle block.  O(N·D) gather traffic — fine for
    hyperparameter-sized particles; swap for a ppermute exchange when D
    grows.
    """
    n_local = log_w_local.shape[0]
    shard_idx = lax.axis_index(axis)
    log_w_all = lax.all_gather(log_w_local, axis).reshape(-1)   # [N_global]
    n_global = log_w_all.shape[0]
    w = jax.nn.softmax(log_w_all)
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), dtype=w.dtype)             # same on all shards
    pts = (u0 + jnp.arange(n_global, dtype=w.dtype)) / n_global
    ancestors = jnp.clip(jnp.searchsorted(cdf, pts), 0, n_global - 1)
    mine = lax.dynamic_slice_in_dim(ancestors, shard_idx * n_local, n_local)
    parts_all = lax.all_gather(particles_local, axis)           # [S, n_local, D]
    parts_all = parts_all.reshape(n_global, -1)
    return parts_all[mine], log_w_all


def run_sharded_smc_stage(loglik_fn: Callable, logprior_fn: Callable,
                          mesh: Mesh, *, particle_axis: str = "chain",
                          num_mcmc: int = 3, n_leapfrog: int = 8,
                          eps: float = 0.2):
    """Build a jitted single SMC tempering stage with particles sharded
    over ``particle_axis``: collective resampling + vmapped HMC
    rejuvenation.  (The β schedule stays host-side; each stage is one
    device program.)"""
    from ..inference.hmc import HMCState, hmc_step

    def stage(particles_local, beta_old, beta_new, key):
        loglik = jax.vmap(loglik_fn)(particles_local)
        log_w_local = (beta_new - beta_old) * loglik
        key_res, key_mcmc = jax.random.split(key)
        particles_local, log_w_all = distributed_systematic_resample(
            key_res, log_w_local, particles_local, particle_axis)
        logZ_inc = (jax.nn.logsumexp(log_w_all)
                    - jnp.log(jnp.asarray(log_w_all.shape[0],
                                          log_w_all.dtype)))

        def temp_logprob(q):
            return beta_new * loglik_fn(q) + logprior_fn(q)

        D = particles_local.shape[-1]

        def one_particle(q, ks):
            st = HMCState(q=q, logp=temp_logprob(q),
                          grad=jax.grad(temp_logprob)(q))

            def sweep(st, k):
                st, _ = hmc_step(temp_logprob, st, k, eps,
                                 jnp.ones(D, q.dtype), n_leapfrog)
                return st, None

            st, _ = lax.scan(sweep, st, ks)
            return st.q

        n_local = particles_local.shape[0]
        shard_idx = lax.axis_index(particle_axis)
        mkeys = jax.random.split(
            jax.random.fold_in(key_mcmc, shard_idx),
            n_local * num_mcmc).reshape(n_local, num_mcmc, 2)
        particles_local = jax.vmap(one_particle)(particles_local, mkeys)
        return particles_local, logZ_inc

    shard = jax.shard_map(
        stage, mesh=mesh,
        in_specs=(P(particle_axis), P(), P(), P()),
        out_specs=(P(particle_axis), P()),
        check_vma=False)
    return jax.jit(shard)
