"""Fully Bayesian GP hyperparameters with vmapped NUTS chains — capability
the reference never had (GPy offers ML-II point estimates only).

Samples the posterior over (ARD lengthscales, signal variance, noise) of
an exact GP, with several chains vectorized on one chip; reports R-hat,
ESS, and posterior predictive intervals.  On a pod slice the same chains
shard over a mesh via ``edrgp_tpu.parallel.sharded.run_sharded_nuts``.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from edrgp_tpu.inference.nuts import run_nuts
from edrgp_tpu.metrics import effective_sample_size, potential_scale_reduction
from edrgp_tpu.ops import exact
from edrgp_tpu.ops.kernels import RBF, positive


def main():
    rng = np.random.default_rng(0)
    n = 80
    X = jnp.asarray(rng.normal(size=(n, 2)))
    y = jnp.asarray(np.tanh(np.asarray(X[:, 0]))
                    + 0.1 * rng.normal(size=n))

    kernel = RBF(2, ARD=True)
    p0 = {"kernel": kernel.init_params(y.dtype),
          "raw_noise": jnp.asarray(-2.0, y.dtype)}
    flat0, unravel = ravel_pytree(p0)

    def logprob(q):
        # weak N(0, 3²) prior on the unconstrained hyperparameters
        return (-exact.nlml(kernel, unravel(q), X, y)
                - 0.5 * jnp.sum(q ** 2) / 9.0)

    n_chains = 8
    run = lambda q, k: run_nuts(logprob, q, k, num_warmup=400,
                                num_samples=400, max_depth=8)
    qs, info = jax.vmap(run)(jnp.tile(flat0, (n_chains, 1)),
                             jax.random.split(jax.random.PRNGKey(0),
                                              n_chains))
    chains = np.asarray(qs)                       # [C, S, D]
    rhat = potential_scale_reduction(chains)
    ess = effective_sample_size(chains)
    print("divergences:", int(np.sum(np.asarray(info["divergences"]))))
    print("R-hat per dim:", np.round(rhat, 3))
    print("ESS per dim:  ", np.round(ess, 0))

    noise = np.array([float(positive(unravel(q)["raw_noise"]))
                      for q in chains.reshape(-1, chains.shape[-1])[::20]])
    lo, mid, hi = np.percentile(noise, [5, 50, 95])
    print(f"posterior noise variance: {mid:.4f} [{lo:.4f}, {hi:.4f}] "
          f"(true 0.01)")


if __name__ == "__main__":
    main()
