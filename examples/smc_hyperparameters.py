"""SMC posterior over sparse-GP hyperparameters (BASELINE config shape:
"SVGP minibatch VI + SMC hyperparameter posterior", single-chip scale).

The tempered likelihood is the Titsias collapsed bound on a data subsample
— the same surrogate the SVGP trainer optimizes — so the particle ensemble
approximates p(θ | y) for the sparse model, complete with a log-evidence
estimate usable for kernel comparison.  Particles vmap on one chip; the
sharded variant is ``parallel.sharded.run_sharded_smc_stage``.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from edrgp_tpu.inference.smc import ess, run_smc
from edrgp_tpu.ops import sgpr as _sgpr
from edrgp_tpu.ops.kernels import RBF, inv_positive, positive


def main():
    rng = np.random.default_rng(0)
    n, q, m = 200, 2, 16
    X = jnp.asarray(rng.uniform(-3, 3, size=(n, q)))
    y = jnp.asarray(np.sin(np.asarray(X[:, 0]))
                    + 0.1 * rng.normal(size=n))

    kernel = RBF(q, ARD=True)
    Z0 = X[:m]
    template = {"kernel": kernel.init_params(y.dtype),
                "raw_noise": inv_positive(jnp.asarray(0.1, y.dtype))}
    flat0, unravel = ravel_pytree(template)
    D = flat0.shape[0]

    def loglik(theta):
        p = dict(unravel(theta))
        p["Z"] = Z0          # inducing points fixed for the posterior sweep
        return _sgpr.elbo(kernel, p, X, y)

    def logprior(theta):
        return -0.5 * jnp.sum((theta - flat0) ** 2) / 9.0

    n_particles = 256
    parts0 = flat0 + 3.0 * jax.random.normal(
        jax.random.PRNGKey(1), (n_particles, D), y.dtype)
    parts, info = run_smc(loglik, logprior, parts0, jax.random.PRNGKey(2),
                          num_mcmc=3, n_leapfrog=8, eps=0.15)

    print("converged:", bool(info["converged"]),
          " log-evidence:", round(float(info["log_evidence"]), 2))
    betas = np.asarray(info["beta_trace"])
    print("temperature ladder:", np.round(betas[betas >= 0], 3))

    noise = np.array([float(positive(unravel(p)["raw_noise"]))
                      for p in np.asarray(parts)[::16]])
    lo, mid, hi = np.percentile(noise, [5, 50, 95])
    print(f"posterior noise variance: {mid:.4f} [{lo:.4f}, {hi:.4f}] "
          f"(true 0.01)")


if __name__ == "__main__":
    main()
