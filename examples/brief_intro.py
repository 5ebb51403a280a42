"""API tour (reference BriefIntro.ipynb as a runnable script): GP
regression and classification, ARD kernels, restarts, EDR, iterative EDR,
sparse refit, save/load."""

import numpy as np
from sklearn.decomposition import SparsePCA

from edrgp_tpu import EffectiveDimensionalityReduction, SVDTransformer
from edrgp_tpu.datasets import get_beta_inputs, get_edr_target
from edrgp_tpu.models import (GaussianProcessClassifier,
                              GaussianProcessRegressor,
                              SparseGaussianProcessRegressor)


def main():
    rng = np.random.default_rng(0)

    # --- exact GP regression with ARD ---------------------------------
    X = rng.normal(size=(200, 3))
    y = np.tanh(X[:, 0]) + 0.1 * rng.normal(size=200)
    gp = GaussianProcessRegressor(kernels=["RBF"],
                                  kernel_options=[{"ARD": True}])
    gp.fit(X, y)
    print("exact GP  log-lik:", round(gp.estimator_.log_likelihood(), 2),
          " noise var:", round(gp.estimator_.noise_variance, 4))

    # --- restarts (same kernel — best of 3 vmapped starts) -------------
    gp_r = GaussianProcessRegressor(kernels=["RBF"],
                                    kernel_options=[{"ARD": True}],
                                    method="optimize_restarts")
    gp_r.fit(X, y, num_restarts=3)
    print("restarts  log-lik:", round(gp_r.estimator_.log_likelihood(), 2))

    # --- sparse GP -----------------------------------------------------
    sgp = SparseGaussianProcessRegressor(num_inducing=30)
    sgp.fit(X, y)
    print("sparse GP bound:  ", round(sgp.estimator_.log_likelihood()[0][0], 2))

    # --- classification ------------------------------------------------
    yc = (X[:, 0] + X[:, 1] > 0).astype(int)
    clf = GaussianProcessClassifier()
    clf.fit(X, yc)
    print("classifier accuracy:", (clf.predict(X) == yc).mean())

    # --- iterative EDR on 10-D data with a 2-D effective subspace ------
    X10 = get_beta_inputs(400, 10, rng=rng)
    B = np.zeros((10, 2)); B[0, 0] = B[3, 1] = 1.0
    y10 = get_edr_target(X10 @ B, 0.05, rng=rng)
    edr = EffectiveDimensionalityReduction(
        GaussianProcessRegressor(["RBF"], [{"ARD": True}]),
        SVDTransformer(), n_components=2, step=2, normalize=False)
    edr.fit(X10, y10)
    print("EDR components shape:", edr.components_.shape,
          " variance ratio:", np.round(edr.subspace_variance_ratio_, 3))

    # --- sparse refit from cached gradients ----------------------------
    edr.refit(SparsePCA(n_components=2, alpha=0.1, random_state=0))
    print("refit components nonzeros:",
          int((np.abs(edr.refit_components_) > 1e-6).sum()), "of",
          edr.refit_components_.size)

    # --- persistence ---------------------------------------------------
    gp.save("/tmp/brief_intro_model")
    gp2 = GaussianProcessRegressor()
    gp2.load("/tmp/brief_intro_model")
    assert np.allclose(gp2.predict(X), gp.predict(X))
    print("save/load round-trip ok")


if __name__ == "__main__":
    main()
