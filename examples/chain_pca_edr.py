"""PCA preprocessor chained before EDR (reference chain_PCA-EDRGP.ipynb):
denoise a rank-deficient input with PCA, then run EDR in the reduced
space; learned components map back to the raw features automatically."""

import numpy as np
from sklearn.decomposition import PCA

from edrgp_tpu import EffectiveDimensionalityReduction, SVDTransformer

from edrgp_tpu.models import GaussianProcessRegressor


def main():
    rng = np.random.default_rng(3)
    # 6 observed features are noisy linear mixes of 2 latent factors; the
    # correlation structure survives standardization, so PCA(2) recovers
    # the latent plane and EDR then finds the single direction y follows.
    Z = rng.normal(size=(500, 2))
    A = rng.normal(size=(6, 2))
    X = Z @ A.T + 0.05 * rng.normal(size=(500, 6))
    y = np.tanh(Z @ [1.0, 0.4]) + 0.05 * rng.normal(size=500)

    edr = EffectiveDimensionalityReduction(
        GaussianProcessRegressor(), SVDTransformer(), n_components=1,
        normalize=True, preprocessor=PCA(n_components=2))
    edr.fit(X, y)

    print("components_ shape (raw feature space):", edr.components_.shape)
    Xt = edr.transform(X)
    from sklearn.feature_selection import mutual_info_regression
    mi = mutual_info_regression(Xt, y, random_state=0)[0]
    print(f"MI after PCA→EDR chain: {mi:.3f} nats")
    assert mi > 1


if __name__ == "__main__":
    main()
