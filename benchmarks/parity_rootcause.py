"""Root-cause diagnostics for the two parity-gate losses (VERDICT r3 #6).

1. ``brief_intro_edr_discrepancy`` (native mean 0.241 vs published 0.135):
   hypotheses — (a) our single-run ML-II lands in worse local optima than
   GPy's (fix: restarts / better init); (b) our L-BFGS under-converges
   (check: scipy L-BFGS-B on the identical NLML reaches lower values).
   Per seed this records NLML and discrepancy for single-fit vs
   10-restart fits and the NLML↔discrepancy relationship.

2. ``chain_pca_uncorr_preprocessed_mi`` (native 0.73±0.41 vs published
   1.228, one seed at 0.19 nats): hypothesis — with (near-)uncorrelated
   inputs the PCA(2) preprocessor's dropped direction is noise-driven, so
   the retained MI is governed by how much of the ridge direction
   c∝(1,1,1) survives the projection: MI should track the alignment
   1−(c·v₃)² where v₃ is the dropped eigenvector.  If the correlation is
   strong, the workload's spread is intrinsic (the published number is one
   draw of a high-variance statistic), not an implementation defect.

CPU float64.  Writes results/PARITY_ROOTCAUSE_r04.json.
"""

import json
import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from edrgp_tpu.config import cpu_compile_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cpu_compile_cache_dir(
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache")))

from sklearn.decomposition import PCA  # noqa: E402
from sklearn.feature_selection import mutual_info_regression  # noqa: E402
from sklearn.preprocessing import StandardScaler  # noqa: E402

from edrgp_tpu import EffectiveDimensionalityReduction, SVDTransformer  # noqa: E402
from edrgp_tpu.datasets import (get_beta_inputs, get_edr_target,  # noqa: E402
                                get_gaussian_inputs, get_tanh_targets)
from edrgp_tpu.models import GaussianProcessRegressor  # noqa: E402
from edrgp_tpu.utils import discrepancy  # noqa: E402

SEEDS = list(range(20))
OUT = {}


def brief_intro():
    rows = []
    for seed in SEEDS:
        rng = np.random.default_rng(seed)
        X = get_beta_inputs(200, 10, rng=rng)
        B = np.linalg.qr(rng.normal(size=(10, 2)))[0]
        y = get_edr_target(X @ B, sigma=0.1, rng=rng)

        row = {"seed": seed}
        # Fit the GP directly (the EDR one-shot path is exactly fit →
        # predict_gradient → SVD) so NLML and discrepancy come from the
        # SAME model — going through EDR conflates them: EDR's _last_fit
        # refits in the projected space, so its estimator_'s NLML is the
        # refit model's, not the one the components came from.
        for label in ("single", "restarts10"):
            gp = GaussianProcessRegressor(
                ["RBF"], [{"ARD": True}],
                method="optimize_restarts" if label == "restarts10"
                else "optimize")
            if label == "restarts10":
                gp.fit(X, y, num_restarts=10, verbose=False)
            else:
                gp.fit(X, y)
            comps = SVDTransformer().fit(
                gp.predict_gradient(X)).components_[:2]
            row[f"disc_{label}"] = round(float(
                discrepancy(B, comps.T)), 4)
            row[f"nlml_{label}"] = round(
                -float(gp.estimator_.log_likelihood()), 3)
        rows.append(row)
        print(json.dumps(row), flush=True)

    d1 = np.array([r["disc_single"] for r in rows])
    d10 = np.array([r["disc_restarts10"] for r in rows])
    n1 = np.array([r["nlml_single"] for r in rows])
    n10 = np.array([r["nlml_restarts10"] for r in rows])
    OUT["brief_intro"] = {
        "rows": rows,
        "disc_single_mean": round(float(d1.mean()), 4),
        "disc_restarts10_mean": round(float(d10.mean()), 4),
        "nlml_gap_mean_single_minus_restarts": round(float((n1 - n10).mean()), 4),
        "seeds_where_restarts_found_lower_nlml": int((n10 < n1 - 1e-6).sum()),
        "corr_nlml_vs_disc": round(float(np.corrcoef(
            np.concatenate([n1, n10]), np.concatenate([d1, d10]))[0, 1]), 3),
    }
    print(json.dumps({k: v for k, v in OUT["brief_intro"].items()
                      if k != "rows"}), flush=True)


def mi_estimator_floor():
    """Attribution experiment for the systematic ~2-3% MI shortfall vs the
    notebooks' published values on four workloads: compute the MI of the
    TRUE ridge direction (no GP involved at all) on fresh seeds.  If the
    ceiling itself sits below the published single-draw values, the gap is
    the MI estimator / data draw, not the recovered subspace."""
    ceilings = {}
    for name, cov_kind in (("regression_2d", None), ("chain_corr", "corr"),
                           ("chain_uncorr", "uncorr")):
        vals = []
        for seed in SEEDS:
            rng = np.random.default_rng(seed)
            if cov_kind is None:
                X = get_gaussian_inputs(
                    eig_values=[1, 0.3], sample_size=500,
                    eig_vectors=np.array([[1, 1], [-1, 1]]), rng=rng)
                X -= X.mean(0)
                c = np.array([0.5, 0.5])
            else:
                from scipy.linalg import eigh
                cov = (np.array([[1, .9, .01], [.9, 1, -.1], [.01, -.1, 1]])
                       if cov_kind == "corr" else
                       np.array([[1, .07, .03], [.07, 1, -.1],
                                 [.03, -.1, 1]]))
                w, v = eigh(cov)
                X = get_gaussian_inputs(eig_values=w, sample_size=500,
                                        eig_vectors=v, rng=rng)
                X -= X.mean(0)
                c = 0.5 * np.ones(3)
            y = get_tanh_targets(X, c, rng=rng)
            vals.append(float(mutual_info_regression(
                (X @ c)[:, None], y, random_state=0)[0]))
        ceilings[name] = {"mi_true_direction_mean": round(float(
            np.mean(vals)), 4), "mi_true_direction_std": round(float(
                np.std(vals, ddof=1)), 4)}
        print(json.dumps({name: ceilings[name]}), flush=True)
    OUT["mi_estimator_floor"] = {
        "note": ("MI of the TRUE ridge direction (no GP): the estimator/"
                 "data-draw ceiling the published single-seed values must "
                 "be compared against"),
        **ceilings}


def chain_pca_uncorr():
    from scipy.linalg import eigh
    cov = np.array([[1, 0.07, 0.03], [0.07, 1, -0.1], [0.03, -0.1, 1]])
    rows = []
    for seed in SEEDS:
        rng = np.random.default_rng(seed)
        w, v = eigh(cov)
        X = get_gaussian_inputs(eig_values=w, sample_size=500,
                                eig_vectors=v, rng=rng)
        X -= X.mean(0)
        y = get_tanh_targets(X, 0.5 * np.ones(3), rng=rng)

        # what the preprocessor drops, in the estimator's input space
        Xn = StandardScaler().fit_transform(X)
        pca = PCA(n_components=3).fit(Xn)
        v3 = pca.components_[2]               # dropped direction
        # ridge direction in normalized coordinates: c_n ∝ scale ⊙ c
        c = 0.5 * np.ones(3) * X.std(0)
        c /= np.linalg.norm(c)
        retained = 1.0 - float((c @ v3) ** 2)

        edr = EffectiveDimensionalityReduction(
            GaussianProcessRegressor(), SVDTransformer(), n_components=1,
            preprocessor=PCA(n_components=2))
        edr.fit(X, y)
        mi = float(mutual_info_regression(edr.transform(X), y,
                                          random_state=0)[0])
        rows.append({"seed": seed, "mi": round(mi, 3),
                     "ridge_energy_retained_by_pca2": round(retained, 4)})
        print(json.dumps(rows[-1]), flush=True)

    mis = np.array([r["mi"] for r in rows])
    ret = np.array([r["ridge_energy_retained_by_pca2"] for r in rows])
    OUT["chain_pca_uncorr"] = {
        "rows": rows,
        "mi_mean": round(float(mis.mean()), 3),
        "mi_min": round(float(mis.min()), 3),
        "mi_max": round(float(mis.max()), 3),
        "corr_mi_vs_retained_ridge_energy": round(float(
            np.corrcoef(mis, ret)[0, 1]), 3),
        "n_seeds_exceeding_published": int((mis >= 1.228).sum()),
    }
    print(json.dumps({k: v for k, v in OUT["chain_pca_uncorr"].items()
                      if k != "rows"}), flush=True)


def main():
    mi_estimator_floor()
    brief_intro()
    chain_pca_uncorr()
    out = os.path.join(os.path.dirname(__file__), "..", "results",
                       "PARITY_ROOTCAUSE_r04.json")
    with open(out, "w") as f:
        json.dump(OUT, f, indent=1)
    print(json.dumps({"written": os.path.relpath(out)}), flush=True)


if __name__ == "__main__":
    main()
