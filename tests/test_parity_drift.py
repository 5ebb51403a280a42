"""Drift guard over the pinned parity distributions (VERDICT r4 next #9).

The strict-vs-published parity argument is settled as far as this
environment allows (GPy is not installable, so the reference pipeline's
distribution cannot be sampled); what remained unguarded was SILENT NATIVE
REGRESSION on the 9 notebook workloads.  This test re-runs a cheap subset
(3 seeds × 3 workloads) and fails when the 3-seed mean drifts outside a
wide band around the pinned 20-seed mean (``tests/parity_baseline.json``,
captured from results/PARITY_RUNS.json).

Band: |mean₃ − mean₂₀| ≤ 3·std·√(1/3 + 1/20) — the 3σ band of the
difference of two independent sample means sharing the per-seed std.  It
will not flag noise (the seeds are draws from the same distribution) but
trips on any change that shifts the statistic by ~2 per-seed sigmas.
"""

import json
import os

import numpy as np
import pytest
from sklearn.decomposition import PCA
from sklearn.feature_selection import mutual_info_regression

from edrgp_tpu import EffectiveDimensionalityReduction, SVDTransformer
from edrgp_tpu.datasets import (get_beta_inputs, get_edr_target,
                                get_gaussian_inputs, get_tanh_targets)
from edrgp_tpu.models import GaussianProcessRegressor
from edrgp_tpu.utils import discrepancy

SEEDS = (0, 1, 2)

with open(os.path.join(os.path.dirname(__file__),
                       "parity_baseline.json")) as f:
    BASELINE = json.load(f)["workloads"]


def _check(workload, runs):
    base = BASELINE[workload]
    mean3 = float(np.mean(runs))
    band = 3.0 * base["std"] * np.sqrt(1 / len(runs) + 1 / base["seeds"])
    assert np.all(np.isfinite(runs)), f"{workload}: non-finite values {runs}"
    assert abs(mean3 - base["mean"]) <= band, (
        f"{workload} drifted: 3-seed mean {mean3:.4f} vs pinned "
        f"{base['mean']:.4f} ± {band:.4f} (per-seed values {runs})")


def test_brief_intro_one_shot_discrepancy_pinned():
    runs = []
    for seed in SEEDS:
        rng = np.random.default_rng(seed)
        X = get_beta_inputs(200, 10, rng=rng)
        B = np.linalg.qr(rng.normal(size=(10, 2)))[0]
        y = get_edr_target(X @ B, sigma=0.1, rng=rng)
        edr = EffectiveDimensionalityReduction(
            GaussianProcessRegressor(["RBF"], [{"ARD": True}]),
            SVDTransformer(), normalize=False)
        edr.fit(X, y)
        runs.append(discrepancy(B, edr.components_.T[:, :2]))
    _check("brief_intro_edr_discrepancy", runs)


def test_regression_example_edr_mi_pinned():
    runs = []
    for seed in SEEDS:
        rng = np.random.default_rng(seed)
        X = get_gaussian_inputs(eig_values=[1, 0.3], sample_size=500,
                                eig_vectors=np.array([[1, 1], [-1, 1]]),
                                rng=rng)
        X -= X.mean(0)
        y = get_tanh_targets(X, [0.5, 0.5], rng=rng)
        edr = EffectiveDimensionalityReduction(
            GaussianProcessRegressor(), PCA(n_components=1), n_components=1)
        edr.fit(X, y)
        runs.append(mutual_info_regression(edr.transform(X), y,
                                           random_state=0)[0])
    _check("regression_example_edr_mi", runs)


def test_chain_pca_corr_preprocessed_mi_pinned():
    from scipy.linalg import eigh
    cov = np.array([[1, 0.9, 0.01], [0.9, 1, -0.1], [0.01, -0.1, 1]])
    runs = []
    for seed in SEEDS:
        rng = np.random.default_rng(seed)
        w, v = eigh(cov)
        X = get_gaussian_inputs(eig_values=w, sample_size=500,
                                eig_vectors=v, rng=rng)
        X -= X.mean(0)
        y = get_tanh_targets(X, 0.5 * np.ones(3), rng=rng)
        edr = EffectiveDimensionalityReduction(
            GaussianProcessRegressor(), SVDTransformer(), n_components=1,
            preprocessor=PCA(n_components=2))
        edr.fit(X, y)
        runs.append(mutual_info_regression(edr.transform(X), y,
                                           random_state=0)[0])
    _check("chain_pca_corr_preprocessed_mi", runs)
