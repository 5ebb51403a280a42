"""Virtual-mesh capstone for the SHARDED EDR COMPOSITION (VERDICT r4
next #1c): the composed loop — SVGP fit → data-parallel gradient
extraction over an 8-device mesh → psum'd [Q, Q] Gram → host eigh
projector — recorded end-to-end on the 8-virtual-device CPU mesh at
N = 131,072, with (a) subspace recovery vs the planted sparse 3-D
projector and (b) bit-level agreement against the identical mesh-free
pipeline (same seeds ⇒ same fit; only the extraction/SVD stages differ).

Multi-chip hardware is not available in this environment (one tunneled
TPU chip); the virtual CPU mesh is the prescribed validation substrate
(SURVEY.md §4) and the same code path ``dryrun_multichip`` compiles.

Writes results/EDR_SHARDED_CAPSTONE_r05.json.
"""

import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

_REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, _REPO)

import scipy.sparse  # noqa: E402

from edrgp_tpu import EffectiveDimensionalityReduction, SVDTransformer  # noqa: E402
from edrgp_tpu.datasets import get_beta_inputs, get_edr_target  # noqa: E402
from edrgp_tpu.models.svgp import SVGPRegressor  # noqa: E402
from edrgp_tpu.parallel.mesh import make_mesh  # noqa: E402
from edrgp_tpu.utils import discrepancy  # noqa: E402

N, Q, D_TRUE, M_IND = 131_072, 10, 3, 128
OUT = os.path.join(_REPO, "results", "EDR_SHARDED_CAPSTONE_r05.json")


def emit(**kw):
    print(json.dumps(kw, default=float), flush=True)
    return kw


def principal_angles_deg(A, B):
    Qa = np.linalg.qr(np.asarray(A, np.float64))[0]
    Qb = np.linalg.qr(np.asarray(B, np.float64))[0]
    s = np.clip(np.linalg.svd(Qa.T @ Qb, compute_uv=False), -1, 1)
    return np.degrees(np.arccos(s))


def fit_pipeline(X, y, mesh):
    edr = EffectiveDimensionalityReduction(
        SVGPRegressor(kernels=["RBF"], kernel_options=[{"ARD": True}],
                      num_inducing=M_IND, batch_size=1024, lr=5e-3),
        SVDTransformer(), n_components=D_TRUE, gradient_mesh=mesh)
    t0 = time.perf_counter()
    edr.fit(X, y, max_iters=1200)
    return edr, time.perf_counter() - t0


def main():
    rng = np.random.default_rng(0)
    X = get_beta_inputs(N, Q, rng=rng).astype(np.float32)
    B = np.linalg.qr(scipy.sparse.random(
        Q, D_TRUE, density=0.4, random_state=0).toarray())[0]
    y = get_edr_target(X @ B, sigma=0.1, rng=rng).astype(np.float32)
    mesh = make_mesh(("data",), devices=jax.devices()[:8])
    res = {"config": {"N": N, "Q": Q, "d_true": D_TRUE,
                      "num_inducing": M_IND,
                      "devices": len(jax.devices()), "backend": "cpu",
                      "dtype": "float32"}}

    edr8, wall8 = fit_pipeline(X, y, mesh)
    assert getattr(edr8, "_pending_gram_", None) is not None, \
        "distributed Gram path never engaged"
    c8 = np.asarray(edr8.components_.T)
    res["sharded"] = emit(
        stage="sharded_composed_edr", wall_s=round(wall8, 1),
        mesh_devices=8,
        discrepancy_vs_truth=round(float(discrepancy(B, c8)), 4),
        principal_angles_deg=[round(float(a), 3)
                              for a in principal_angles_deg(B, c8)],
        subspace_variance_ratio=[round(float(r), 5)
                                 for r in edr8.subspace_variance_ratio_])

    edr1, wall1 = fit_pipeline(X, y, None)
    c1 = np.asarray(edr1.components_.T)
    res["single"] = emit(
        stage="single_device_composed_edr", wall_s=round(wall1, 1),
        discrepancy_vs_truth=round(float(discrepancy(B, c1)), 4),
        principal_angles_deg=[round(float(a), 3)
                              for a in principal_angles_deg(B, c1)])

    res["agreement"] = emit(
        stage="sharded_vs_single_agreement",
        subspace_discrepancy=round(float(
            discrepancy(np.linalg.qr(c1)[0], c8)), 8),
        max_principal_angle_deg=round(float(
            principal_angles_deg(c1, c8).max()), 5))

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    emit(written=os.path.relpath(OUT, _REPO))


if __name__ == "__main__":
    main()
