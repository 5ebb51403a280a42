"""Run every TPU benchmark in ONE process (startup + tunnel attach cost
minutes here, so batching them amortizes it).  Order: cheap headline first,
then samplers, then the BASELINE-scale configs.

Each stage is error-isolated (ADVICE r2): a crash prints a JSON error line
and the suite continues — a dead stage must never cost the others their
already-paid tunnel attach.

Usage: python benchmarks/run_tpu_suite.py \
    [headline nuts nuts-sweep anatomy sgpr svgp svgp10m pallas edr-scale]
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))


def _stage(name, fn):
    t0 = time.time()
    try:
        fn()
        print(json.dumps({"stage": name, "ok": True,
                          "wall_s": round(time.time() - t0, 1)}), flush=True)
    except Exception:
        traceback.print_exc()
        print(json.dumps({"stage": name, "ok": False,
                          "error": traceback.format_exc().strip().splitlines()[-1],
                          "wall_s": round(time.time() - t0, 1)}), flush=True)


def main():
    which = set(sys.argv[1:]) or {"headline", "nuts", "sgpr", "svgp"}

    if "headline" in which:
        import bench
        _stage("headline", bench.main)

    if "nuts" in which:
        import nuts_tpu
        sys.argv = ["nuts_tpu"]
        _stage("nuts", nuts_tpu.main)

    if "anatomy" in which:
        import anatomy_tpu
        _stage("anatomy", anatomy_tpu.main)

    if "nuts-sweep" in which:
        import nuts_tpu
        sys.argv = ["nuts_tpu", "--sweep"]
        _stage("nuts-sweep", nuts_tpu.main)

    if "sgpr" in which:
        import baseline_scale_tpu
        _stage("sgpr", baseline_scale_tpu.run_sgpr_100k)

    if "svgp" in which:
        import baseline_scale_tpu
        _stage("svgp", baseline_scale_tpu.run_svgp_1m)

    if "svgp10m" in which:
        import baseline_scale_tpu
        _stage("svgp10m", baseline_scale_tpu.run_svgp_10m_smc)

    if "pallas" in which:
        import hardened_sweep_r4
        _stage("pallas", hardened_sweep_r4.main)

    if "edr-scale" in which:
        import edr_scale_tpu
        _stage("edr-scale", edr_scale_tpu.run_tpu)


if __name__ == "__main__":
    main()
