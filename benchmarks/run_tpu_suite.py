"""Run every TPU benchmark in ONE process (startup + tunnel attach cost
minutes here, so batching them amortizes it).  Order: cheap headline first,
then samplers, then the BASELINE-scale configs.

Usage: python benchmarks/run_tpu_suite.py [headline nuts sgpr svgp]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))


def main():
    which = set(sys.argv[1:]) or {"headline", "nuts", "sgpr", "svgp"}

    if "headline" in which:
        import bench
        bench.main()

    if "nuts" in which:
        import nuts_tpu
        sys.argv = ["nuts_tpu"]
        nuts_tpu.main()

    if "sgpr" in which:
        import baseline_scale_tpu
        baseline_scale_tpu.run_sgpr_100k()

    if "svgp" in which:
        import baseline_scale_tpu
        baseline_scale_tpu.run_svgp_1m()


if __name__ == "__main__":
    main()
