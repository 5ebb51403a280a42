"""Hybrid DCN×ICI mesh construction and multi-axis data-parallel steps.

Single-process here (the 8 virtual CPU devices act as one granule); the
cross-process path is exercised end-to-end by
``benchmarks/multihost_demo.py`` (2 JAX processes over jax.distributed).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from edrgp_tpu.ops import svgp as _svgp
from edrgp_tpu.ops.kernels import RBF, inv_positive
from edrgp_tpu.parallel import (make_hybrid_mesh, make_mesh,
                                make_sharded_svgp_step)


def test_hybrid_mesh_single_process_degenerates():
    mesh = make_hybrid_mesh(ici_axis_names=("data",), dcn_axis_name="host")
    assert mesh.axis_names == ("host", "data")
    assert mesh.shape["host"] == 1
    assert mesh.shape["data"] == len(jax.devices())


def test_hybrid_mesh_ici_shape():
    mesh = make_hybrid_mesh(ici_axis_names=("chain", "data"),
                            ici_shape=(2, 4))
    assert mesh.shape == {"host": 1, "chain": 2, "data": 4}
    with pytest.raises(ValueError, match="ici shape"):
        make_hybrid_mesh(ici_axis_names=("data",), ici_shape=(3,))


def _svgp_problem(B, Q=3, M=8, dtype=jnp.float32):
    rng = np.random.default_rng(0)
    X = rng.normal(size=(B, Q)).astype(np.float32)
    y = (np.sin(X @ np.ones(Q)) + 0.1 * rng.normal(size=B)).astype(np.float32)
    kern = RBF(Q, ARD=True)
    params = {"kernel": kern.init_params(dtype),
              "raw_noise": inv_positive(jnp.asarray(1.0, dtype)),
              "Z": jnp.asarray(X[:M], dtype)}
    return kern, params, _svgp.init_svgp_state(M, dtype), X, y


def test_svgp_step_multi_axis_matches_single_axis():
    """Sharding the batch over ("host", "data") on a hybrid mesh gives the
    same step as sharding over one flat axis — the reductions are global
    either way."""
    B = 64
    kern, params, qstate, X, y = _svgp_problem(B)

    flat = make_mesh(("data",), shape=(8,))
    step1, opt_init = make_sharded_svgp_step(kern, flat, n_total=1000)
    o1 = step1(params, qstate, opt_init(params),
               jax.device_put(X, NamedSharding(flat, P("data"))),
               jax.device_put(y, NamedSharding(flat, P("data"))),
               jnp.float32(0.2))

    hyb = make_mesh(("host", "data"), shape=(2, 4))
    step2, opt_init2 = make_sharded_svgp_step(kern, hyb, n_total=1000,
                                              data_axis=("host", "data"))
    o2 = step2(params, qstate, opt_init2(params),
               jax.device_put(X, NamedSharding(hyb, P(("host", "data")))),
               jax.device_put(y, NamedSharding(hyb, P(("host", "data")))),
               jnp.float32(0.2))

    for a, b in zip(jax.tree_util.tree_leaves(o1[:2] + (o1[3],)),
                    jax.tree_util.tree_leaves(o2[:2] + (o2[3],))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_multihost_demo_launches():
    """Real multi-controller launch: 2 JAX processes over jax.distributed,
    hybrid mesh, cross-process psum, heartbeats, replica checksums."""
    import os
    import subprocess
    import sys
    script = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                          "multihost_demo.py")
    out = subprocess.run(
        [sys.executable, script, "--nprocs", "2", "--devices", "2",
         "--steps", "10"],
        capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, (out.stdout, out.stderr)
    assert '"workload": "multihost_demo"' in out.stdout
