"""Multi-host launch demonstration: N processes, a hybrid DCN×ICI mesh,
cross-process collectives, liveness monitoring.

The reference is single-process NumPy; this demonstrates the full
multi-controller SPMD launch path on this machine by running N separate
JAX *processes* (CPU backend, 2+ local devices each) joined through
``jax.distributed`` — the same code path a real TPU pod slice uses, with
gRPC standing in for DCN:

  * ``parallel.distributed.initialize`` + startup barrier
  * ``parallel.mesh.make_hybrid_mesh`` — leading ``host`` axis over
    process granules, inner ``data`` axis over each process's devices
  * data-parallel SVGP step sharded over ("host", "data") — psums cross
    the process boundary
  * ``parallel.heartbeat`` — per-process stamps + stall watchdog + host-0
    stale-peer scan
  * ``assert_replicas_agree`` on the replicated params after training

Parent mode spawns the workers and reports one JSON line.  CPU-only by
construction (never touches the TPU tunnel).

Usage:  python benchmarks/multihost_demo.py [--nprocs 2] [--devices 2]
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.join(os.path.dirname(__file__), "..")


def worker(idx: int, nprocs: int, devices: int, port: int, hb_dir: str,
           steps: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")        # sitecustomize ignores env
    jax.config.update("jax_num_cpu_devices", devices)
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nprocs, process_id=idx)

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    from edrgp_tpu.ops import svgp as _svgp
    from edrgp_tpu.ops.kernels import RBF, inv_positive
    from edrgp_tpu.parallel import (StallWatchdog, assert_replicas_agree,
                                    barrier, make_hybrid_mesh,
                                    make_sharded_svgp_step, stale_peers,
                                    write_heartbeat)

    barrier()                                         # startup liveness
    mesh = make_hybrid_mesh(ici_axis_names=("data",), dcn_axis_name="host")
    assert mesh.shape["host"] == nprocs
    assert mesh.shape["data"] == devices

    # ---- global batch, sharded over (host, data) ------------------------
    rng = np.random.default_rng(0)
    B, Q, M, N = 64 * nprocs * devices, 4, 16, 10_000
    Xg = rng.normal(size=(B, Q)).astype(np.float32)
    yg = np.sin(Xg @ np.ones(Q)).astype(np.float32) + \
        0.1 * rng.normal(size=B).astype(np.float32)

    from jax.sharding import NamedSharding, PartitionSpec as P
    data_sh = NamedSharding(mesh, P(("host", "data")))
    Xb = jax.make_array_from_callback(Xg.shape, data_sh, lambda i: Xg[i])
    yb = jax.make_array_from_callback(
        yg.shape, NamedSharding(mesh, P(("host", "data"))), lambda i: yg[i])

    kern = RBF(Q, ARD=True)
    params = {"kernel": kern.init_params(jnp.float32),
              "raw_noise": inv_positive(jnp.asarray(1.0, jnp.float32)),
              "Z": jnp.asarray(Xg[:M])}
    qstate = _svgp.init_svgp_state(M, jnp.float32)
    step, opt_init = make_sharded_svgp_step(kern, mesh, n_total=N,
                                            data_axis=("host", "data"))
    opt_state = opt_init(params)

    elbos = []
    with StallWatchdog(timeout_s=300.0) as dog:
        for s in range(steps):
            params, qstate, opt_state, elbo = step(
                params, qstate, opt_state, Xb, yb,
                jnp.asarray(0.2, jnp.float32))
            jax.block_until_ready(elbo)
            elbos.append(float(elbo))
            dog.beat(s)
            write_heartbeat(hb_dir, idx, step=s,
                            payload={"elbo": elbos[-1]})
    assert not dog.fired

    if idx == 0:
        missing = stale_peers(hb_dir, timeout_s=60.0, expected=nprocs)
        assert missing == [], f"stale peers: {missing}"
    assert elbos[-1] > elbos[0], (elbos[0], elbos[-1])
    assert_replicas_agree(params)
    if idx == 0:
        print(json.dumps({
            "workload": "multihost_demo", "processes": nprocs,
            "devices_per_process": devices, "steps": steps,
            "elbo_first": round(elbos[0], 3), "elbo_last": round(elbos[-1], 3),
        }), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--devices", type=int, default=2)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--hb-dir", type=str, default=None)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.nprocs, args.devices, args.port,
               args.hb_dir, args.steps)
        return 0

    with socket.socket() as s:                         # free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    hb_dir = tempfile.mkdtemp(prefix="edrgp_hb_")
    procs = []
    for i in range(args.nprocs):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--worker", str(i), "--nprocs", str(args.nprocs),
             "--devices", str(args.devices), "--steps", str(args.steps),
             "--port", str(port), "--hb-dir", hb_dir],
            stdout=None if i else None))
    rc = 0
    deadline = time.time() + 600
    for p in procs:
        try:
            rc |= p.wait(timeout=max(1, deadline - time.time()))
        except subprocess.TimeoutExpired:
            p.kill()
            rc |= 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
