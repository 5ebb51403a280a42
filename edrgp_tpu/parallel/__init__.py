"""Multi-chip/multi-host layer: meshes, sharded steps, distributed glue."""

from .exact_sharded import (make_sharded_nlml_value_and_grad, shard_rows,
                            sharded_nlml_value_and_grad)
from .heartbeat import (StallWatchdog, read_heartbeats, stale_peers,
                        write_heartbeat)
from .distributed import (assert_replicas_agree, barrier, checksum,
                          initialize)
from .mesh import (factor_devices, make_hybrid_mesh, make_mesh, replicated,
                   shard_along)
from .sharded import (distributed_systematic_resample, make_sharded_svgp_step,
                      run_sharded_nuts, run_sharded_smc_stage)

__all__ = [
    "make_mesh", "factor_devices", "replicated", "shard_along",
    "make_sharded_svgp_step", "run_sharded_nuts", "run_sharded_smc_stage",
    "distributed_systematic_resample",
    "make_sharded_nlml_value_and_grad", "sharded_nlml_value_and_grad",
    "shard_rows",
    "StallWatchdog", "write_heartbeat", "read_heartbeats", "stale_peers",
    "make_hybrid_mesh", "initialize", "barrier", "checksum",
    "assert_replicas_agree",
]
