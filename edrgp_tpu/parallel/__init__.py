"""Multi-chip/multi-host layer: meshes, sharded steps, distributed glue."""

from .exact_sharded import (make_sharded_nlml_value_and_grad, shard_rows,
                            sharded_nlml_value_and_grad)
from .mesh import factor_devices, make_mesh, replicated, shard_along
from .sharded import (distributed_systematic_resample, make_sharded_svgp_step,
                      run_sharded_nuts, run_sharded_smc_stage)

__all__ = [
    "make_mesh", "factor_devices", "replicated", "shard_along",
    "make_sharded_svgp_step", "run_sharded_nuts", "run_sharded_smc_stage",
    "distributed_systematic_resample",
    "make_sharded_nlml_value_and_grad", "sharded_nlml_value_and_grad",
    "shard_rows",
]
