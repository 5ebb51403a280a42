"""Optimizers and samplers: jitted L-BFGS (ML-II), HMC, NUTS, SMC."""

from .hmc import run_hmc, run_hmc_pytree, hmc_step
from .lbfgs import minimize, minimize_restarts
from .nuts import run_nuts, run_nuts_pytree, nuts_step
from .smc import run_smc, run_smc_pytree, systematic_resample, ess

__all__ = [
    "minimize", "minimize_restarts",
    "run_hmc", "run_hmc_pytree", "hmc_step",
    "run_nuts", "run_nuts_pytree", "nuts_step",
    "run_smc", "run_smc_pytree", "systematic_resample", "ess",
]
