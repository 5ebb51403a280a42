"""edrgp_tpu — TPU-native effective dimensionality reduction with GPs.

A from-scratch JAX/XLA/Pallas framework with the capability surface of the
reference ``edrgp`` package (see SURVEY.md): sklearn-style GP regression and
classification (exact and sparse), gradient-based EDR (iterative, block,
sparse-refit), plus the TPU scaling layer the reference lacks (SVGP,
NUTS/HMC, SMC, multi-host sharding).

Public API mirrors ``/root/reference/edrgp/__init__.py`` and grows the
scaling entry points.
"""

from .edr.base import BaseEDR, BlockEDR, IterativeEDR
from .edr.edr import EffectiveDimensionalityReduction
from .utils import SVDTransformer, discrepancy, ort_space, subspace_variance_ratio

__version__ = "0.1.0"

__all__ = [
    "EffectiveDimensionalityReduction",
    "BlockEDR",
    "IterativeEDR",
    "BaseEDR",
    "SVDTransformer",
    "discrepancy",
    "ort_space",
    "subspace_variance_ratio",
]
