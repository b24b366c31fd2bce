"""gpmdm_tpu — TPU-native Gaussian Process Multi-Dynamical Models.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
GPMDM implementation (Priyanshu4/gpmdm): multi-class Gaussian Process
Dynamical Models for human activity recognition, with exact-GP MAP training,
per-class dynamics posteriors, and a switching particle filter — all built
for TPU (jit, vmap, lax.scan, shard_map, Pallas).
"""

from .config import GPMDMConfig, PFConfig, TrainConfig
from .models.gpmdm import GPMDM
from .models.back_constrained import BCGPMDM
from .models.sparse_gpmdm import SparseGPMDM
from .filter.particle_filter import GPMDM_PF

__version__ = "0.1.0"

__all__ = [
    "GPMDM",
    "SparseGPMDM",
    "BCGPMDM",
    "GPMDM_PF",
    "GPMDMConfig",
    "PFConfig",
    "TrainConfig",
]
