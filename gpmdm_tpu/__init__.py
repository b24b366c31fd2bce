"""gpmdm_tpu — TPU-native Gaussian Process Multi-Dynamical Models.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
GPMDM implementation (Priyanshu4/gpmdm): multi-class Gaussian Process
Dynamical Models for human activity recognition, with exact-GP MAP training,
per-class dynamics posteriors, and a switching particle filter — all built
for TPU (jit, vmap, lax.scan, shard_map, Pallas).
"""

# Honor GPMDM_TPU_PLATFORM before anything touches a device backend: a
# sitecustomize registers the TPU plugin at interpreter start and the
# JAX_PLATFORMS env var is IGNORED (CLAUDE.md), so jax.config.update is
# the only working override.  Previously only the CLI honored it; a
# notebook cell spawning examples/view_gpmdm_pf.py in a subprocess
# silently landed on the TPU tunnel and sat in a 20 min+ uncached
# compile.  Opt-in only — unset means whatever platform loads.
import os as _os

if _os.environ.get("GPMDM_TPU_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["GPMDM_TPU_PLATFORM"])

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
