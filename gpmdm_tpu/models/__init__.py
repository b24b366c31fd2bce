from . import compressed, core, sparse
from .gpmdm import GPMDM
from .back_constrained import BCGPMDM
from .sparse_gpmdm import SparseGPMDM

__all__ = ["compressed", "core", "sparse", "GPMDM", "SparseGPMDM", "BCGPMDM"]
