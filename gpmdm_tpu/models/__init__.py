from . import core, sparse
from .gpmdm import GPMDM
from .back_constrained import BCGPMDM
from .sparse_gpmdm import SparseGPMDM

__all__ = ["core", "sparse", "GPMDM", "SparseGPMDM", "BCGPMDM"]
